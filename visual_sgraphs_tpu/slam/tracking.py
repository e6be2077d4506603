"""Jitted tracking programs: local-map matching + motion-only pose solve.

The reference's per-frame hot path (Tracking::Track, Tracking.cc:1874-2393 —
TrackWithMotionModel / TrackLocalMap / PoseOptimization) re-expressed as two
fixed-shape device programs:

1. gather the local map (points seen by the covisibility neighbourhood of
   the reference keyframe) into a compact table,
2. window-match those points against the frame's keypoints under the
   predicted pose, motion-only LM with chi2 gating, then a second tighter
   match + solve pass (the TrackLocalMap refinement).

Control-flow decisions (keyframe need, lost detection) are made by the host
from the returned scalars; everything heavy stays on device.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from visual_sgraphs_tpu.config import SystemConfig
from visual_sgraphs_tpu.core import cameras, lie
from visual_sgraphs_tpu.features.match import match_window
from visual_sgraphs_tpu.optim import (
    FactorBatch,
    GraphProblem,
    factors,
    optimize_rounds,
    se3_family,
)
from visual_sgraphs_tpu.slam.frame import FrameObs
from visual_sgraphs_tpu.slam.map_state import (
    MapState,
    covisibility_counts,
    observed_mask,
)

CHI2_MONO = 5.991


class TrackResult(NamedTuple):
    pose: jax.Array  # (7,) optimized T_cw
    slot_pt: jax.Array  # (F,) map-point id matched to each frame keypoint, -1
    n_matches: jax.Array  # () int32 matches fed to the solver
    n_inliers: jax.Array  # () int32 inliers after gating
    n_local_pts: jax.Array  # () int32 size of the local map used


def _local_point_table(m: MapState, ref_kf: jax.Array, n_window: int,
                       n_local: int):
    """Compact (n_local,) table of map points seen by the covisibility
    neighbourhood of ``ref_kf`` (UpdateLocalKeyFrames/Points,
    Tracking.cc:3536/3507)."""
    counts = covisibility_counts(m, ref_kf)
    top_counts, top_kfs = jax.lax.top_k(counts, n_window)
    kf_ids = jnp.concatenate([ref_kf[None], top_kfs])
    kf_mask = jnp.concatenate(
        [jnp.ones((1,), bool), top_counts > 0]
    ) & m.kf_valid[kf_ids]
    mask = observed_mask(m, kf_ids, kf_mask) & m.pt_valid
    (ids,) = jnp.nonzero(mask, size=n_local, fill_value=-1)
    valid = ids >= 0
    safe = jnp.maximum(ids, 0)
    return ids, safe, valid


def _pose_only_solve(T_init, xw, uv, valid, cam_K, rounds, iters):
    m = uv.shape[0]
    batch = FactorBatch(
        families=("kf",),
        residual_fn=factors.reproj_mono_pose_only,
        res_dim=2,
        var_idx=jnp.zeros((m, 1), jnp.int32),
        const={"uv": uv, "xw": xw, "cam": jnp.broadcast_to(cam_K, (m, 4))},
        info=jnp.ones((m,), T_init.dtype),
        valid=valid,
        huber=float(np.sqrt(CHI2_MONO)),
        chi2_gate=CHI2_MONO,
    )
    problem = GraphProblem(families={"kf": se3_family(T_init[None])},
                           factors=[batch])
    res, masks = optimize_rounds(problem, rounds=rounds, iters=iters)
    return res.values["kf"][0], masks[0]


@functools.partial(
    jax.jit,
    static_argnames=("n_window", "n_local", "fx_radius", "fine_radius"),
)
def track_frame(
    m: MapState,
    frame: FrameObs,
    T_pred: jax.Array,
    ref_kf: jax.Array,
    cam_K: jax.Array,
    n_window: int = 10,
    n_local: int = 4096,
    fx_radius: float = 15.0,
    fine_radius: float = 7.0,
) -> TrackResult:
    """Track one frame against the local map from predicted pose ``T_pred``."""
    ids, safe, lvalid = _local_point_table(m, ref_kf, n_window, n_local)
    xw = m.pt_pos[safe]
    desc = m.pt_desc[safe]

    def predict_uv(T):
        p_cam = lie.se3_apply(T, xw)
        uvp = cameras.project_pinhole(cam_K, p_cam)
        vis = (p_cam[:, 2] > 0.05) & lvalid
        return uvp, vis

    # ---- pass 1: coarse window match at predicted pose + solve
    uv_pred, vis = predict_uv(T_pred)
    match, _ = match_window(
        desc, uv_pred, vis, frame.desc, frame.uv, frame.valid,
        radius=fx_radius,
    )
    ok = match >= 0
    slot = jnp.maximum(match, 0)
    T1, inl1 = _pose_only_solve(
        T_pred, xw, frame.uv[slot], ok, cam_K, rounds=2, iters=8
    )

    # ---- pass 2: tighter re-match at refined pose + solve (TrackLocalMap)
    uv_pred2, vis2 = predict_uv(T1)
    match2, _ = match_window(
        desc, uv_pred2, vis2, frame.desc, frame.uv, frame.valid,
        radius=fine_radius,
    )
    ok2 = match2 >= 0
    slot2 = jnp.maximum(match2, 0)
    T2, inlier_mask = _pose_only_solve(
        T1, xw, frame.uv[slot2], ok2, cam_K, rounds=2, iters=8
    )

    # per-frame-slot matched point ids (for keyframe insertion), inliers only
    F = frame.uv.shape[0]
    keep = ok2 & inlier_mask
    slot_pt = jnp.full((F,), -1, jnp.int32).at[
        jnp.where(keep, match2, F - 1)
    ].max(jnp.where(keep, ids, -1).astype(jnp.int32), mode="drop")
    # visibility stats for culling: predicted-visible and actually-found
    return TrackResult(
        pose=T2,
        slot_pt=slot_pt,
        n_matches=jnp.sum(ok2.astype(jnp.int32)),
        n_inliers=jnp.sum(keep.astype(jnp.int32)),
        n_local_pts=jnp.sum(lvalid.astype(jnp.int32)),
    )


@functools.partial(jax.jit, static_argnames=())
def update_point_stats(m: MapState, track: TrackResult) -> MapState:
    """Increment visible/found counters used by point culling
    (MapPoint::IncreaseVisible/IncreaseFound)."""
    found_ids = track.slot_pt
    pt_found = m.pt_found.at[jnp.maximum(found_ids, 0)].add(
        (found_ids >= 0).astype(jnp.int32), mode="drop"
    )
    return m._replace(pt_found=pt_found)
