"""Joint scene-graph bundle adjustment: keyframes + points + planes.

The vS-Graphs extension of local BA (Optimizer::LocalBundleAdjustment with
plane/room vertices and factors, Optimizer.cc:1454-2455): plane vertices use
the minimal azimuth/elevation/distance chart (g2o VertexPlane equivalent),
and two factor types couple them to the visual graph:

- plane-KF observation factors ``(T_kf · π_world) ⊖ π_measured`` weighted by
  observation confidence (EdgeVertexPlaneProjectSE3KF,
  OptimizableTypes.h:336-374, added at Optimizer.cc:2087-2101);
- point-on-plane factors tying map points near a plane to its surface
  (EdgeVertexPlaneProjectPointXYZ, OptimizableTypes.h:379-399, added at
  Optimizer.cc:2049-2059).

Room center factors (2-wall corridor / 4-wall room closed forms,
OptimizableTypes.h:452-557) are enforced in closed form after the solve —
the room center is a *derived* quantity of its wall planes (getRoomCenter),
so re-deriving it post-BA matches the reference's fixed-point behaviour
without adding gauge-free vertices.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from visual_sgraphs_tpu.optim import (
    FactorBatch,
    GraphProblem,
    factors,
    optimize,
    plane_family,
    point_family,
    se3_family,
)
from visual_sgraphs_tpu.scenegraph.state import SceneGraphState
from visual_sgraphs_tpu.slam.map_state import MapState, covisibility_counts

CHI2_MONO = 5.991
CHI2_STEREO = 7.815
CHI2_PLANE = 7.815  # plane-KF gate (Optimizer.cc:2344)


@functools.partial(jax.jit, static_argnames=("n_window", "n_local_pts",
                                             "iters"))
def scenegraph_local_ba(
    m: MapState,
    sg: SceneGraphState,
    kf_id: jax.Array,
    cam_K: jax.Array,
    cam_bf: jax.Array,
    plane_info: jax.Array = None,  # () weight multiplier for plane factors
    n_window: int = 10,
    n_local_pts: int = 8192,
    iters: int = 10,
) -> tuple[MapState, SceneGraphState, jax.Array]:
    """Local BA with plane vertices and plane-KF factors.

    Returns (map, scenegraph, final_cost).  Planes observed by local
    keyframes are free variables; others fixed.  Writes back keyframe poses,
    point positions and plane equations (Optimizer.cc:2416-2454).
    """
    if plane_info is None:
        plane_info = jnp.asarray(1.0, jnp.float32)

    counts = covisibility_counts(m, kf_id)
    top_counts, top_kfs = jax.lax.top_k(counts, n_window)
    kf_ids = jnp.concatenate([kf_id[None], top_kfs])
    kf_mask = jnp.concatenate([jnp.ones((1,), bool), top_counts > 0])
    kf_mask = kf_mask & m.kf_valid[kf_ids]
    L = kf_ids.shape[0]

    # ---- visual part (same assembly as mapping.local_ba)
    obs = m.kf_obs_pt[kf_ids]
    obs_ok = m.kf_kp_valid[kf_ids] & kf_mask[:, None] & (obs >= 0)
    obs_safe = jnp.maximum(obs, 0)
    obs_ok = obs_ok & m.pt_valid[obs_safe]
    member = jnp.zeros((m.N + 1,), bool).at[
        jnp.where(obs_ok, obs, -1).reshape(-1) + 1
    ].set(True).at[0].set(False)
    (local_pt,) = jnp.nonzero(member[1:], size=n_local_pts, fill_value=-1)
    pt_ok = local_pt >= 0
    safe_pt = jnp.maximum(local_pt, 0)
    inv = jnp.full((m.N + 1,), -1, jnp.int32).at[safe_pt + 1].set(
        jnp.where(pt_ok, jnp.arange(n_local_pts, dtype=jnp.int32), -1)
    )
    pt_local_idx = inv[obs_safe + 1]
    use = obs_ok & (pt_local_idx >= 0)

    kf_rows = jnp.broadcast_to(jnp.arange(L)[:, None], obs.shape)
    var_idx = jnp.stack(
        [kf_rows.reshape(-1), jnp.maximum(pt_local_idx, 0).reshape(-1)],
        axis=1,
    ).astype(jnp.int32)
    uv = m.kf_uv[kf_ids].reshape(-1, 2)
    depth = m.kf_depth[kf_ids].reshape(-1)
    mtot = var_idx.shape[0]
    use_flat = use.reshape(-1)
    has_depth = depth > 0
    z = jnp.maximum(depth, 1e-3)
    uv_ur = jnp.concatenate([uv, (uv[:, :1] - cam_bf / z[:, None])], axis=1)
    batches = [
        FactorBatch(
            families=("kf", "pt"),
            residual_fn=factors.reproj_mono,
            res_dim=2,
            var_idx=var_idx,
            const={"uv": uv, "cam": jnp.broadcast_to(cam_K, (mtot, 4))},
            info=jnp.ones((mtot,), jnp.float32),
            valid=use_flat & ~has_depth,
            huber=float(np.sqrt(CHI2_MONO)),
            chi2_gate=CHI2_MONO * 2,
        ),
        FactorBatch(
            families=("kf", "pt"),
            residual_fn=factors.reproj_stereo,
            res_dim=3,
            var_idx=var_idx,
            const={
                "uv_ur": uv_ur,
                "cam": jnp.broadcast_to(cam_K, (mtot, 4)),
                "bf": jnp.broadcast_to(cam_bf, (mtot,)),
            },
            info=jnp.ones((mtot,), jnp.float32),
            valid=use_flat & has_depth,
            huber=float(np.sqrt(CHI2_STEREO)),
            chi2_gate=CHI2_STEREO * 2,
        ),
    ]

    # ---- plane-KF observation factors over the *local* keyframes
    # map each observation's kf id to its local row (or -1)
    kf_inv = jnp.full((m.K,), -1, jnp.int32).at[kf_ids].set(
        jnp.where(kf_mask, jnp.arange(L, dtype=jnp.int32), -1)
    )
    ob_local_kf = kf_inv[jnp.clip(sg.ob_kf, 0, m.K - 1)]
    ob_use = sg.ob_valid & (sg.ob_plane >= 0) & (ob_local_kf >= 0)
    Q = sg.ob_kf.shape[0]
    plane_var_idx = jnp.stack(
        [jnp.maximum(ob_local_kf, 0),
         jnp.maximum(sg.ob_plane, 0)], axis=1
    ).astype(jnp.int32)
    batches.append(
        FactorBatch(
            families=("kf", "plane"),
            residual_fn=factors.plane_kf,
            res_dim=3,
            var_idx=plane_var_idx,
            const={"pi_obs": sg.ob_coeffs},
            info=plane_info * jnp.maximum(sg.ob_conf, 0.1),
            valid=ob_use,
            huber=float(np.sqrt(CHI2_PLANE)),
            chi2_gate=CHI2_PLANE,
        )
    )

    # planes observed by a local KF are free; everything else fixed
    plane_seen = jnp.zeros((sg.P,), bool).at[
        jnp.where(ob_use, sg.ob_plane, sg.P - 1)
    ].set(ob_use, mode="drop")
    plane_fixed = ~(plane_seen & sg.pl_valid)

    min_id = jnp.min(jnp.where(kf_mask, kf_ids, m.K))
    kf_fixed = (~kf_mask) | (kf_ids == min_id) | (kf_ids == 0)
    problem = GraphProblem(
        families={
            "kf": se3_family(m.kf_pose[kf_ids], kf_fixed),
            "pt": point_family(m.pt_pos[safe_pt], ~pt_ok),
            "plane": plane_family(sg.pl_coeffs, plane_fixed),
        },
        factors=batches,
        eliminated="pt",
    )
    res = optimize(problem, iters=iters)

    new_kf_pose = m.kf_pose.at[kf_ids].set(
        jnp.where(kf_mask[:, None], res.values["kf"], m.kf_pose[kf_ids])
    )
    new_pt_pos = m.pt_pos.at[safe_pt].set(
        jnp.where(pt_ok[:, None], res.values["pt"], m.pt_pos[safe_pt])
    )
    new_planes = jnp.where(plane_fixed[:, None], sg.pl_coeffs,
                           res.values["plane"])
    # renormalize plane equations ([n; d] with |n| = 1)
    nrm = jnp.linalg.norm(new_planes[:, :3], axis=-1, keepdims=True)
    new_planes = new_planes / jnp.maximum(nrm, 1e-9)
    return (
        m._replace(kf_pose=new_kf_pose, pt_pos=new_pt_pos),
        sg._replace(pl_coeffs=new_planes),
        res.cost,
    )
