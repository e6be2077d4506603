"""Atlas: multi-map container with merge — the elastic-recovery mechanism.

Replaces the reference's ``Atlas`` (orb_slam3/include/Atlas.h) + the map
surgery of ``LoopClosing::MergeLocal`` (LoopClosing.cc:1182-1683): on
unrecoverable tracking loss the system stashes the active map and starts a
fresh one (Tracking::CreateMapInAtlas, Tracking.cc:2733); when place
recognition later locates the camera inside a stashed map, the young map is
transformed by the welding SE3 and its keyframes/points are copied into the
old map's free capacity (the reference migrates entities the same way,
LoopClosing.cc:1552-1683).

The merge itself is ONE jitted scatter program: no per-entity loops.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from visual_sgraphs_tpu.core import lie
from visual_sgraphs_tpu.slam.map_state import MapState


class MergeStats(NamedTuple):
    n_kf_moved: jax.Array
    n_pt_moved: jax.Array


@jax.jit
def transform_map(m: MapState, T_new_old: jax.Array) -> MapState:
    """Re-express a whole map in a new world frame: X' = T_new_old · X,
    T_cw' = T_cw · T_new_old⁻¹ (the Sim3-free special case of the merge
    welding transform)."""
    T_inv = lie.se3_inverse(T_new_old)
    new_pose = jax.vmap(
        lambda T: lie.se3_normalize(lie.se3_multiply(T, T_inv))
    )(m.kf_pose)
    new_pts = jax.vmap(lambda p: lie.se3_apply(T_new_old, p))(m.pt_pos)
    return m._replace(
        kf_pose=jnp.where(m.kf_valid[:, None], new_pose, m.kf_pose),
        pt_pos=jnp.where(m.pt_valid[:, None], new_pts, m.pt_pos),
    )


@jax.jit
def merge_maps(
    dst: MapState,
    src: MapState,
    T_dst_src: jax.Array,
) -> tuple[MapState, MergeStats]:
    """Copy every valid keyframe/point of ``src`` into ``dst``'s free
    capacity, with ``src`` world coordinates mapped through ``T_dst_src``
    (points X_dst = T·X_src, poses T_cw_dst = T_cw_src·T⁻¹).

    Point ids are remapped by a single gather; keyframes or points beyond
    capacity are dropped (the reference instead grows heap structures — a
    fixed-capacity map drops the overflow and reports it in the stats).
    """
    src = transform_map(src, T_dst_src)
    K, N = dst.K, dst.N

    # --- allocate KF slots
    kf_take = src.kf_valid
    kf_order = jnp.cumsum(kf_take.astype(jnp.int32)) - 1
    kf_new = jnp.where(kf_take, dst.n_kf + kf_order, -1)
    kf_new = jnp.where(kf_new < K, kf_new, -1)
    kf_ok = kf_new >= 0
    kf_slot = jnp.maximum(kf_new, 0)

    # --- allocate point slots
    pt_take = src.pt_valid
    pt_order = jnp.cumsum(pt_take.astype(jnp.int32)) - 1
    pt_new = jnp.where(pt_take, dst.n_pt + pt_order, -1)
    pt_new = jnp.where(pt_new < N, pt_new, -1)
    pt_ok = pt_new >= 0
    pt_slot = jnp.maximum(pt_new, 0)

    # observation remap: src point id -> dst point id (or -1)
    remap = jnp.full((src.N + 1,), -1, jnp.int32).at[1:].set(
        jnp.where(pt_ok, pt_new, -1)
    )
    obs_remap = remap[jnp.maximum(src.kf_obs_pt, -1) + 1]  # (K, F)

    def scatter_rows(table_dst, table_src, ok, slots):
        upd = ok.reshape(ok.shape + (1,) * (table_src.ndim - 1))
        return table_dst.at[slots].set(
            jnp.where(upd, table_src, table_dst[slots])
        )

    new = dst._replace(
        kf_pose=scatter_rows(dst.kf_pose, src.kf_pose, kf_ok, kf_slot),
        kf_valid=dst.kf_valid.at[kf_slot].set(
            kf_ok | dst.kf_valid[kf_slot]
        ),
        kf_timestamp=scatter_rows(dst.kf_timestamp, src.kf_timestamp,
                                  kf_ok, kf_slot),
        kf_uv=scatter_rows(dst.kf_uv, src.kf_uv, kf_ok, kf_slot),
        kf_depth=scatter_rows(dst.kf_depth, src.kf_depth, kf_ok, kf_slot),
        kf_level=scatter_rows(dst.kf_level, src.kf_level, kf_ok, kf_slot),
        kf_angle=scatter_rows(dst.kf_angle, src.kf_angle, kf_ok, kf_slot),
        kf_desc=scatter_rows(dst.kf_desc, src.kf_desc, kf_ok, kf_slot),
        kf_kp_valid=scatter_rows(dst.kf_kp_valid, src.kf_kp_valid,
                                 kf_ok, kf_slot),
        kf_obs_pt=scatter_rows(dst.kf_obs_pt, obs_remap, kf_ok, kf_slot),
        pt_pos=scatter_rows(dst.pt_pos, src.pt_pos, pt_ok, pt_slot),
        pt_valid=dst.pt_valid.at[pt_slot].set(
            pt_ok | dst.pt_valid[pt_slot]
        ),
        pt_desc=scatter_rows(dst.pt_desc, src.pt_desc, pt_ok, pt_slot),
        pt_first_kf=dst.pt_first_kf.at[pt_slot].set(
            jnp.where(
                pt_ok,
                jnp.where(
                    src.pt_first_kf >= 0,
                    remap_kf(kf_new, src.pt_first_kf), -1
                ),
                dst.pt_first_kf[pt_slot],
            )
        ),
        pt_visible=scatter_rows(dst.pt_visible, src.pt_visible,
                                pt_ok, pt_slot),
        pt_found=scatter_rows(dst.pt_found, src.pt_found, pt_ok, pt_slot),
        n_kf=jnp.minimum(
            dst.n_kf + jnp.sum(kf_take.astype(jnp.int32)), K
        ).astype(jnp.int32),
        n_pt=jnp.minimum(
            dst.n_pt + jnp.sum(pt_take.astype(jnp.int32)), N
        ).astype(jnp.int32),
    )
    stats = MergeStats(
        n_kf_moved=jnp.sum(kf_ok.astype(jnp.int32)),
        n_pt_moved=jnp.sum(pt_ok.astype(jnp.int32)),
    )
    return new, stats


def remap_kf(kf_new: jax.Array, idx: jax.Array) -> jax.Array:
    """Map src keyframe indices through the slot allocation (helper)."""
    table = jnp.concatenate(
        [jnp.full((1,), -1, jnp.int32), kf_new.astype(jnp.int32)]
    )
    return table[jnp.clip(idx, -1, kf_new.shape[0] - 1) + 1]


class Atlas:
    """Host-side multi-map registry (the reference's Atlas object graph,
    reduced to: one active map + stashed inactive maps with their
    place-recognition databases)."""

    def __init__(self):
        # (epoch, map, db, vocab) of non-active maps
        self.stashed: list[tuple[int, MapState, object, object]] = []
        self.n_maps_created = 1

    def stash(self, epoch: int, m: MapState, db=None, vocab=None) -> None:
        self.stashed.append((epoch, m, db, vocab))
        self.n_maps_created += 1

    def __len__(self) -> int:
        return len(self.stashed) + 1
