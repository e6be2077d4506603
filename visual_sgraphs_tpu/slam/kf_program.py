"""The fused keyframe program: the WHOLE per-keyframe pipeline as ONE
device executable.

On the tunnel-attached TPU every dispatch costs ~1-3 ms of host latency and
every readback ~25 ms; the keyframe path used to be ~10 separate dispatches
(insert, fuse, cull, plane detection, association, rooms, maintenance, BA,
place-recognition query).  This module composes the SAME jitted building
blocks under one ``jax.jit`` so XLA schedules the whole chain as one
program — the LocalMapping + GeometricSegmentation + SemanticSegmentation +
SemanticsManager + LoopClosing-query work of one keyframe
(LocalMapping.cc:58-278, GeometricSegmentation.cc:29-99,
SemanticsManager.cc:13-56, LoopClosing.cc:86-315) in a single dispatch.

Variants are selected by static flags (scene graph on/off, loop detection
on/off, BA on/off, maintenance on/off, semantics provided or not); the
host decides flags per keyframe and caches one compiled program per
combination that actually occurs (~4-6 in practice).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.lru_cache(maxsize=None)
def make_kf_program(
    sg_cfg,            # SceneGraphConfig (hashable) or None when sg off
    has_sem: bool,     # semantic class image provided
    has_conf: bool,    # confidence image provided
    loop_on: bool,     # place-recognition query (vocab ready)
    do_lba: bool,
    do_cull: bool,
    do_maintenance: bool,
    n_window: int,
    lba_iters: int,
    cull_min_obs: int,
    cull_min_found_ratio: float,
    cull_kf_redundancy: float,
    min_gap: int,
    top_n: int,
):
    from visual_sgraphs_tpu.slam import mapping

    sg_on = sg_cfg is not None

    def program(m, sg, db, vocab, frame, pose, slot_pt,
                stats_slots, stats_vis, depth_img, sem_img, conf_img,
                key, cam_K, cam_bf):
        m = mapping.apply_found_stats(m, stats_slots, stats_vis)
        m, kf = mapping.insert_keyframe(m, frame, pose, slot_pt, cam_K)
        m = mapping.fuse_observations(m, kf, cam_K)
        if do_cull:
            m = mapping.cull_points(
                m, min_obs=cull_min_obs,
                min_found_ratio=cull_min_found_ratio,
            )
            m = mapping.cull_keyframes(m, kf, cull_kf_redundancy)

        if sg_on:
            from visual_sgraphs_tpu.scenegraph.manager import (
                associate_and_update,
                detect_planes_from_depth,
                detect_rooms,
                filter_semantic_planes,
                reassociate_planes,
            )

            det = detect_planes_from_depth(
                depth_img,
                sem_img if has_sem else None,
                m.kf_pose[kf], cam_K, key,
                conf_img=conf_img if has_conf else None,
                dist_thresh=sg_cfg.ransac_dist_thresh,
            )
            coeffs_w, det_valid, centroid, npts, votes, local, quad = det
            sg = associate_and_update(
                sg, coeffs_w, det_valid, centroid, npts, votes, local,
                kf, det_quadric=quad,
                ominus_thresh=sg_cfg.plane_assoc_ominus_thresh,
                dist_thresh=sg_cfg.plane_assoc_dist_thresh,
            )
            if do_maintenance:
                sg = filter_semantic_planes(
                    sg, min_votes=sg_cfg.plane_min_votes
                )
                sg = reassociate_planes(
                    sg, min_votes=sg_cfg.plane_min_votes
                )
            sg = detect_rooms(sg, min_votes=sg_cfg.plane_min_votes)
            if do_lba:
                from visual_sgraphs_tpu.optim.fast_ba import (
                    fast_scenegraph_ba,
                )

                m, sg, _ = fast_scenegraph_ba(
                    m, sg, kf, cam_K, cam_bf,
                    n_window=n_window, iters=lba_iters, config=sg_cfg,
                )
        elif do_lba:
            from visual_sgraphs_tpu.optim.fast_ba import fast_local_ba

            m, _ = fast_local_ba(
                m, kf, cam_K, cam_bf, n_window=n_window, iters=lba_iters,
            )

        packed = jnp.zeros((2 * top_n + 3,), jnp.float32)
        if loop_on:
            from visual_sgraphs_tpu.place.loop_closer import _detect_program

            extra = (sg.n_obs[None].astype(jnp.float32) if sg_on
                     else jnp.zeros((1,), jnp.float32))
            db, packed = _detect_program(
                m, db, vocab, kf, min_gap, top_n, extra=extra,
            )
        return m, sg, db, kf, packed

    return jax.jit(program)
