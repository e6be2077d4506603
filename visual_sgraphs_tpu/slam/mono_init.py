"""Monocular two-view bootstrapping: batched essential-matrix RANSAC.

Replaces the reference's ``TwoViewReconstruction`` (8-point H/F RANSAC +
model selection, TwoViewReconstruction.cc) and
``Tracking::MonocularInitialization`` (Tracking.cc:2517-2589).  TPU-first
layout: all RANSAC hypotheses are one batch — H x 8 sampled correspondences
build H stacked 8x9 systems, batched SVD yields candidate essentials, the
Sampson-inlier count is one (H, N) reduction, and cheirality testing of the
four (R, t) decompositions is a batched triangulation.  The homography branch
of the reference (for pure-rotation/planar degeneracy) is intentionally
deferred; low-parallax pairs are rejected by the inlier/parallax gates.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from visual_sgraphs_tpu.core import cameras, geometry, lie
from visual_sgraphs_tpu.features.match import match_nn_ratio


@functools.partial(jax.jit, static_argnames=("n_hyp",))
def essential_ransac(x1, x2, valid, key, n_hyp: int = 256,
                     thresh: float = 2e-6):
    """Batched 8-point essential RANSAC on normalized coords.

    ``x1``/``x2``: (N, 3) unit-depth rays (z=1); ``valid``: (N,) mask;
    ``thresh``: Sampson gate in normalized-coordinate units (squared).
    Returns (E (3,3), inlier_mask (N,), n_inliers ()).
    """
    N = x1.shape[0]
    idx = jax.random.randint(key, (n_hyp, 8), 0, N)
    w = valid[idx]  # (H, 8) — hypotheses drawing invalid rows get zero rows

    a1 = x1[idx]  # (H, 8, 3)
    a2 = x2[idx]
    # epipolar constraint rows: x2^T E x1 = 0  ->  A e = 0
    A = jnp.einsum("hni,hnj->hnij", a2, a1).reshape(n_hyp, 8, 9)
    A = A * w[..., None]
    # smallest right-singular vector of each 8x9 system
    _, _, Vt = jnp.linalg.svd(A, full_matrices=True)
    E = Vt[:, -1, :].reshape(n_hyp, 3, 3)
    # project onto the essential manifold: singular values (1, 1, 0)
    U, _, Vt2 = jnp.linalg.svd(E)
    diag = jnp.asarray([1.0, 1.0, 0.0], E.dtype)
    E = U @ (diag[None, :, None] * Vt2)

    err = jax.vmap(lambda Ei: geometry.sampson_error(Ei, x1, x2))(E)  # (H, N)
    inl = (err < thresh) & valid[None, :]
    scores = jnp.sum(inl, axis=1)
    best = jnp.argmax(scores)
    return E[best], inl[best], scores[best]


@jax.jit
def recover_pose(E, x1, x2, inliers):
    """Choose among the 4 (R, t) decompositions of E by cheirality.

    Returns (T_21 (7,), points_1 (N, 3), good_mask (N,)).
    """
    U, _, Vt = jnp.linalg.svd(E)
    # enforce proper rotations
    U = U * jnp.sign(jnp.linalg.det(U))
    Vt = Vt * jnp.sign(jnp.linalg.det(Vt))
    W = jnp.asarray([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]],
                    E.dtype)
    R1 = U @ W @ Vt
    R2 = U @ W.T @ Vt
    t = U[:, 2]
    cands = [(R1, t), (R1, -t), (R2, t), (R2, -t)]

    def score(Rt):
        R, tt = Rt
        T = lie.se3_from_rt(lie.matrix_to_quat(R), tt)
        p1, z1, z2 = geometry.triangulate_dlt(
            x1, x2, jnp.broadcast_to(T, x1.shape[:1] + (7,))
        )
        ok = inliers & (z1 > 0) & (z2 > 0)
        return jnp.sum(ok), T, p1, ok

    results = [score(c) for c in cands]
    counts = jnp.stack([r[0] for r in results])
    Ts = jnp.stack([r[1] for r in results])
    Ps = jnp.stack([r[2] for r in results])
    Oks = jnp.stack([r[3] for r in results])
    b = jnp.argmax(counts)
    return Ts[b], Ps[b], Oks[b]


def try_initialize(system, frame) -> bool:
    """Host-side bootstrap driver: keeps the first frame, attempts two-view
    reconstruction against each new frame, seeds the map on success."""
    from visual_sgraphs_tpu.slam import mapping

    init = getattr(system, "_mono_init_frame", None)
    if init is None:
        system._mono_init_frame = frame
        return False

    match, _ = match_nn_ratio(
        init.desc, init.valid, frame.desc, frame.valid,
        ratio=0.9, angle_a=init.angle, angle_b=frame.angle,
    )
    ok = np.asarray(match >= 0)
    if ok.sum() < 100:
        system._mono_init_frame = frame  # stale reference: restart
        return False

    slot2 = jnp.maximum(match, 0)
    K = system.cam_K
    x1 = cameras.unproject_pinhole(K, init.uv)
    x2 = cameras.unproject_pinhole(K, frame.uv[slot2])
    E, inl, n_inl = essential_ransac(
        x1, x2, jnp.asarray(match >= 0), jax.random.PRNGKey(0)
    )
    if int(n_inl) < 80:
        return False
    T_21, p1, good = recover_pose(E, x1, x2, inl)
    n_good = int(jnp.sum(good))
    if n_good < 60:
        return False
    # median-depth scale normalization (CreateInitialMapMonocular scales the
    # map so the median scene depth is 1, Tracking.cc:2589+)
    z = jnp.where(good, p1[:, 2], jnp.nan)
    med = jnp.nanmedian(z)
    p1 = p1 / med
    T_21 = T_21.at[4:7].divide(med)

    # seed the map: KF0 at identity with the triangulated points, then KF1
    F = init.uv.shape[0]
    depth_like = jnp.where(good, p1[:, 2], -1.0)  # points in frame-0 camera
    init_with_depth = init._replace(depth=depth_like)
    slot_pt0 = jnp.full((F,), -1, jnp.int32)
    kf0_host = system._host_alloc_kf_slot()
    system.map, kf0, _ = mapping.insert_keyframe(
        system.map, init_with_depth, lie.se3_identity(), slot_pt0, K,
        slot=jnp.asarray(kf0_host, jnp.int32),
    )
    # KF1 observes the same points through the match table
    obs_sorted = jnp.where(
        good, system.map.kf_obs_pt[kf0], -1
    )  # (F,) pt ids by init slot
    slot_pt1 = jnp.full((F,), -1, jnp.int32).at[
        jnp.where(good, match, F - 1)
    ].max(jnp.where(good, obs_sorted, -1))
    frame_no_depth = frame._replace(depth=jnp.full((F,), -1.0))
    kf1_host = system._host_alloc_kf_slot()
    system.map, kf1, _ = mapping.insert_keyframe(
        system.map, frame_no_depth, T_21, slot_pt1, K,
        slot=jnp.asarray(kf1_host, jnp.int32),
    )
    system.map, _ = mapping.local_ba(
        system.map, kf1, K, None, n_window=4, iters=10
    )
    system.ref_kf = kf1
    system.ref_kf_host = kf1_host
    system.last_pose = system.map.kf_pose[kf1]
    system.frames_since_kf = 0
    system.last_kf_inliers = n_good
    system._mono_init_frame = None
    return True
