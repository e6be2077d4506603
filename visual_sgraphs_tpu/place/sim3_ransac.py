"""Batched Sim3/SE3 RANSAC between matched 3D point sets.

Replaces the reference's sequential ``Sim3Solver`` (orb_slam3/src/
Sim3Solver.cc: iterate -> sample 3 -> Horn -> count inliers -> repeat).
All H hypotheses are drawn and solved at once: one vmap'd closed-form Horn
solve over (H, 3, 3) samples and one (H, M) distance matrix for inlier
counting — RANSAC as two dense tensor ops instead of a loop.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from visual_sgraphs_tpu.core import geometry, lie


class Sim3Result(NamedTuple):
    S_ab: jax.Array  # (8,) Sim3 mapping frame-a points into frame-b
    inliers: jax.Array  # (M,) bool
    n_inliers: jax.Array  # () int32


@partial(jax.jit, static_argnames=("n_hyp", "fix_scale"))
def ransac_sim3(
    p_a: jax.Array,
    p_b: jax.Array,
    valid: jax.Array,
    key: jax.Array,
    n_hyp: int = 256,
    inlier_thresh: float = 0.10,
    fix_scale: bool = False,
) -> Sim3Result:
    """Estimate the similarity S_ab with p_b ~= S_ab . p_a.

    ``p_a``/``p_b``: (M, 3) matched points (invalid rows arbitrary);
    ``inlier_thresh`` is a metric 3D residual gate (the reference gates on
    reprojection chi2 in both frames, Sim3Solver.cc:CheckInliers; a metric
    gate is the calibrated-depth equivalent).  Degenerate (collinear) samples
    produce poor hypotheses and simply lose the inlier vote.
    """
    M = p_a.shape[0]
    w = valid.astype(jnp.float32)
    probs = w / jnp.maximum(jnp.sum(w), 1.0)
    samples = jax.random.choice(
        key, M, shape=(n_hyp, 3), replace=True, p=probs
    )

    S_hyp = jax.vmap(
        lambda idx: geometry.horn_sim3(p_a[idx], p_b[idx],
                                       fix_scale=fix_scale)
    )(samples)  # (H, 8)

    pred = jax.vmap(lambda S: lie.sim3_apply(S, p_a))(S_hyp)  # (H, M, 3)
    err = jnp.linalg.norm(pred - p_b[None], axis=-1)
    inl = (err < inlier_thresh) & valid[None, :]
    counts = jnp.sum(inl, axis=1)
    best = jnp.argmax(counts)

    # polish: weighted Horn on the best hypothesis' inliers
    w_best = inl[best].astype(jnp.float32)
    S_ref = geometry.horn_sim3(p_a, p_b, weights=w_best + 1e-9,
                               fix_scale=fix_scale)
    err_ref = jnp.linalg.norm(lie.sim3_apply(S_ref, p_a) - p_b, axis=-1)
    inl_ref = (err_ref < inlier_thresh) & valid
    # keep the polish only if it didn't lose support
    better = jnp.sum(inl_ref) >= counts[best]
    S_out = jnp.where(better, S_ref, S_hyp[best])
    inl_out = jnp.where(better, inl_ref, inl[best])
    return Sim3Result(S_ab=S_out, inliers=inl_out,
                      n_inliers=jnp.sum(inl_out).astype(jnp.int32))
