"""Observation-sharded bundle adjustment over a device mesh.

The BA normal equations are a sum over observations — an embarrassingly
reducible structure.  Each device holds a shard of the observation table
(gathering its pose/point rows from replicated state), assembles *partial*

- dense reduced Hessian/gradient over keyframe tangents,
- per-landmark 3x3 blocks Hxx, bx and cross terms P,

and a single ``psum`` over the mesh axis completes the global normal
equations; the Schur-reduced camera system (small, dense) is solved
replicated on every device.  This mirrors how the scaling-book treats
data-parallel reductions: shard the contraction, let one collective ride the
ICI per step.  Landmark positions and keyframe poses update replicated.

The observation partition is by *covisibility block* when the caller orders
observations by keyframe (contiguous keyframe ranges land on the same
device, so gathers stay local-ish); any permutation is correct regardless.

No counterpart exists in the reference (it is single-process,
SURVEY §2.7) — this is the TPU-native capability the rebuild adds.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from visual_sgraphs_tpu.core import cameras, lie

AXIS = "ba_shard"


def make_mesh(n_devices: int | None = None) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (AXIS,))


def _reproj_residual_jac(T_cw, X_w, uv, cam_K):
    """Whitened mono reprojection residual + Jacobians wrt (pose, point)."""

    def res(dpose, dpoint):
        T = lie.se3_boxplus(T_cw, dpose)
        X = X_w + dpoint
        return cameras.project_pinhole(cam_K, lie.se3_apply(T, X)) - uv

    z6 = jnp.zeros(6, T_cw.dtype)
    z3 = jnp.zeros(3, T_cw.dtype)
    r = res(z6, z3)
    Jp, Jx = jax.jacfwd(res, argnums=(0, 1))(z6, z3)
    return r, Jp, Jx


def _local_normal_eqs(kf_pose, pt_pos, obs_kf, obs_pt, uv, valid, cam_K,
                      huber: float):
    """Partial normal equations from this device's observation shard."""
    K = kf_pose.shape[0]
    N = pt_pos.shape[0]
    r, Jp, Jx = jax.vmap(
        lambda k, p, u: _reproj_residual_jac(kf_pose[k], pt_pos[p], u, cam_K)
    )(obs_kf, obs_pt, uv)
    chi2 = jnp.sum(r * r, axis=-1)
    w = jnp.where(valid, 1.0, 0.0)
    w = w * jnp.minimum(1.0, huber / jnp.sqrt(jnp.maximum(chi2, 1e-12)))

    Hpp = jnp.einsum("mri,mrj,m->mij", Jp, Jp, w)  # (m, 6, 6)
    Hxx = jnp.einsum("mri,mrj,m->mij", Jx, Jx, w)  # (m, 3, 3)
    Hpx = jnp.einsum("mri,mrj,m->mij", Jp, Jx, w)  # (m, 6, 3)
    gp = jnp.einsum("mri,mr,m->mi", Jp, r, w)
    gx = jnp.einsum("mri,mr,m->mi", Jx, r, w)

    # scatter into per-variable tables (local partial sums)
    Hpp_t = jnp.zeros((K, 6, 6), r.dtype).at[obs_kf].add(Hpp)
    gp_t = jnp.zeros((K, 6), r.dtype).at[obs_kf].add(gp)
    Hxx_t = jnp.zeros((N, 3, 3), r.dtype).at[obs_pt].add(Hxx)
    gx_t = jnp.zeros((N, 3), r.dtype).at[obs_pt].add(gx)
    # cross blocks into the dense (3N x 6K) coupling, built as (N, 3, K, 6)
    Pc = jnp.zeros((N, 3, K, 6), r.dtype).at[obs_pt, :, obs_kf, :].add(
        jnp.swapaxes(Hpx, -1, -2)
    )
    cost = jnp.sum(w * chi2)
    return Hpp_t, gp_t, Hxx_t, gx_t, Pc, cost


def _schur_solve(Hpp_t, gp_t, Hxx_t, gx_t, Pc, lam, fixed_kf, valid_pt):
    """Replicated Schur-complement solve of the *global* normal equations."""
    K, N = Hpp_t.shape[0], Hxx_t.shape[0]
    dtype = gp_t.dtype
    eye6 = jnp.eye(6, dtype=dtype)
    eye3 = jnp.eye(3, dtype=dtype)
    dp = jnp.clip(jnp.diagonal(Hpp_t, axis1=-2, axis2=-1), 1e-6, None)
    dx = jnp.clip(jnp.diagonal(Hxx_t, axis1=-2, axis2=-1), 1e-6, None)
    Hpp_t = Hpp_t + (lam * dp + 1e-5)[..., None] * eye6
    Hxx_t = Hxx_t + (lam * dx + 1e-5)[..., None] * eye3

    # dense reduced system over keyframes
    D = 6 * K
    H = _blockdiag(Hpp_t)
    g = gp_t.reshape(D)
    L = jnp.linalg.cholesky(Hxx_t)  # (N, 3, 3)
    Pmat = Pc.reshape(N, 3, D)
    B = jax.vmap(
        lambda Li, Pi: jax.scipy.linalg.solve_triangular(Li, Pi, lower=True)
    )(L, Pmat)
    c = jax.vmap(
        lambda Li, bi: jax.scipy.linalg.solve_triangular(Li, bi, lower=True)
    )(L, gx_t)
    S = H - jnp.einsum("nrd,nre->de", B, B)
    rhs = -g + jnp.einsum("nrd,nr->d", B, c)

    free = jnp.repeat(~fixed_kf, 6).astype(dtype)
    S = S * free[:, None] * free[None, :] + jnp.diag(1.0 - free)
    rhs = rhs * free
    cf = jax.scipy.linalg.cho_factor(S, lower=True)
    dxr = jax.scipy.linalg.cho_solve(cf, rhs) * free

    y = c + jnp.einsum("nrd,d->nr", B, dxr)
    dxe = -jax.vmap(
        lambda Li, yi: jax.scipy.linalg.solve_triangular(Li.T, yi, lower=False)
    )(L, y)
    dxe = jnp.where(valid_pt[:, None], dxe, 0.0)
    return dxr.reshape(K, 6), dxe


def _blockdiag(blocks: jax.Array) -> jax.Array:
    """(K, t, t) -> (K*t, K*t) block-diagonal, vectorized."""
    K, t, _ = blocks.shape
    out = jnp.zeros((K, t, K, t), blocks.dtype)
    out = out.at[jnp.arange(K), :, jnp.arange(K), :].set(blocks)
    return out.reshape(K * t, K * t)


def sharded_ba_step(
    kf_pose, pt_pos, obs_kf, obs_pt, uv, valid, cam_K,
    fixed_kf, valid_pt, mesh: Mesh, lam=1e-4, huber: float = 2.45,
):
    """One Gauss-Newton step with the observation table sharded over
    ``mesh``.  Returns (new_kf_pose, new_pt_pos, cost).
    """

    def step(kf_pose, pt_pos, obs_kf, obs_pt, uv, valid):
        parts = _local_normal_eqs(
            kf_pose, pt_pos, obs_kf, obs_pt, uv, valid, cam_K,
            huber,
        )
        # one collective completes the global normal equations
        Hpp_t, gp_t, Hxx_t, gx_t, Pc, cost = jax.tree.map(
            lambda x: jax.lax.psum(x, AXIS), parts
        )
        dxr, dxe = _schur_solve(
            Hpp_t, gp_t, Hxx_t, gx_t, Pc,
            jnp.asarray(lam, gp_t.dtype), fixed_kf, valid_pt,
        )
        new_pose = jax.vmap(lie.se3_boxplus)(
            kf_pose, jnp.where(fixed_kf[:, None], 0.0, dxr)
        )
        new_pts = pt_pos + dxe
        return new_pose, new_pts, cost

    sharded = jax.shard_map(
        step,
        mesh=mesh,
        in_specs=(P(), P(), P(AXIS), P(AXIS), P(AXIS), P(AXIS)),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )
    return sharded(kf_pose, pt_pos, obs_kf, obs_pt, uv, valid)


def sharded_ba(
    kf_pose, pt_pos, obs_kf, obs_pt, uv, valid, cam_K,
    fixed_kf, valid_pt, mesh: Mesh, iters: int = 10, lam=1e-4,
):
    """Fixed-schedule Gauss-Newton loop of sharded steps (jit once)."""

    @jax.jit
    def run(kf_pose, pt_pos):
        def body(carry, _):
            pose, pts = carry
            pose, pts, cost = sharded_ba_step(
                pose, pts, obs_kf, obs_pt, uv, valid, cam_K,
                fixed_kf, valid_pt, mesh, lam,
            )
            return (pose, pts), cost

        (pose, pts), costs = jax.lax.scan(
            body, (kf_pose, pt_pos), None, length=iters
        )
        return pose, pts, costs

    return run(kf_pose, pt_pos)
