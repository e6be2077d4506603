"""Microbench the loop-correction chain on the live backend: time each
program twice (compile vs steady-state)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from visual_sgraphs_tpu.config import CapacityConfig, OrbConfig
from visual_sgraphs_tpu.core import lie
from visual_sgraphs_tpu.place import pgo
from visual_sgraphs_tpu.slam import mapping
from visual_sgraphs_tpu.slam.map_state import empty_map


def t2(name, fn):
    r = fn()
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    r = fn()
    jax.block_until_ready(r)
    t1 = time.perf_counter()
    r = fn()
    jax.block_until_ready(r)
    t2_ = time.perf_counter()
    print(f"{name}: run2={1e3*(t1-t0):.1f}ms run3={1e3*(t2_-t1):.1f}ms")
    return r


def main():
    rng = np.random.default_rng(0)
    cap = CapacityConfig(max_keyframes=128, max_points=32768)
    m = empty_map(cap, OrbConfig(n_features=1000))
    K, N, F = m.K, m.N, m.F
    n_kf, n_pt = 30, 20000
    kf_pose = jax.vmap(lie.se3_normalize)(
        jnp.asarray(np.concatenate([
            rng.normal(size=(K, 4)) * 0.1 + np.array([1, 0, 0, 0]),
            rng.normal(size=(K, 3)),
        ], axis=1), jnp.float32)
    )
    obs = rng.integers(0, n_pt, size=(K, F)).astype(np.int32)
    m = m._replace(
        kf_pose=kf_pose,
        kf_valid=jnp.arange(K) < n_kf,
        kf_uv=jnp.asarray(rng.uniform(0, 600, size=(K, F, 2)), jnp.float32),
        kf_depth=jnp.asarray(rng.uniform(1, 5, size=(K, F)), jnp.float32),
        kf_obs_pt=jnp.asarray(obs),
        kf_kp_valid=jnp.ones((K, F), bool),
        pt_pos=jnp.asarray(rng.normal(size=(N, 3)) * 3, jnp.float32),
        pt_valid=jnp.arange(N) < n_pt,
        n_kf=jnp.asarray(n_kf, jnp.int32),
        n_pt=jnp.asarray(n_pt, jnp.int32),
    )
    cam_K = jnp.asarray([517.3, 516.5, 318.6, 255.3], jnp.float32)
    cam_bf = jnp.asarray(40.0, jnp.float32)

    edges = t2("build_covis_edges", lambda: pgo.build_covis_edges(m))
    kf = jnp.asarray(25, jnp.int32)
    best = 4
    fixed = jnp.zeros((K,), bool).at[best].set(True)
    S = jnp.asarray([1, 0, 0, 0, 0.2, 0.1, 0, 1.0], jnp.float32)
    res = t2("essential_graph", lambda: pgo.optimize_essential_graph(
        m.kf_pose, m.kf_valid, edges, jnp.asarray(best, jnp.int32), kf,
        S, fixed, iters=20, fix_scale=True))
    t2("correct_map", lambda: pgo.correct_map(m, res))
    t2("fuse_observations", lambda: mapping.fuse_observations(m, kf, cam_K))
    t2("local_ba(generic)", lambda: mapping.local_ba(
        m, kf, cam_K, cam_bf, n_window=10, iters=6)[0])
    from visual_sgraphs_tpu.optim.fast_ba import fast_local_ba
    t2("fast_local_ba", lambda: fast_local_ba(
        m, kf, cam_K, cam_bf, n_window=10, iters=6)[0])
    print("device:", jax.devices()[0].device_kind)


if __name__ == "__main__":
    main()
