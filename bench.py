"""Benchmark: end-to-end RGB-D SLAM frames/sec on real hardware.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The reference's real-time operating point is 30 fps on a desktop CPU
(BASELINE.md: TUM camera rate, tracking designed to keep up).
``vs_baseline`` is therefore measured fps / 30.  The run covers the full
per-frame path — ORB extraction, local-map tracking with two
match+pose-optimize passes, keyframe insertion, local BA, culling — on a
synthetic 640x480 RGB-D stream with 1000 features (TUM1.yaml budget).
"""

from __future__ import annotations

import json
import time

import numpy as np


def _enable_compile_cache():
    """Persistent XLA compile cache — the remote TPU compiler in this
    environment takes O(minutes) per large program, and the cache removes
    that for every process after the first."""
    import os

    import jax

    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            os.path.expanduser("~/.jax_cache"),
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:
        pass


def main():
    _enable_compile_cache()
    import jax

    from visual_sgraphs_tpu.config import (
        CapacityConfig,
        OrbConfig,
        Sensor,
        SystemConfig,
    )
    from visual_sgraphs_tpu.core import geometry
    from visual_sgraphs_tpu.io.synthetic import SyntheticScene
    from visual_sgraphs_tpu.slam import SlamSystem

    import jax.numpy as jnp

    scene = SyntheticScene(h=480, w=640)
    cfg = SystemConfig(
        sensor=Sensor.RGBD,
        camera=scene.cam,
        orb=OrbConfig(n_features=1000),
        capacity=CapacityConfig(max_keyframes=128, max_points=32768),
    )
    system = SlamSystem(cfg)

    n_frames = 160
    warmup = 40  # first frames pay compilation (incl. the first keyframe's
    # BA shapes); steady state measured after
    frames = list(scene.frames(n_frames, kind="arc"))

    gt = []
    t_start = None
    for i, (gray, depth, T_wc, ts) in enumerate(frames):
        if i == warmup:
            t_start = time.time()
        system.track_rgbd(gray, depth, ts)
        gt.append(np.asarray(T_wc)[4:7])
    elapsed = time.time() - t_start
    fps = (n_frames - warmup) / elapsed

    est = system.positions()
    rmse, _ = geometry.ate_rmse(
        jnp.asarray(est), jnp.asarray(np.stack(gt))
    )

    print(
        json.dumps(
            {
                "metric": "rgbd_slam_fps_640x480_1000feat",
                "value": round(fps, 2),
                "unit": "frames/s",
                "vs_baseline": round(fps / 30.0, 3),
                "ate_rmse_m": round(float(rmse), 4),
                "n_keyframes": int(system.map.n_kf),
                "n_points": int(system.map.n_pt),
                "device": jax.devices()[0].device_kind,
            }
        )
    )


if __name__ == "__main__":
    main()
