"""bench.py configuration with full event dump + error profile (TPU)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.jax_cache"))

from visual_sgraphs_tpu.config import (
    CapacityConfig, MappingConfig, OrbConfig, PlaceConfig, Sensor,
    SystemConfig, TrackingConfig,
)
from visual_sgraphs_tpu.core import geometry
from visual_sgraphs_tpu.core import lie as _lie
from visual_sgraphs_tpu.io.synthetic import SyntheticScene
from visual_sgraphs_tpu.scenegraph.manager import SceneGraphManager
from visual_sgraphs_tpu.slam import SlamSystem


def main():
    scene = SyntheticScene(h=480, w=640)
    cfg = SystemConfig(
        sensor=Sensor.RGBD,
        camera=scene.cam,
        orb=OrbConfig(n_features=1000),
        capacity=CapacityConfig(max_keyframes=128, max_points=32768),
        tracking=TrackingConfig(pipeline_depth=8),
        mapping=MappingConfig(lba_iters=6, lba_interval=2, cull_interval=2),
        loop_closing=True,
        place=PlaceConfig(vocab_min_keyframes=4, consistency=1, min_gap=8),
    )
    system = SlamSystem(cfg)
    system.scenegraph = SceneGraphManager(cfg.scenegraph, cfg.capacity)

    n_frames = 192
    gt = []
    t0 = time.time()
    for i, (gray, depth, sem, T_wc, ts) in enumerate(
        scene.frames_with_semantics(n_frames, kind="orbit2")
    ):
        system.scenegraph.provide_semantics(ts, sem)
        system.track_rgbd(jnp.asarray(gray), jnp.asarray(depth), ts)
        gt.append(np.asarray(T_wc)[4:7])
    system.flush()
    print(f"wall {time.time()-t0:.0f}s")

    est = system.positions()
    gt_arr = jnp.asarray(np.stack(gt))
    rmse, _ = geometry.ate_rmse(jnp.asarray(est), gt_arr)
    S = geometry.horn_sim3(jnp.asarray(est), gt_arr, fix_scale=True)
    err = np.asarray(jnp.linalg.norm(
        _lie.sim3_apply(S, jnp.asarray(est)) - gt_arr, axis=-1
    ))
    blocks = [round(float(np.sqrt(np.mean(e ** 2))), 3)
              for e in np.array_split(err, 8)]
    for _, k, pay in system.events.records:
        print(" ", k, pay)
    print(f"ate={float(rmse):.4f} blocks={blocks} "
          f"argmax={int(np.argmax(err))} max={err.max():.3f}")


if __name__ == "__main__":
    main()
