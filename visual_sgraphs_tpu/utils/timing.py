"""Per-stage timing instrumentation — the REGISTER_TIMES equivalent.

The reference wraps std::chrono probes around every pipeline stage behind a
compile-time flag (Tracking.cc:1946-2321, LocalMapping.cc:70-192,
LoopClosing.cc:103-185) and dumps a table at shutdown
(Tracking::PrintTimeStats).  Here the same taxonomy is a host-side registry
of named stages; ``sync=True`` adds a ``block_until_ready`` barrier at each
stage end so device time is attributed to the stage that dispatched it
(otherwise JAX's async dispatch charges everything to whichever stage reads
a scalar back).

Off by default: zero overhead on the hot path when disabled.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict

# the stage taxonomy (mirrors the reference's probe set)
STAGES = (
    "frame_total",        # whole track_* call
    "orb_extract",        # Frame construction (fused with track dispatch)
    "track_dispatch",     # per-frame tracking program dispatch
    "track_resolve",      # deferred scalar readback + host decision
    "track_retry",        # mid-batch failure recovery re-track
    "kf_insert",          # insert_and_maintain dispatch
    "local_ba",           # standalone LBA (scene-graph / VI variants)
    "loop_warmup",        # one-time AOT compile of the loop program set
    "loop_detect",        # BoW + candidate retrieval + consistency
    "loop_verify",        # Sim3 RANSAC + refine + guided re-match
    "loop_correct",       # PGO + map/scene-graph correction + fuse
    "loop_lba",           # welding-window BA after a loop
    "global_ba",          # GBA after loop
    "reloc",              # relocalization attempts
    "sg_detect",          # scene-graph plane extraction + association
    "sg_ba",              # scene-graph joint BA
    "imu_preint",         # per-frame preintegration
    "imu_ba",             # VI local BA
)


class StageTimers:
    """Named wall-clock accumulators with optional device sync."""

    def __init__(self, enabled: bool = False, sync: bool = False):
        self.enabled = enabled
        self.sync = sync
        self.total = defaultdict(float)
        self.count = defaultdict(int)
        self.max = defaultdict(float)

    @contextlib.contextmanager
    def stage(self, name: str, sync_on=None):
        """Time a stage.  ``sync_on``: optional array/pytree blocked on at
        exit when ``self.sync`` (attributes device time to this stage)."""
        if not self.enabled:
            yield
            return
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if self.sync and sync_on is not None:
                import jax

                jax.block_until_ready(sync_on)
            dt = time.perf_counter() - t0
            self.total[name] += dt
            self.count[name] += 1
            if dt > self.max[name]:
                self.max[name] = dt

    def add(self, name: str, seconds: float) -> None:
        if not self.enabled:
            return
        self.total[name] += seconds
        self.count[name] += 1
        if seconds > self.max[name]:
            self.max[name] = seconds

    def summary(self) -> dict:
        """{stage: {total_s, count, mean_ms, max_ms}} for recorded stages."""
        out = {}
        for name in self.total:
            c = self.count[name]
            out[name] = {
                "total_s": round(self.total[name], 4),
                "count": c,
                "mean_ms": round(1e3 * self.total[name] / max(c, 1), 3),
                "max_ms": round(1e3 * self.max[name], 3),
            }
        return out

    def report(self) -> str:
        """Aligned text table (Tracking::PrintTimeStats equivalent)."""
        rows = sorted(self.summary().items(),
                      key=lambda kv: -kv[1]["total_s"])
        lines = [f"{'stage':<16} {'count':>7} {'mean ms':>9} "
                 f"{'max ms':>9} {'total s':>9}"]
        for name, s in rows:
            lines.append(
                f"{name:<16} {s['count']:>7} {s['mean_ms']:>9.2f} "
                f"{s['max_ms']:>9.2f} {s['total_s']:>9.2f}"
            )
        return "\n".join(lines)

    def reset(self) -> None:
        self.total.clear()
        self.count.clear()
        self.max.clear()
