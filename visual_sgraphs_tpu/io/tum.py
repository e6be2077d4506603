"""TUM RGB-D dataset reader: rgb/depth/groundtruth association by timestamp.

Replaces the rosbag replay + ``evaluation/associate.py`` preprocessing of the
reference with a direct reader (same nearest-timestamp association policy,
max difference 0.02 s — associate.py:86).  Images load via PIL (depth PNGs
are 16-bit, scaled by ``depth_factor`` = 5000, config/RGB-D/TUM1.yaml).
"""

from __future__ import annotations

import os

import numpy as np


def _read_file_list(path: str) -> list[tuple[float, str]]:
    out = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            parts = line.split()
            out.append((float(parts[0]), parts[1]))
    return out


def _read_trajectory(path: str) -> list[tuple[float, np.ndarray]]:
    out = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            vals = [float(x) for x in line.split()]
            out.append((vals[0], np.asarray(vals[1:8])))
    return out


def associate(a: list, b: list, max_dt: float = 0.02) -> list[tuple[int, int]]:
    """Greedy nearest-timestamp matching (associate.py semantics)."""
    pairs = []
    used_b = set()
    j = 0
    for i, (ta, _) in enumerate(a):
        best, best_dt = -1, max_dt
        while j > 0 and b[j - 1][0] > ta - max_dt:
            j -= 1
        for k in range(j, len(b)):
            dt = abs(b[k][0] - ta)
            if b[k][0] > ta + max_dt:
                break
            if dt < best_dt and k not in used_b:
                best, best_dt = k, dt
        if best >= 0:
            pairs.append((i, best))
            used_b.add(best)
    return pairs


class TumRgbdDataset:
    """Iterates (gray float32 (H,W), depth float32 meters, timestamp)."""

    def __init__(self, root: str, depth_factor: float = 5000.0,
                 max_dt: float = 0.02):
        from PIL import Image  # noqa: F401 — fail early if PIL missing

        self.root = root
        self.depth_factor = depth_factor
        rgb = _read_file_list(os.path.join(root, "rgb.txt"))
        depth = _read_file_list(os.path.join(root, "depth.txt"))
        self.pairs = [
            (rgb[i][0], rgb[i][1], depth[j][1])
            for i, j in associate(rgb, depth, max_dt)
        ]
        gt_path = os.path.join(root, "groundtruth.txt")
        self.groundtruth = (
            _read_trajectory(gt_path) if os.path.exists(gt_path) else []
        )

    def __len__(self):
        return len(self.pairs)

    def __iter__(self):
        from PIL import Image

        for ts, rgb_rel, depth_rel in self.pairs:
            rgb = Image.open(os.path.join(self.root, rgb_rel)).convert("L")
            gray = np.asarray(rgb, np.float32)
            d = Image.open(os.path.join(self.root, depth_rel))
            depth = np.asarray(d, np.float32) / self.depth_factor
            yield gray, depth, ts

    def gt_positions(self) -> np.ndarray:
        return np.stack([p[1][:3] for p in self.groundtruth])
