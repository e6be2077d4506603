"""EuRoC MAV dataset reader: stereo pairs + IMU + ground truth.

Replaces the reference's EuRoC launch/rosbag path (launch/euroc_*.launch,
orb_slam3/Examples/Stereo/stereo_euroc.cc's LoadImages): reads the ASL
folder layout (mav0/cam0/data.csv, cam1, imu0, state_groundtruth_estimate0)
and yields time-aligned stereo frames with the IMU samples since the
previous frame — the input contract of the stereo-inertial frontend.
"""

from __future__ import annotations

import csv
import os

import numpy as np


def _read_csv(path: str):
    rows = []
    with open(path) as f:
        for row in csv.reader(f):
            if not row or row[0].startswith("#"):
                continue
            rows.append(row)
    return rows


class EurocDataset:
    """Iterates (gray_l, gray_r, imu (M, 7) [t wx wy wz ax ay az], ts)."""

    def __init__(self, root: str, max_dt: float = 0.005):
        from PIL import Image  # noqa: F401

        mav = os.path.join(root, "mav0")
        cam0 = _read_csv(os.path.join(mav, "cam0", "data.csv"))
        cam1 = _read_csv(os.path.join(mav, "cam1", "data.csv"))
        self.root = mav
        t1 = {r[0]: r[1] for r in cam1}
        self.frames = [
            (int(r[0]) * 1e-9, r[1], t1[r[0]])
            for r in cam0 if r[0] in t1
        ]
        imu_path = os.path.join(mav, "imu0", "data.csv")
        if os.path.exists(imu_path):
            rows = _read_csv(imu_path)
            self.imu = np.asarray(
                [[int(r[0]) * 1e-9] + [float(x) for x in r[1:7]]
                 for r in rows], np.float64,
            )
        else:
            self.imu = np.zeros((0, 7))
        gt_path = os.path.join(mav, "state_groundtruth_estimate0",
                               "data.csv")
        if os.path.exists(gt_path):
            rows = _read_csv(gt_path)
            self.groundtruth = np.asarray(
                [[int(r[0]) * 1e-9] + [float(x) for x in r[1:8]]
                 for r in rows], np.float64,
            )  # t, p(3), q_wxyz(4)
        else:
            self.groundtruth = np.zeros((0, 8))

    def __len__(self):
        return len(self.frames)

    def __iter__(self):
        from PIL import Image

        prev_t = None
        for ts, f0, f1 in self.frames:
            g0 = np.asarray(
                Image.open(os.path.join(self.root, "cam0", "data", f0))
                .convert("L"), np.float32)
            g1 = np.asarray(
                Image.open(os.path.join(self.root, "cam1", "data", f1))
                .convert("L"), np.float32)
            if prev_t is None:
                imu = self.imu[:0]
            else:
                sel = (self.imu[:, 0] > prev_t) & (self.imu[:, 0] <= ts)
                imu = self.imu[sel]
            prev_t = ts
            yield g0, g1, imu, ts

    def gt_positions(self) -> np.ndarray:
        return self.groundtruth[:, 1:4]


class KittiOdometryDataset:
    """KITTI odometry grayscale stereo reader (sequences/NN layout —
    image_0/, image_1/, times.txt; poses from poses/NN.txt).  The
    reference's kitti path (orb_slam3/Examples/Stereo/stereo_kitti.cc
    LoadImages)."""

    def __init__(self, seq_dir: str, poses_file: str | None = None):
        from PIL import Image  # noqa: F401

        self.seq = seq_dir
        with open(os.path.join(seq_dir, "times.txt")) as f:
            self.times = [float(x) for x in f.read().split()]
        self.n = len(self.times)
        if poses_file and os.path.exists(poses_file):
            rows = np.loadtxt(poses_file).reshape(-1, 3, 4)
            self.groundtruth = rows  # (T, 3, 4) T_w_cam
        else:
            self.groundtruth = None

    def __len__(self):
        return self.n

    def __iter__(self):
        from PIL import Image

        for i in range(self.n):
            name = f"{i:06d}.png"
            g0 = np.asarray(
                Image.open(os.path.join(self.seq, "image_0", name)),
                np.float32)
            g1 = np.asarray(
                Image.open(os.path.join(self.seq, "image_1", name)),
                np.float32)
            yield g0, g1, self.times[i]

    def gt_positions(self) -> np.ndarray:
        return self.groundtruth[:, :, 3] if self.groundtruth is not None \
            else np.zeros((0, 3))
