"""Hierarchical configuration for the whole system.

Single typed replacement for the reference's four host-side config layers
(SURVEY §5.6): sensor settings yaml (Settings.cc), the SystemParams singleton
(Types/SystemParams.cc / config/common_system_params.yaml), the environment
JSON database (DatabaseParser.cc), and launch-file parameters.
"""

from __future__ import annotations

import dataclasses
import json
from typing import Sequence

import numpy as np


class Sensor:
    MONOCULAR = 0
    STEREO = 1
    RGBD = 2
    IMU_MONOCULAR = 3
    IMU_STEREO = 4
    IMU_RGBD = 5


@dataclasses.dataclass(frozen=True)
class CameraConfig:
    """Camera intrinsics + optional distortion (config/RGB-D/TUM1.yaml).

    ``model``: "pinhole" (rad-tan distortion k1..k3/p1/p2, the reference's
    Pinhole, CameraModels/Pinhole.cpp) or "kb8" (Kannala-Brandt fisheye
    with k1..k4 polynomial, CameraModels/KannalaBrandt8.cpp).  For kb8 the
    frame pipeline unprojects raw keypoints through the fisheye model into
    virtual-pinhole pixels, so tracking/BA stay on the calibrated pinhole
    geometry — the TPU-native equivalent of the reference carrying the
    camera model into every projection."""

    fx: float = 517.3
    fy: float = 516.5
    cx: float = 318.6
    cy: float = 255.3
    k1: float = 0.0
    k2: float = 0.0
    p1: float = 0.0
    p2: float = 0.0
    k3: float = 0.0
    k4: float = 0.0  # kb8 only
    model: str = "pinhole"
    width: int = 640
    height: int = 480
    fps: float = 30.0
    bf: float = 40.0  # stereo baseline * fx
    depth_factor: float = 5000.0  # RGB-D depth-map scaling (DepthMapFactor)
    depth_thresh: float = 40.0 / 517.3 * 3.0  # close/far point threshold

    @property
    def K(self) -> np.ndarray:
        return np.array([self.fx, self.fy, self.cx, self.cy], np.float32)

    @property
    def dist(self) -> np.ndarray:
        return np.array([self.k1, self.k2, self.p1, self.p2, self.k3],
                        np.float32)


@dataclasses.dataclass(frozen=True)
class OrbConfig:
    """ORBextractor.* settings block."""

    n_features: int = 1000
    n_levels: int = 8
    scale_factor: float = 1.2
    ini_fast_thresh: float = 20.0
    min_fast_thresh: float = 7.0


@dataclasses.dataclass(frozen=True)
class TrackingConfig:
    # motion-model match windows, in pixels AT ``match_radius_ref_fx``
    # focal length — SlamSystem scales them with the live camera's fx so
    # the window is a constant ANGULAR search region (the reference's
    # fixed th=15 px is tuned per dataset calibration; a resolution- or
    # FOV-change there requires re-tuning, Tracking.cc SearchByProjection)
    match_radius_coarse: float = 15.0
    match_radius_fine: float = 7.0
    match_radius_ref_fx: float = 260.0
    min_inliers_ok: int = 15  # below -> RECENTLY_LOST
    min_matches_track: int = 20
    kf_min_interval: int = 3  # frames between keyframes (min)
    kf_max_interval: int = 30  # force new KF after this many frames
    kf_min_tracked_ratio: float = 0.75  # new KF if tracked/ref < this
    recently_lost_budget: float = 5.0  # seconds before LOST (Tracking.cc:2051)
    # frames tracked per device dispatch (lax.scan pipeline): >1 amortizes
    # the per-dispatch tunnel latency; host decisions lag by up to this many
    # frames (the reference's tracking/mapping thread decoupling)
    pipeline_depth: int = 1
    # inertial pose-prior weight in the per-frame solve once the IMU is
    # initialized (PoseInertialOptimizationLastFrame's role,
    # Optimizer.cc:5999); 0 disables
    imu_prior_weight: float = 10.0


@dataclasses.dataclass(frozen=True)
class MappingConfig:
    local_window: int = 10  # covisible KFs in local BA
    lba_iters: int = 10
    lba_rounds: int = 2
    # run local BA on every n-th keyframe (the reference aborts LBA when
    # the keyframe queue is non-empty — mbAbortBA, LocalMapping.cc —
    # so under load its effective LBA rate also drops below 1/KF)
    lba_interval: int = 1
    cull_interval: int = 1  # point/KF culling every n-th keyframe
    fast_ba: bool = True  # analytic landmark-grouped LBA (optim/fast_ba.py)
    # instead of the generic autodiff engine — same window/gauge policy
    point_cull_min_found_ratio: float = 0.25
    point_cull_min_obs: int = 2
    kf_cull_redundancy: float = 0.9  # KF redundant if 90% points seen 3+ times
    max_obs_per_ba: int = 16384


@dataclasses.dataclass(frozen=True)
class CapacityConfig:
    """Static array capacities (compile-time shape bucket sizes)."""

    max_keyframes: int = 256
    max_points: int = 65536
    # retirement-ledger capacity: culled/evicted keyframes whose
    # trajectory rows re-base through a surviving parent (long streams
    # retire far more keyframes than K)
    max_retired: int = 4096
    max_planes: int = 64
    # per-plane membership hash slots (Plane.cc octree equivalent);
    # 512 slots at 0.3 m voxels cover ~45 m2 of wall surface per plane
    plane_vox_slots: int = 512
    max_rooms: int = 16
    max_doors: int = 16
    max_markers: int = 32


@dataclasses.dataclass(frozen=True)
class SceneGraphConfig:
    """vS-Graphs semantic/geometric segmentation knobs
    (config/common_system_params.yaml via SystemParams.h:33-160)."""

    mode: str = "both"  # {both, semantic, geometric} operation modes
    marker_impact: float = 0.5
    plane_kf_factor: bool = True
    plane_point_factor: bool = True
    plane_point_info: float = 5.0  # Gij factor gain (optimization.plane_point)
    plane_map_point_factor: bool = False
    plane_map_point_dist: float = 0.08  # membership distance (octree proxy)
    plane_map_point_info: float = 2.0
    # semantic map-point refinement (Optimizer.cc:1271-1336 + Plane.cc:
    # 81-140 octree membership): map points lying BEHIND a settled
    # semantic plane (opposite side from the camera, beyond the margin,
    # within the plane's lateral extent) are physically impossible
    # (depth through a wall) and are culled at keyframe time.  Default
    # OFF (a config toggle in the reference too): with noisy plane
    # estimates the side test misfires and culls live points (measured
    # +0.1 m ATE at the 240x320 gate); enable for sensors with heavy
    # through-surface depth artifacts
    refine_map_points: bool = False
    refine_behind_thresh: float = 0.15
    refine_lateral_radius: float = 2.5
    room_factor: bool = True  # room-center-from-walls factors
    room_info: float = 1.0
    door_factor: bool = True  # door-room rigidity factors
    plane_assoc_ominus_thresh: float = 0.3
    plane_assoc_dist_thresh: float = 0.35
    plane_min_votes: float = 3.0
    # plane-based covisibility (KeyFrame.cc:486-523, SystemParams.h:76-80):
    # each shared plane adds ``plane_covis_score`` shared-point equivalents
    # to a keyframe pair's covisibility weight before the local-BA window
    # is selected; planes without a settled semantic class count at
    # ``plane_covis_undefined_factor`` of that.  Default OFF (a config
    # toggle in the reference too): broad indoor planes (floor, long
    # walls) are shared by most keyframes, and on the synthetic gates the
    # bonus displaced genuinely covisible keyframes from the 10-KF BA
    # window (measured +0.35 m ATE at the 240x320 gate)
    plane_covis_enabled: bool = False
    plane_covis_score: float = 10.0
    plane_covis_undefined_factor: float = 0.2
    # room segmentation method (SystemParams room_seg.method): "walls" =
    # facing-wall-pair analysis only (the reference's deprecated
    # geometric method, SemanticsManager.cc:206-300); "freespace" = seed
    # candidates from free-space clusters (the primary voxblox path,
    # SemanticsManager.cc:302-403, batched in scenegraph/freespace.py)
    room_method: str = "walls"
    freespace_grid: int = 32
    freespace_voxel: float = 0.35
    ransac_iters: int = 256
    ransac_dist_thresh: float = 0.04
    ransac_min_inliers: int = 300
    voxel_size: float = 0.05
    room_wall_dist_thresh: float = 4.0
    room_center_dist_thresh: float = 1.5
    min_wall_area: float = 1.0


@dataclasses.dataclass(frozen=True)
class PlaceConfig:
    """Place recognition / loop closing knobs (the reference hard-codes
    these inside LoopClosing.cc / KeyFrameDatabase.cc)."""

    vocab_branching: int = 8
    # 8^4 = 4096 words: the dense (Kmax, W) database stays tiny (2 MB at
    # Kmax=128) and the batched tree descent just gains one gather level,
    # while word collisions between distinct views drop ~8x vs the old
    # 512-word tree (the reference ships a ~1M-word ORBvoc,
    # TemplatedVocabulary.h:1478 — trained offline on millions of frames;
    # an online-trained tree deeper than the descriptor diversity of one
    # session overfits it, so 8^4 is the sweet spot here)
    vocab_levels: int = 4
    vocab_min_keyframes: int = 4  # lazily train once this many KFs exist
    vocab_train_max_desc: int = 20000
    top_n_candidates: int = 3
    min_gap: int = 10  # candidate must be this many KF slots away
    loop_score_ratio: float = 0.75  # vs best covisible score (minScore rule)
    consistency: int = 2  # consecutive-KF consistency before verification
    loop_min_inliers: int = 20
    # guided re-match support required on top of the Sim3 inliers — the
    # reference's double gate (OptimizeSim3 >= 20, then SearchByProjection
    # >= 40, LoopClosing.cc:560-948); a weak Sim3 that passes the first
    # gate on coincidental matches rarely survives the second
    loop_min_guided: int = 40
    # minimum fraction of descriptor matches the refined Sim3 must explain
    # — aliased pairs (symmetric scenes) reach the absolute inlier count
    # on a minority of their matches; true revisits agree in bulk
    loop_min_inlier_ratio: float = 0.4
    loop_inlier_thresh_3d: float = 0.12  # metric Sim3-RANSAC gate (m)
    essential_min_weight: int = 30
    essential_max_edges: int = 512
    pgo_iters: int = 20  # reference: Optimizer.cc:2682
    loop_cooldown: int = 10  # KFs between corrections (merged-covisibility
    # suppression in the reference makes re-detections no-ops; a cooldown
    # is the pipeline equivalent)
    loop_min_correction: float = 0.02  # skip PGO when the verified Sim3 is
    # already near-identity (drift below this tangent norm)
    gba_after_loop: bool = True
    loop_local_ba: bool = True  # welding-window BA when GBA is off
    # (LoopClosureLocalBundleAdjustment, Optimizer.cc:4634)
    gba_iters: int = 10  # reference: LoopClosing.cc:2158
    reloc_min_inliers: int = 30
    seed: int = 0


@dataclasses.dataclass(frozen=True)
class ImuConfig:
    """IMU noise / extrinsics (the settings yaml's IMU block)."""

    noise_gyro: float = 1.7e-4
    noise_acc: float = 2.0e-3
    walk_gyro: float = 1.9e-5
    walk_acc: float = 3.0e-3
    freq: float = 200.0
    # T_bc: camera-to-body SE3 as [qw qx qy qz tx ty tz]
    T_bc: tuple = (1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0)


@dataclasses.dataclass(frozen=True)
class EnvRoom:
    """Prior room entry of the environment database
    (config/Environments/*.json, DatabaseParser.cc:32-70)."""

    name: str
    meta_marker: int
    is_corridor: bool = False
    door_markers: tuple = ()


@dataclasses.dataclass(frozen=True)
class EnvDoor:
    name: str
    marker: int


@dataclasses.dataclass(frozen=True)
class EnvDatabase:
    rooms: tuple = ()
    doors: tuple = ()

    @staticmethod
    def from_json(path: str) -> "EnvDatabase":
        with open(path) as f:
            data = json.load(f)
        rooms = tuple(
            EnvRoom(
                name=r.get("name", f"room{i}"),
                meta_marker=int(r.get("metaMarker", -1)),
                is_corridor=bool(r.get("isCorridor", False)),
                door_markers=tuple(int(d) for d in r.get("doorMarkers", [])),
            )
            for i, r in enumerate(data.get("rooms", []))
        )
        doors = tuple(
            EnvDoor(name=d.get("name", f"door{i}"), marker=int(d["marker"]))
            for i, d in enumerate(data.get("doors", []))
        )
        return EnvDatabase(rooms=rooms, doors=doors)


@dataclasses.dataclass(frozen=True)
class SystemConfig:
    sensor: int = Sensor.RGBD
    loop_closing: bool = False  # attach the LoopCloser stage
    localization_only: bool = False  # track against a frozen map
    distributed_gba: bool = True  # landmark-sharded GBA when devices > 1
    # observability (SURVEY §5.1/§5.5): per-stage timing + event log
    profile: bool = False
    profile_sync: bool = False  # block_until_ready per stage (attribution)
    verbose_events: bool = False
    # raise (instead of reconcile + event) when the host's mirrored
    # keyframe slot diverges from the device-computed one — tests set this
    strict_slot_check: bool = False
    camera: CameraConfig = CameraConfig()
    orb: OrbConfig = OrbConfig()
    tracking: TrackingConfig = TrackingConfig()
    mapping: MappingConfig = MappingConfig()
    capacity: CapacityConfig = CapacityConfig()
    scenegraph: SceneGraphConfig = SceneGraphConfig()
    place: PlaceConfig = PlaceConfig()
    imu: ImuConfig = ImuConfig()
    env: EnvDatabase = EnvDatabase()

    def sensor_is_monocular(self) -> bool:
        return self.sensor in (Sensor.MONOCULAR, Sensor.IMU_MONOCULAR)
