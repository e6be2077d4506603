"""Scene-graph layer tests: RANSAC planes, association, voting, rooms."""

import jax
import jax.numpy as jnp
import numpy as np

from visual_sgraphs_tpu.core import lie, plane as plane_mod
from visual_sgraphs_tpu.io.synthetic import SyntheticScene, render
from visual_sgraphs_tpu.scenegraph import (
    GROUND,
    WALL,
    SceneGraphManager,
    extract_planes,
    ransac_plane,
    voxel_downsample,
)
from visual_sgraphs_tpu.scenegraph.manager import (
    associate_and_update,
    detect_planes_from_depth,
    detect_rooms,
)
from visual_sgraphs_tpu.scenegraph.pointcloud import backproject_depth
from visual_sgraphs_tpu.scenegraph.state import (
    UNDEFINED,
    empty_scenegraph,
    plane_semantics,
)


def test_voxel_downsample(rng):
    pts = jnp.asarray(rng.uniform(0, 1, size=(5000, 3)), jnp.float32)
    valid = jnp.ones(5000, bool)
    out, ok = voxel_downsample(pts, valid, voxel=0.25, n_out=256)
    n = int(ok.sum())
    assert 40 <= n <= 70  # 4^3 = 64 voxels, hash collisions may merge a few
    assert np.asarray(out)[np.asarray(ok)].min() >= 0
    assert np.asarray(out)[np.asarray(ok)].max() <= 1


def test_ransac_single_plane(rng):
    n = 1024
    pts = np.zeros((n, 3), np.float32)
    pts[:, :2] = rng.uniform(-2, 2, size=(n, 2))
    pts[:, 2] = 1.5 + rng.normal(size=n) * 0.005
    out = rng.uniform(-3, 3, size=(n // 8, 3)).astype(np.float32)
    allp = jnp.asarray(np.concatenate([pts, out]))
    valid = jnp.ones(allp.shape[0], bool)
    w = jnp.ones(allp.shape[0], jnp.float32)
    coeffs, mask, score = ransac_plane(
        allp, valid, w, jax.random.PRNGKey(0), dist_thresh=0.03
    )
    nvec = np.asarray(coeffs[:3])
    assert abs(abs(nvec[2]) - 1.0) < 0.01
    assert float(score) > 900


def test_ransac_weighted_prefers_confident(rng):
    """With confidence weights, the weighted score must pick the plane
    supported by high-confidence points (pcl_custom WeightedSACModelPlane)."""
    n = 600
    a = np.zeros((n, 3), np.float32)
    a[:, :2] = rng.uniform(-2, 2, size=(n, 2))
    a[:, 2] = 1.0  # plane A: z=1, low confidence
    b = np.zeros((n // 2, 3), np.float32)
    b[:, :2] = rng.uniform(-2, 2, size=(n // 2, 2))
    b[:, 2] = 3.0  # plane B: z=3, half the points, high confidence
    pts = jnp.asarray(np.concatenate([a, b]))
    valid = jnp.ones(pts.shape[0], bool)
    w = jnp.asarray(np.concatenate([np.full(n, 0.1), np.full(n // 2, 1.0)]),
                    jnp.float32)
    coeffs, mask, score = ransac_plane(pts, valid, w, jax.random.PRNGKey(1))
    d = float(plane_mod.plane_distance(coeffs))
    assert abs(abs(d) - 3.0) < 0.05


def test_extract_multiple_planes(rng):
    n = 800
    clouds = []
    for z in (1.0, 2.0, 3.5):
        p = np.zeros((n, 3), np.float32)
        p[:, :2] = rng.uniform(-2, 2, size=(n, 2))
        p[:, 2] = z + rng.normal(size=n) * 0.004
        clouds.append(p)
    pts = jnp.asarray(np.concatenate(clouds))
    valid = jnp.ones(pts.shape[0], bool)
    w = jnp.ones(pts.shape[0], jnp.float32)
    coeffs, pvalid, assign = extract_planes(
        pts, valid, w, jax.random.PRNGKey(2), n_planes=4, dist_thresh=0.03,
        min_inliers=300.0,
    )
    found = np.sort(np.abs(np.asarray(coeffs[np.asarray(pvalid), 3])))
    assert np.asarray(pvalid).sum() == 3
    np.testing.assert_allclose(found, [1.0, 2.0, 3.5], atol=0.03)


def test_backproject_depth_roundtrip():
    scene = SyntheticScene(h=120, w=160)
    T_wc = jnp.asarray(scene.trajectory(1)[0])
    gray, depth, sem = render(T_wc, scene.planes, scene.cam_K, 120, 160)
    pts, valid, rc = backproject_depth(depth, scene.cam_K, stride=2)
    pts_w = lie.se3_apply(T_wc, pts)
    # every valid point must lie on one of the room planes
    d = jnp.einsum("pi,ni->np", scene.planes.coeffs[:, :3], pts_w) + \
        scene.planes.coeffs[None, :, 3]
    min_d = np.asarray(jnp.min(jnp.abs(d), axis=-1))[np.asarray(valid)]
    assert np.percentile(min_d, 95) < 0.01


def test_detect_planes_and_semantics():
    scene = SyntheticScene(h=240, w=320)
    T_wc = jnp.asarray(scene.trajectory(1)[0])
    gray, depth, sem = render(T_wc, scene.planes, scene.cam_K, 240, 320)
    T_cw = lie.se3_inverse(T_wc)
    (coeffs_w, valid, centroid, npts, votes, local, _quad,
     _vox) = detect_planes_from_depth(
        depth, sem, T_cw, scene.cam_K, jax.random.PRNGKey(0)
    )
    assert int(valid.sum()) >= 2
    # each detected plane matches a GT room plane and its majority class
    gt = np.asarray(scene.planes.coeffs)
    gt_sem = np.asarray(scene.planes.semantic)
    for i in range(coeffs_w.shape[0]):
        if not bool(valid[i]):
            continue
        c = np.asarray(coeffs_w[i])
        errs = [
            min(np.abs(c - g).max(), np.abs(c + g).max()) for g in gt
        ]
        j = int(np.argmin(errs))
        assert errs[j] < 0.05, (c, gt[j])
        cls = int(np.argmax(np.asarray(votes[i])))
        assert cls == gt_sem[j]


def test_associate_accumulates_votes():
    sg = empty_scenegraph()
    det_c = jnp.zeros((4, 4), jnp.float32).at[0].set(
        jnp.asarray([0.0, 0.0, 1.0, -2.0])
    )
    det_valid = jnp.asarray([True, False, False, False])
    centroid = jnp.zeros((4, 3), jnp.float32).at[0].set(
        jnp.asarray([0.0, 0.0, 2.0])
    )
    npts = jnp.asarray([500.0, 0, 0, 0])
    votes = jnp.zeros((4, 3), jnp.float32).at[0, GROUND].set(1.0)
    local = det_c
    for k in range(4):
        sg = associate_and_update(
            sg, det_c, det_valid, centroid, npts, votes, local,
            jnp.asarray(k, jnp.int32),
        )
    assert int(sg.n_planes) == 1  # re-associated, not duplicated
    assert int(sg.pl_nobs[0]) == 4
    sem = plane_semantics(sg, min_votes=3.0)
    assert int(sem[0]) == GROUND
    assert int(sg.n_obs) == 4  # observation log for plane-KF factors


def test_room_detection_from_walls():
    """Four GT walls of the synthetic room -> one 4-wall room candidate."""
    scene = SyntheticScene()
    sg = empty_scenegraph()
    gt = np.asarray(scene.planes.coeffs)
    sems = np.asarray(scene.planes.semantic)
    centroids = {
        2: [-2.5, 0, 2.0], 3: [2.5, 0, 2.0], 4: [0, 0, 7.0], 5: [0, 0, -3.0]
    }
    n = 0
    for i in range(len(gt)):
        if sems[i] != 1:  # walls only
            continue
        sg = sg._replace(
            pl_coeffs=sg.pl_coeffs.at[n].set(jnp.asarray(gt[i])),
            pl_valid=sg.pl_valid.at[n].set(True),
            pl_centroid=sg.pl_centroid.at[n].set(jnp.asarray(centroids[i],
                                                             jnp.float32)),
            pl_npts=sg.pl_npts.at[n].set(1000.0),
            pl_votes=sg.pl_votes.at[n, WALL].set(10.0),
            n_planes=sg.n_planes + 1,
        )
        n += 1
    sg = detect_rooms(sg)
    assert int(sg.n_rooms) == 1
    assert not bool(sg.room_is_corridor[0])
    center = np.asarray(sg.room_center[0])
    np.testing.assert_allclose(center[0], 0.0, atol=0.3)
    np.testing.assert_allclose(center[2], 2.0, atol=0.8)


def test_corridor_from_two_walls():
    sg = empty_scenegraph()
    walls = [
        ([1.0, 0, 0, 2.0], [-2.0, 0, 1.0]),
        ([-1.0, 0, 0, 2.0], [2.0, 0, 1.0]),
    ]
    for i, (c, cen) in enumerate(walls):
        sg = sg._replace(
            pl_coeffs=sg.pl_coeffs.at[i].set(jnp.asarray(c, jnp.float32)),
            pl_valid=sg.pl_valid.at[i].set(True),
            pl_centroid=sg.pl_centroid.at[i].set(jnp.asarray(cen, jnp.float32)),
            pl_npts=sg.pl_npts.at[i].set(800.0),
            pl_votes=sg.pl_votes.at[i, WALL].set(10.0),
            n_planes=sg.n_planes + 1,
        )
    sg = detect_rooms(sg)
    assert int(sg.n_rooms) == 1
    assert bool(sg.room_is_corridor[0])
    np.testing.assert_allclose(np.asarray(sg.room_center[0])[0], 0.0,
                               atol=0.1)


def _mini_slam_problem(rng, noise=0.02):
    """Small KF/point/plane problem with known GT for joint-BA tests."""
    from visual_sgraphs_tpu.config import CapacityConfig, OrbConfig
    from visual_sgraphs_tpu.slam.map_state import empty_map

    K_, N_, F_ = 6, 200, 64
    m = empty_map(CapacityConfig(max_keyframes=16, max_points=512),
                  OrbConfig(n_features=F_))
    cam_K = jnp.asarray([260.0, 260.0, 160.0, 120.0], jnp.float32)
    # GT: points on the floor plane y=+1.6 and a wall x=-2.5, plus free pts
    pts = rng.uniform(-2, 2, size=(N_, 3)).astype(np.float32) + [0, 0, 3]
    pts[:70, 1] = 1.6          # floor members
    pts[70:140, 0] = -2.5      # wall members
    gt_pts = jnp.asarray(pts)
    poses = []
    for k in range(K_):
        xi = np.zeros(6, np.float32)
        xi[3] = 0.25 * k  # translate x
        poses.append(lie.se3_exp(jnp.asarray(xi)))
    gt_pose = jnp.stack(poses)

    # observations: every KF sees every point (uv from GT)
    obs = jnp.tile(jnp.arange(F_, dtype=jnp.int32)[None], (K_, 1))
    # each KF observes points k*F..k*F+F mod N
    obs = (obs + jnp.arange(K_, dtype=jnp.int32)[:, None] * 29) % N_
    uv_all, d_all = [], []
    for k in range(K_):
        p_cam = lie.se3_apply(gt_pose[k], gt_pts[obs[k]])
        from visual_sgraphs_tpu.core import cameras
        uv = cameras.project_pinhole(cam_K, p_cam)
        uv_all.append(uv + rng.normal(size=uv.shape).astype(np.float32) * 0.3)
        d_all.append(p_cam[:, 2])
    uv_all = jnp.stack(uv_all)
    d_all = jnp.stack(d_all)

    # noisy initial state
    noisy_pose = []
    for k in range(K_):
        pert = lie.se3_exp(jnp.asarray(
            rng.normal(size=6).astype(np.float32) * (0 if k == 0 else noise)
        ))
        noisy_pose.append(lie.se3_normalize(
            lie.se3_multiply(pert, gt_pose[k])))
    noisy_pts = gt_pts + jnp.asarray(
        rng.normal(size=(N_, 3)).astype(np.float32) * noise
    )
    m = m._replace(
        kf_pose=m.kf_pose.at[:K_].set(jnp.stack(noisy_pose)),
        kf_valid=m.kf_valid.at[:K_].set(True),
        kf_uv=m.kf_uv.at[:K_].set(uv_all),
        kf_depth=m.kf_depth.at[:K_].set(d_all),
        kf_kp_valid=m.kf_kp_valid.at[:K_].set(True),
        kf_obs_pt=m.kf_obs_pt.at[:K_].set(obs),
        pt_pos=m.pt_pos.at[:N_].set(noisy_pts),
        pt_valid=m.pt_valid.at[:N_].set(True),
        n_kf=jnp.asarray(K_, jnp.int32),
        n_pt=jnp.asarray(N_, jnp.int32),
    )
    return m, gt_pose, gt_pts, cam_K


def test_plane_factors_reduce_error(rng):
    """Joint BA with plane-KF + Gij quadric factors beats plane-free LBA on
    keyframe pose error (the Optimizer.cc:2049-2260 semantics gate)."""
    from visual_sgraphs_tpu.config import SceneGraphConfig
    from visual_sgraphs_tpu.core import plane as plane_mod
    from visual_sgraphs_tpu.scenegraph.joint_ba import scenegraph_local_ba
    from visual_sgraphs_tpu.slam import mapping

    m, gt_pose, gt_pts, cam_K = _mini_slam_problem(rng, noise=0.03)
    K_ = 6
    cam_bf = jnp.asarray(20.8, jnp.float32)

    # scene graph: two GT planes observed by every KF, with exact local
    # equations and quadrics accumulated from the true member points
    sg = empty_scenegraph()
    planes_w = jnp.asarray([[0.0, -1.0, 0.0, 1.6], [1.0, 0.0, 0.0, 2.5]],
                           jnp.float32)
    members = [np.arange(70), np.arange(70, 140)]
    sg = sg._replace(
        pl_coeffs=sg.pl_coeffs.at[:2].set(planes_w),
        pl_valid=sg.pl_valid.at[:2].set(True),
        pl_centroid=sg.pl_centroid.at[0].set(
            jnp.mean(gt_pts[:70], axis=0)
        ).at[1].set(jnp.mean(gt_pts[70:140], axis=0)),
        pl_npts=sg.pl_npts.at[:2].set(70.0),
        n_planes=jnp.asarray(2, jnp.int32),
    )
    q = 0
    for k in range(K_):
        for p in range(2):
            pi_local = plane_mod.transform(gt_pose[k], planes_w[p])
            mem = lie.se3_apply(gt_pose[k], gt_pts[jnp.asarray(members[p])])
            ph = jnp.concatenate(
                [mem, jnp.ones((mem.shape[0], 1), jnp.float32)], axis=1
            )
            G = (ph.T @ ph) / mem.shape[0]
            sg = sg._replace(
                ob_kf=sg.ob_kf.at[q].set(k),
                ob_plane=sg.ob_plane.at[q].set(p),
                ob_coeffs=sg.ob_coeffs.at[q].set(pi_local),
                ob_conf=sg.ob_conf.at[q].set(1.0),
                ob_quadric=sg.ob_quadric.at[q].set(G),
                ob_valid=sg.ob_valid.at[q].set(True),
                n_obs=sg.n_obs + 1,
            )
            q += 1

    def pose_err(kf_pose):
        errs = []
        for k in range(1, K_):
            d = lie.se3_log(lie.se3_multiply(
                kf_pose[k], lie.se3_inverse(gt_pose[k])))
            errs.append(float(jnp.linalg.norm(d)))
        return float(np.mean(errs))

    kf_id = jnp.asarray(K_ - 1, jnp.int32)
    m_plain, _ = mapping.local_ba(m, kf_id, cam_K, cam_bf, n_window=8,
                                  iters=10)
    cfg = SceneGraphConfig(plane_kf_factor=True, plane_point_factor=True,
                           plane_map_point_factor=True)
    m_sg, sg_out, _ = scenegraph_local_ba(
        m, sg, kf_id, cam_K, cam_bf, n_window=8, iters=10, config=cfg,
    )
    e_plain = pose_err(m_plain.kf_pose)
    e_sg = pose_err(m_sg.kf_pose)
    e0 = pose_err(m.kf_pose)
    assert e_sg < e0, "joint BA made poses worse than the initialization"
    assert e_sg <= e_plain * 1.05, (
        f"plane factors did not help: plain={e_plain:.5f} sg={e_sg:.5f}"
    )
    # plane equations stay normalized and close to GT
    nrm = np.linalg.norm(np.asarray(sg_out.pl_coeffs[:2, :3]), axis=1)
    np.testing.assert_allclose(nrm, 1.0, atol=1e-4)


def test_room_and_door_factors_in_joint_ba(rng):
    """Room centers re-derive from walls and door keeps its room offset
    through the solve (EdgeVertex4Plane... / EdgeSE3DoorProjectSE3Room)."""
    from visual_sgraphs_tpu.config import SceneGraphConfig
    from visual_sgraphs_tpu.scenegraph.joint_ba import scenegraph_local_ba

    m, gt_pose, gt_pts, cam_K = _mini_slam_problem(rng, noise=0.0)
    sg = empty_scenegraph()
    # 4 GT walls of a box, room center at origin-ish
    walls = jnp.asarray([
        [1.0, 0, 0, 2.0], [-1.0, 0, 0, 2.0],
        [0, 0, 1.0, -1.0], [0, 0, -1.0, 5.0],
    ], jnp.float32)
    sg = sg._replace(
        pl_coeffs=sg.pl_coeffs.at[:4].set(walls),
        pl_valid=sg.pl_valid.at[:4].set(True),
        n_planes=jnp.asarray(4, jnp.int32),
        room_center=sg.room_center.at[0].set(
            jnp.asarray([0.5, 0.0, 1.5])  # off the true center (0, 0, 2)
        ),
        room_walls=sg.room_walls.at[0].set(jnp.asarray([0, 1, 2, 3])),
        room_valid=sg.room_valid.at[0].set(True),
        n_rooms=jnp.asarray(1, jnp.int32),
        door_pose=sg.door_pose.at[0, 4:7].set(jnp.asarray([2.0, 0.0, 2.0])),
        door_valid=sg.door_valid.at[0].set(True),
        n_doors=jnp.asarray(1, jnp.int32),
    )
    cfg = SceneGraphConfig(room_factor=True, door_factor=True,
                           plane_point_factor=False)
    m2, sg2, _ = scenegraph_local_ba(
        m, sg, jnp.asarray(5, jnp.int32), cam_K,
        jnp.asarray(20.8, jnp.float32), n_window=8, iters=10, config=cfg,
    )
    center = np.asarray(sg2.room_center[0])
    # true room center from the wall equations: x: mid of +-2 -> 0,
    # z: mid of 1 and 5 -> ~3 by the pairVec formula... assert it moved
    # toward the wall-derived point and the door kept its relative offset
    d0 = np.asarray(sg.door_pose[0, 4:7]) - np.asarray(sg.room_center[0])
    d2 = np.asarray(sg2.door_pose[0, 4:7]) - center
    np.testing.assert_allclose(d2, d0, atol=0.05)


def test_multi_room_detection():
    """Two adjacent rooms' walls -> two 4-wall room candidates with the
    right wall sets (multi-candidate detectMapRoomCandidate)."""
    from visual_sgraphs_tpu.scenegraph.manager import detect_rooms

    sg = empty_scenegraph()
    # room A: x in [-2, 2], z in [0, 4]; room B: x in [-2, 2], z in [5, 9]
    walls = [
        ([1.0, 0, 0, 2.0], [-2, 0, 2.0]),    # A left
        ([-1.0, 0, 0, 2.0], [2, 0, 2.0]),    # A right
        ([0, 0, 1.0, 0.0], [0, 0, 0.0]),     # A front
        ([0, 0, -1.0, 4.0], [0, 0, 4.0]),    # A back
        ([1.0, 0, 0, 2.0], [-2, 0, 7.0]),    # B left
        ([-1.0, 0, 0, 2.0], [2, 0, 7.0]),    # B right
        ([0, 0, 1.0, -5.0], [0, 0, 5.0]),    # B front
        ([0, 0, -1.0, 9.0], [0, 0, 9.0]),    # B back
    ]
    for i, (c, cen) in enumerate(walls):
        sg = sg._replace(
            pl_coeffs=sg.pl_coeffs.at[i].set(jnp.asarray(c, jnp.float32)),
            pl_valid=sg.pl_valid.at[i].set(True),
            pl_centroid=sg.pl_centroid.at[i].set(
                jnp.asarray(cen, jnp.float32)
            ),
            pl_npts=sg.pl_npts.at[i].set(800.0),
            pl_votes=sg.pl_votes.at[i, WALL].set(10.0),
            n_planes=sg.n_planes + 1,
        )
    sg = detect_rooms(sg, max_gap=4.5)
    assert int(sg.n_rooms) >= 2, f"only {int(sg.n_rooms)} rooms found"
    centers = np.asarray(sg.room_center)[np.asarray(sg.room_valid)]
    zs = sorted(c[2] for c in centers[:2])
    assert abs(zs[0] - 2.0) < 1.2 and abs(zs[1] - 7.0) < 1.2, centers


def test_filter_semantic_planes():
    """Tilted 'wall' and elevated 'ground' lose their semantics against the
    dominant ground reference (SemanticsManager.cc:65-113)."""
    from visual_sgraphs_tpu.scenegraph.manager import filter_semantic_planes
    from visual_sgraphs_tpu.scenegraph.state import plane_semantics

    sg = empty_scenegraph()
    rows = [
        # big true ground (y up normal), at y=0
        ([0, -1.0, 0, 0.0], [0, 0, 2], 2000.0, GROUND),
        # proper wall (vertical)
        ([1.0, 0, 0, 2.0], [-2, 0, 2], 800.0, WALL),
        # tilted fake wall (45 deg)
        ([0.7071, -0.7071, 0, 1.0], [1, 1, 2], 500.0, WALL),
        # elevated fake ground (1.5 m above)
        ([0, -1.0, 0, 1.5], [0, -1.5, 2], 300.0, GROUND),
    ]
    for i, (c, cen, npts, cls) in enumerate(rows):
        sg = sg._replace(
            pl_coeffs=sg.pl_coeffs.at[i].set(jnp.asarray(c, jnp.float32)),
            pl_valid=sg.pl_valid.at[i].set(True),
            pl_centroid=sg.pl_centroid.at[i].set(
                jnp.asarray(cen, jnp.float32)
            ),
            pl_npts=sg.pl_npts.at[i].set(npts),
            pl_votes=sg.pl_votes.at[i, cls].set(10.0),
            n_planes=sg.n_planes + 1,
        )
    sg = filter_semantic_planes(sg)
    sem = np.asarray(plane_semantics(sg, 3.0))
    assert sem[0] == GROUND and sem[1] == WALL
    assert sem[2] == UNDEFINED, "tilted wall kept its label"
    assert sem[3] == UNDEFINED, "elevated ground kept its label"


def test_reassociate_merges_close_planes():
    from visual_sgraphs_tpu.scenegraph.manager import reassociate_planes

    sg = empty_scenegraph()
    for i, d in enumerate((2.0, 2.05)):
        sg = sg._replace(
            pl_coeffs=sg.pl_coeffs.at[i].set(
                jnp.asarray([1.0, 0, 0, d], jnp.float32)
            ),
            pl_valid=sg.pl_valid.at[i].set(True),
            pl_centroid=sg.pl_centroid.at[i].set(
                jnp.asarray([-d, 0, 2], jnp.float32)
            ),
            pl_npts=sg.pl_npts.at[i].set(500.0 if i == 0 else 100.0),
            pl_votes=sg.pl_votes.at[i, WALL].set(10.0),
            n_planes=sg.n_planes + 1,
        )
    # an observation pointing at the small plane must be re-pointed
    sg = sg._replace(
        ob_plane=sg.ob_plane.at[0].set(1),
        ob_valid=sg.ob_valid.at[0].set(True),
        n_obs=jnp.asarray(1, jnp.int32),
    )
    sg = reassociate_planes(sg)
    assert bool(sg.pl_valid[0]) and not bool(sg.pl_valid[1])
    assert int(sg.ob_plane[0]) == 0
    assert float(sg.pl_npts[0]) == 600.0


def test_plane_covis_bonus():
    """Two keyframes sharing a plane get a covisibility bonus even with
    zero shared map points (KeyFrame::UpdateConnections plane weighting,
    KeyFrame.cc:486-523); undefined planes count at 0.2x."""
    from visual_sgraphs_tpu.config import CapacityConfig
    from visual_sgraphs_tpu.scenegraph.manager import plane_covis_bonus
    from visual_sgraphs_tpu.scenegraph.state import WALL, empty_scenegraph

    sg = empty_scenegraph(CapacityConfig(max_planes=8), max_obs=64)
    # plane 0: semantic wall (enough votes), observed by KFs 0 and 3
    # plane 1: undefined, observed by KFs 0 and 5
    sg = sg._replace(
        pl_valid=sg.pl_valid.at[0].set(True).at[1].set(True),
        pl_votes=sg.pl_votes.at[0, WALL].set(5.0),
        ob_kf=sg.ob_kf.at[0].set(0).at[1].set(3).at[2].set(0).at[3].set(5),
        ob_plane=sg.ob_plane.at[0].set(0).at[1].set(0)
        .at[2].set(1).at[3].set(1),
        ob_valid=sg.ob_valid.at[:4].set(True),
    )
    bonus = np.asarray(plane_covis_bonus(
        sg, jnp.asarray(0, jnp.int32), 8, min_votes=3.0, score=10.0,
        undefined_factor=0.2,
    ))
    assert bonus[3] == 10.0        # shared semantic plane
    assert abs(bonus[5] - 2.0) < 1e-6   # shared undefined plane (0.2x)
    assert bonus[0] == 0.0         # self excluded
    assert bonus[1] == 0.0 and bonus[7] == 0.0


def test_refine_points_semantic_culls_behind_wall():
    """Points behind a settled semantic wall (opposite side from the
    camera, beyond the margin, within the plane's extent) are culled and
    unlinked; points in front of / on the wall survive
    (Optimizer.cc:1271-1336 semantic map-point refinement)."""
    from visual_sgraphs_tpu.config import CapacityConfig, OrbConfig
    from visual_sgraphs_tpu.core import lie as _lie
    from visual_sgraphs_tpu.scenegraph.manager import refine_points_semantic
    from visual_sgraphs_tpu.scenegraph.state import (
        WALL,
        empty_scenegraph,
        voxel_key,
        voxel_slot,
    )
    from visual_sgraphs_tpu.slam.map_state import empty_map

    m = empty_map(CapacityConfig(max_keyframes=4, max_points=64),
                  OrbConfig(n_features=8))
    # wall: plane z = 5 (normal -z, n.x + d = 0 -> [0,0,-1,5])
    cap = CapacityConfig(max_planes=4)
    sg = empty_scenegraph(cap, max_obs=16)
    # observed surface extent: x, y in [-2.5, 2.5] on the wall (the
    # membership voxels an observation of that patch would deposit)
    gx = np.arange(-2.5, 2.5, 0.15)
    surf = np.stack(np.meshgrid(gx, gx, indexing="ij"), -1).reshape(-1, 2)
    surf = jnp.asarray(
        np.concatenate([surf, np.full((len(surf), 1), 5.0)], 1),
        jnp.float32,
    )
    keys = voxel_key(surf)
    slots = voxel_slot(keys, cap.plane_vox_slots)
    sg = sg._replace(
        pl_valid=sg.pl_valid.at[0].set(True),
        pl_coeffs=sg.pl_coeffs.at[0].set(jnp.asarray([0, 0, -1.0, 5.0])),
        pl_centroid=sg.pl_centroid.at[0].set(jnp.asarray([0, 0, 5.0])),
        pl_votes=sg.pl_votes.at[0, WALL].set(5.0),
        pl_vox=sg.pl_vox.at[0, slots].set(keys),
    )
    pts = jnp.asarray([
        [0.0, 0.0, 3.0],   # in front of the wall       -> keep
        [0.0, 0.0, 4.95],  # on the wall (within margin) -> keep
        [0.0, 0.0, 6.0],   # BEHIND the wall             -> cull
        [9.0, 0.0, 6.0],   # behind but outside extent   -> keep
    ])
    m = m._replace(
        pt_pos=m.pt_pos.at[:4].set(pts),
        pt_valid=m.pt_valid.at[:4].set(True),
        kf_obs_pt=m.kf_obs_pt.at[0, :4].set(jnp.arange(4, dtype=jnp.int32)),
        kf_valid=m.kf_valid.at[0].set(True),
        n_kf=jnp.asarray(1, jnp.int32),
    )
    T_cw = _lie.se3_identity()  # camera at origin, z forward
    m2 = refine_points_semantic(m, sg, T_cw, behind_thresh=0.15,
                                lateral_radius=2.5)
    valid = np.asarray(m2.pt_valid[:4])
    assert valid.tolist() == [True, True, False, True]
    assert int(m2.kf_obs_pt[0, 2]) == -1  # unlinked from the keyframe
    assert int(m2.pt_freed_seq[2]) == 1  # quarantined for reuse
