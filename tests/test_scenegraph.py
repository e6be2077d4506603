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
from visual_sgraphs_tpu.scenegraph.state import empty_scenegraph, plane_semantics


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
    coeffs_w, valid, centroid, npts, votes, local = detect_planes_from_depth(
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
