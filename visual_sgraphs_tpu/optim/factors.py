"""Factor residual library for the graph engine.

Each function is a per-item residual ``f(values: tuple, const: dict) ->
(res_dim,)`` used by ``FactorBatch``; Jacobians come from forward-mode AD
through the family retractions.  Equivalents of the reference's hand-coded
g2o edges:

- ``reproj_mono/stereo``    <- EdgeSE3ProjectXYZ / EdgeStereoSE3ProjectXYZ
  (orb_slam3/include/OptimizableTypes.h:34-157)
- ``reproj_mono_pose_only`` <- the *OnlyPose variants used by
  PoseOptimization (Optimizer.cc:1063)
- ``relative_se3``          <- essential-graph / odometry edges
  (Optimizer.cc:2456 OptimizeEssentialGraph, on SE3 here; Sim3 variant below)
- ``relative_sim3``         <- EdgeSim3 (OptimizableTypes.h:159-231)
- ``pose_prior``            <- prior / fixed-lag anchors
- ``plane_kf``              <- EdgeVertexPlaneProjectSE3KF: (T_kf · pi_w) ⊖
  pi_meas in the minimal azimuth/elevation/distance chart
  (OptimizableTypes.h:336-374)
- ``point_on_plane``        <- EdgeVertexPlaneProjectPointXYZ
  (OptimizableTypes.h:379-399)
- ``plane_quadric``         <- EdgeSE3KFPointToPlane, the point-cloud-to-plane
  quadric factor e = piᵀ T G Tᵀ pi (OptimizableTypes.h:296-330)

Pose convention: keyframe poses are **T_cw** (world -> camera), matching the
reference throughout.
"""

from __future__ import annotations

import jax.numpy as jnp

from visual_sgraphs_tpu.core import cameras, lie, plane as plane_mod


# ----------------------------------------------------------- reprojection


def reproj_mono(values, const):
    """families: (kf_pose T_cw, point X_w); const: uv (2,), cam (4,)."""
    T_cw, X_w = values
    p_cam = lie.se3_apply(T_cw, X_w)
    uv_hat = cameras.project_pinhole(const["cam"], p_cam)
    return uv_hat - const["uv"]


def reproj_stereo(values, const):
    """families: (kf_pose, point); const: uv_ur (3,), cam (4,), bf ().

    Third coordinate is the right-image u of a rectified stereo pair:
    u_r = u - bf/z (same parameterization as the reference's stereo edges).
    """
    T_cw, X_w = values
    p_cam = lie.se3_apply(T_cw, X_w)
    uv_hat = cameras.project_pinhole(const["cam"], p_cam)
    z = jnp.maximum(p_cam[2], 1e-6)
    ur_hat = uv_hat[0] - const["bf"] / z
    return jnp.concatenate([uv_hat, ur_hat[None]]) - const["uv_ur"]


def reproj_mono_pose_only(values, const):
    """families: (kf_pose,); const: uv (2,), xw (3,), cam (4,).

    Motion-only variant: the landmark is a constant (PoseOptimization's
    EdgeSE3ProjectXYZOnlyPose)."""
    (T_cw,) = values
    p_cam = lie.se3_apply(T_cw, const["xw"])
    return cameras.project_pinhole(const["cam"], p_cam) - const["uv"]


def reproj_stereo_pose_only(values, const):
    """families: (kf_pose,); const: uv_ur (3,), xw (3,), cam (4,), bf ()."""
    (T_cw,) = values
    p_cam = lie.se3_apply(T_cw, const["xw"])
    uv_hat = cameras.project_pinhole(const["cam"], p_cam)
    z = jnp.maximum(p_cam[2], 1e-6)
    ur_hat = uv_hat[0] - const["bf"] / z
    return jnp.concatenate([uv_hat, ur_hat[None]]) - const["uv_ur"]


# ------------------------------------------------------------- pose graph


def pose_prior(values, const):
    """families: (pose,); const: T_meas (7,).  r = log(T · T_meas⁻¹)."""
    (T,) = values
    return lie.se3_log(lie.se3_multiply(T, lie.se3_inverse(const["T_meas"])))


def relative_se3(values, const):
    """families: (pose_i, pose_j) both T_cw; const: T_ji (7,) measured
    relative transform.  r = log(T_ji_meas⁻¹ · T_j · T_i⁻¹)."""
    T_i, T_j = values
    T_ji = lie.se3_multiply(T_j, lie.se3_inverse(T_i))
    return lie.se3_log(
        lie.se3_multiply(lie.se3_inverse(const["T_ji"]), T_ji)
    )


def relative_sim3(values, const):
    """families: (sim3_i, sim3_j); const: S_ji (8,).  The essential-graph
    edge of loop closing (OptimizeEssentialGraph operates on Sim3)."""
    S_i, S_j = values
    S_ji = lie.sim3_multiply(S_j, lie.sim3_inverse(S_i))
    return lie.sim3_log(
        lie.sim3_multiply(lie.sim3_inverse(const["S_ji"]), S_ji)
    )


# ----------------------------------------------------------------- planes


def plane_kf(values, const):
    """families: (kf_pose T_cw, plane_w (4,)); const: pi_obs (4,) local plane.

    r = (T_cw · pi_w) ⊖ pi_obs in the minimal chart — the plane-KF
    observation factor (OptimizableTypes.h:336-374)."""
    T_cw, pi_w = values
    pi_local = plane_mod.transform(T_cw, pi_w)
    return plane_mod.ominus(const["pi_obs"], pi_local)


def point_on_plane(values, const):
    """families: (plane_w, point X_w); const: none.  r = n·x + c."""
    pi_w, X_w = values
    return plane_mod.point_plane_distance(pi_w, X_w)[None]


def plane_quadric(values, const):
    """families: (kf_pose T_cw, plane_w); const: G (4,4) point quadric
    Σ w·p̃ p̃ᵀ of the keyframe's supporting cloud in the *camera* frame.

    chi2 equals the weighted sum of squared point-to-plane distances:
    e = piᵀ_local G pi_local with pi_local = T_cw · pi_w
    (EdgeSE3KFPointToPlane, OptimizableTypes.h:296-330).  Returned as
    sqrt(e) so the engine's squared norm reproduces e.
    """
    T_cw, pi_w = values
    pi_local = plane_mod.transform(T_cw, pi_w)
    e = pi_local @ const["G"] @ pi_local
    return jnp.sqrt(jnp.maximum(e, 1e-12))[None]
