"""Camera projection / distortion / stereo rectification.

Replaces the reference's OpenCV-based calib path: cv::undistortPoints in
Frame::UndistortKeyPoints (reference: src/Frame.cc:670 UndistortKeyPointsStereo,
src/Tracking.cc:138-207 stereo LEFT/RIGHT K-D-R-P rectification) and the
fisheye branch (reference: include/Frame.h:43 USE_FISHEYE_DISTORTION).
Everything is batched and jittable; undistortion is a fixed-iteration Newton
scheme (no data-dependent loops under jit).
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from gf_orb_slam2_tpu.utils.precision import einsum
import numpy as np


class PinholeCamera(NamedTuple):
    """Static camera parameters as device arrays (reference: Util.hpp:134)."""

    fx: jnp.ndarray
    fy: jnp.ndarray
    cx: jnp.ndarray
    cy: jnp.ndarray
    dist: jnp.ndarray  # [5] k1 k2 p1 p2 k3
    width: int
    height: int
    fisheye: bool = False

    @staticmethod
    def from_config(cam) -> "PinholeCamera":
        return PinholeCamera(
            fx=jnp.float32(cam.fx),
            fy=jnp.float32(cam.fy),
            cx=jnp.float32(cam.cx),
            cy=jnp.float32(cam.cy),
            dist=jnp.asarray(cam.dist, jnp.float32),
            width=cam.width,
            height=cam.height,
            fisheye=cam.fisheye,
        )

    def K(self):
        return jnp.array(
            [[self.fx, 0.0, self.cx], [0.0, self.fy, self.cy], [0.0, 0.0, 1.0]],
            jnp.float32,
        )


def distort_radtan(xn, dist):
    """Normalized coords [..,2] → distorted normalized coords (rad-tan model)."""
    k1, k2, p1, p2, k3 = dist[0], dist[1], dist[2], dist[3], dist[4]
    x, y = xn[..., 0], xn[..., 1]
    r2 = x * x + y * y
    radial = 1.0 + r2 * (k1 + r2 * (k2 + r2 * k3))
    xd = x * radial + 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
    yd = y * radial + p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
    return jnp.stack([xd, yd], -1)


def distort_fisheye(xn, dist):
    """Equidistant (KB4) fisheye distortion; dist[:4] = k1..k4."""
    x, y = xn[..., 0], xn[..., 1]
    r = jnp.sqrt(jnp.maximum(x * x + y * y, 1e-12))
    theta = jnp.arctan(r)
    t2 = theta * theta
    theta_d = theta * (1.0 + t2 * (dist[0] + t2 * (dist[1] + t2 * (dist[2] + t2 * dist[3]))))
    scale = theta_d / r
    return jnp.stack([x * scale, y * scale], -1)


def undistort_normalized(xd, dist, fisheye=False, iters=8):
    """Invert distortion with fixed-point/Newton iterations (jit-safe).

    Mirrors cv::undistortPoints' iterative scheme at fixed iteration count.
    """
    distort = distort_fisheye if fisheye else distort_radtan
    x = xd
    for _ in range(iters):
        d = distort(x, dist) - x
        x = xd - d
    return x


def project(cam: PinholeCamera, pc, apply_distortion=False):
    """Camera-frame points [..,3] → pixel coords [..,2] (+ depth).

    Returns (uv, z). Frustum validity is the caller's mask: z > 0 and in-bounds.
    """
    z = pc[..., 2]
    inv_z = 1.0 / jnp.where(jnp.abs(z) < 1e-8, 1e-8, z)
    xn = pc[..., :2] * inv_z[..., None]
    if apply_distortion:
        xn = (distort_fisheye if cam.fisheye else distort_radtan)(xn, cam.dist)
    u = cam.fx * xn[..., 0] + cam.cx
    v = cam.fy * xn[..., 1] + cam.cy
    return jnp.stack([u, v], -1), z


def backproject(cam: PinholeCamera, uv, z):
    """Pixels [..,2] + depth → camera-frame 3D (undistorted pinhole)."""
    x = (uv[..., 0] - cam.cx) / cam.fx
    y = (uv[..., 1] - cam.cy) / cam.fy
    return jnp.stack([x * z, y * z, z], -1)


def undistort_keypoints(cam: PinholeCamera, uv):
    """Distorted pixel keypoints → undistorted pixel coords (same K).

    Reference: Frame::UndistortKeyPoints (src/Frame.cc:~630).
    """
    xn = jnp.stack(
        [(uv[..., 0] - cam.cx) / cam.fx, (uv[..., 1] - cam.cy) / cam.fy], -1
    )
    xu = undistort_normalized(xn, cam.dist, cam.fisheye)
    return jnp.stack([xu[..., 0] * cam.fx + cam.cx, xu[..., 1] * cam.fy + cam.cy], -1)


class RectifyMap(NamedTuple):
    """Keypoint-level stereo rectification (reference: src/Frame.cc:670
    UndistortKeyPointsStereo applies per-camera K,D,R,P to raw keypoints).

    K: raw intrinsics [3,3]; D: [5]; R: rectifying rotation [3,3];
    P: rectified projection [3,4].
    """

    K: jnp.ndarray
    D: jnp.ndarray
    R: jnp.ndarray
    P: jnp.ndarray
    fisheye: bool = False

    @staticmethod
    def from_np(K, D, R, P, fisheye=False) -> "RectifyMap":
        D5 = np.zeros(5, np.float32)
        D = np.asarray(D, np.float32).ravel()
        D5[: min(5, D.size)] = D[:5]
        return RectifyMap(
            K=jnp.asarray(K, jnp.float32),
            D=jnp.asarray(D5),
            R=jnp.asarray(R, jnp.float32),
            P=jnp.asarray(P, jnp.float32),
            fisheye=fisheye,
        )


def rectify_keypoints(rm: RectifyMap, uv):
    """Raw distorted pixels → rectified pixels under (K,D,R,P)."""
    xn = jnp.stack(
        [
            (uv[..., 0] - rm.K[0, 2]) / rm.K[0, 0],
            (uv[..., 1] - rm.K[1, 2]) / rm.K[1, 1],
        ],
        -1,
    )
    xu = undistort_normalized(xn, rm.D, rm.fisheye)
    rays = jnp.concatenate([xu, jnp.ones_like(xu[..., :1])], -1)
    rot = einsum("ij,...j->...i", rm.R, rays)
    xr = rot[..., :2] / jnp.maximum(rot[..., 2:3], 1e-8)
    u = rm.P[0, 0] * xr[..., 0] + rm.P[0, 2]
    v = rm.P[1, 1] * xr[..., 1] + rm.P[1, 2]
    return jnp.stack([u, v], -1)


def stereo_unproject(cam: PinholeCamera, uv, disparity, bf):
    """Rectified keypoint + disparity → camera-frame 3D point.

    Reference: Frame::UnprojectStereo (src/Frame.cc:1629): z = bf / disparity.
    """
    z = bf / jnp.maximum(disparity, 1e-6)
    return backproject(cam, uv, z)
