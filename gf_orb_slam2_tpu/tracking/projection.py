"""Device-side map-point projection & visibility (frustum) checks.

Replaces Frame::isInFrustum (reference: src/Frame.cc:535) and
MapPoint::PredictScale (src/MapPoint.cc:542) with one batched program over
the whole candidate set: project, bounds-check, distance-range check, viewing
angle check, predicted pyramid level — all masked arrays.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from gf_orb_slam2_tpu.utils.precision import einsum

from gf_orb_slam2_tpu.geometry import lie


class ProjectedPoints(NamedTuple):
    uv: jnp.ndarray           # [P,2] pixel coords
    z: jnp.ndarray            # [P] camera depth
    pred_octave: jnp.ndarray  # [P] int32 predicted pyramid level
    visible: jnp.ndarray      # [P] bool frustum+range+angle mask
    view_cos: jnp.ndarray     # [P]


def project_points(
    R, t, pos, normal, min_dist, max_dist, valid,
    fx, fy, cx, cy, width, height,
    n_levels: int, log_scale: float,
    min_view_cos: float = 0.5, border: float = 0.0,
):
    """pos [P,3] world → ProjectedPoints under pose (R,t).

    min_view_cos: reference uses 0.5 both in SearchLocalPoints and isInFrustum.
    """
    pc = lie.transform(R, t, pos)
    z = pc[..., 2]
    zs = jnp.where(jnp.abs(z) < 1e-8, 1e-8, z)
    u = fx * pc[..., 0] / zs + cx
    v = fy * pc[..., 1] / zs + cy
    in_img = (
        (u >= border) & (u < width - border) & (v >= border) & (v < height - border)
    )
    # distance from camera center in world frame
    center = -einsum("ji,j->i", R, t)
    pv = pos - center
    dist = jnp.linalg.norm(pv, axis=-1)
    range_ok = (dist >= 0.8 * min_dist) & (dist <= 1.2 * max_dist)
    vcos = jnp.sum(pv * normal, -1) / jnp.maximum(dist * jnp.linalg.norm(normal, axis=-1), 1e-9)
    angle_ok = vcos > min_view_cos
    # PredictScale: level = ceil(log(max_dist/dist)/log(scale))
    ratio = jnp.maximum(max_dist / jnp.maximum(dist, 1e-9), 1.0)
    lvl = jnp.ceil(jnp.log(ratio) / log_scale).astype(jnp.int32)
    lvl = jnp.clip(lvl, 0, n_levels - 1)
    vis = valid & (z > 0) & in_img & range_ok & angle_ok
    return ProjectedPoints(jnp.stack([u, v], -1), z, lvl, vis, vcos)
