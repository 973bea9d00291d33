"""PnP RANSAC: camera pose from 3D-2D matches without a prior pose.

TPU-native replacement for PnPsolver (reference: src/PnPsolver.cc — EPnP
control-point parametrization inside a sequential RANSAC loop with
Gauss-Newton beta refinement, used by Tracking::Relocalization
Tracking.cc:2615). Here: [S] 6-point DLT pose hypotheses solved as one
batched eigh, batched reprojection scoring, inlier refit — then the caller
polishes with the LM pose optimizer (optim/pose_opt.py), which subsumes
EPnP's Gauss-Newton stage. (DLT needs ≥6 non-coplanar points; for the
SLAM relocalization use-case the local map is 3D-rich, matching the
reference's operating envelope.)
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from gf_orb_slam2_tpu.utils.precision import einsum


class PnPResult(NamedTuple):
    ok: jnp.ndarray
    R: jnp.ndarray
    t: jnp.ndarray
    inliers: jnp.ndarray
    n_inliers: jnp.ndarray


def _dlt_pose(Xw, uv_n):
    """[6,3] world points + [6,2] NORMALIZED image coords → (R, t).

    Solves for P = [R|t] up to scale via the 2n×12 DLT system, then projects
    onto SO(3) (SVD) and fixes scale/sign by cheirality.
    """
    x, y, z = Xw[:, 0], Xw[:, 1], Xw[:, 2]
    u, v = uv_n[:, 0], uv_n[:, 1]
    o = jnp.ones_like(x)
    zr = jnp.zeros_like(x)
    r1 = jnp.stack([x, y, z, o, zr, zr, zr, zr, -u * x, -u * y, -u * z, -u], -1)
    r2 = jnp.stack([zr, zr, zr, zr, x, y, z, o, -v * x, -v * y, -v * z, -v], -1)
    A = jnp.concatenate([r1, r2], 0)  # [12,12]
    AtA = einsum("ki,kj->ij", A, A)
    _, vecs = jnp.linalg.eigh(AtA)
    p = vecs[:, 0]
    P = jnp.stack([p[0:4], p[4:8], p[8:12]], 0)  # [3,4]
    M = P[:, :3]
    # scale & sign: mean depth of the points should be positive
    scale = jnp.cbrt(jnp.abs(jnp.linalg.det(M)) + 1e-12)
    M = M / jnp.where(scale < 1e-9, 1e-9, scale)
    t = P[:, 3] / jnp.where(scale < 1e-9, 1e-9, scale)
    depth_sign = jnp.sign(jnp.sum((Xw @ M.T + t)[:, 2]))
    M = M * depth_sign
    t = t * depth_sign
    # project to SO(3)
    U, _, Vt = jnp.linalg.svd(M)
    R = U @ Vt
    R = R * jnp.sign(jnp.linalg.det(R))
    return R, t


def pnp_ransac(
    Xw, uv, valid, fx, fy, cx, cy, key,
    n_hyp: int = 256, th_px: float = 5.0, min_inliers: int = 12,
):
    """Xw [N,3] world points matched to pixels uv [N,2]; valid [N]."""
    N = Xw.shape[0]
    uv_n = jnp.stack([(uv[:, 0] - cx) / fx, (uv[:, 1] - cy) / fy], -1)
    idx_valid = jnp.argsort(~valid)
    n_valid = jnp.sum(valid)
    draws = jax.random.randint(key, (n_hyp, 6), 0, jnp.maximum(n_valid, 6))
    samples = idx_valid[draws]

    Rs, ts = jax.vmap(lambda s: _dlt_pose(Xw[s], uv_n[s]))(samples)

    def score(R, t):
        pc = Xw @ R.T + t
        z = jnp.maximum(pc[:, 2], 1e-6)
        u = fx * pc[:, 0] / z + cx
        v = fy * pc[:, 1] / z + cy
        e2 = (u - uv[:, 0]) ** 2 + (v - uv[:, 1]) ** 2
        return valid & (e2 < th_px * th_px) & (pc[:, 2] > 0)

    inls = jax.vmap(score)(Rs, ts)
    votes = jnp.sum(inls, -1)
    best = jnp.argmax(votes)
    # weighted DLT refit on the winning inliers (all points, masked)
    w = inls[best].astype(Xw.dtype)

    def refit(w):
        x, y, z = Xw[:, 0], Xw[:, 1], Xw[:, 2]
        u, v = uv_n[:, 0], uv_n[:, 1]
        o = jnp.ones_like(x)
        zr = jnp.zeros_like(x)
        r1 = jnp.stack([x, y, z, o, zr, zr, zr, zr, -u * x, -u * y, -u * z, -u], -1) * w[:, None]
        r2 = jnp.stack([zr, zr, zr, zr, x, y, z, o, -v * x, -v * y, -v * z, -v], -1) * w[:, None]
        A = jnp.concatenate([r1, r2], 0)
        AtA = einsum("ki,kj->ij", A, A)
        _, vecs = jnp.linalg.eigh(AtA)
        p = vecs[:, 0]
        P = jnp.stack([p[0:4], p[4:8], p[8:12]], 0)
        M = P[:, :3]
        scale = jnp.cbrt(jnp.abs(jnp.linalg.det(M)) + 1e-12)
        M = M / jnp.where(scale < 1e-9, 1e-9, scale)
        t = P[:, 3] / jnp.where(scale < 1e-9, 1e-9, scale)
        sgn = jnp.sign(jnp.sum(((Xw @ M.T + t)[:, 2]) * w))
        M = M * sgn
        t = t * sgn
        U, _, Vt = jnp.linalg.svd(M)
        R = U @ Vt
        R = R * jnp.sign(jnp.linalg.det(R))
        return R, t

    R_f, t_f = refit(w)
    inl_f = score(R_f, t_f)
    better = jnp.sum(inl_f) >= votes[best]
    R_out = jnp.where(better, R_f, Rs[best])
    t_out = jnp.where(better, t_f, ts[best])
    inl_out = jnp.where(better, inl_f, inls[best])
    n_out = jnp.sum(inl_out)
    return PnPResult(ok=n_out >= min_inliers, R=R_out, t=t_out,
                     inliers=inl_out, n_inliers=n_out)
