"""Lie-group math: quaternions, SO(3), SE(3), Sim(3).

Replaces the reference's scattered pose math (cv::Mat 4x4 everywhere +
Converter.cc cv↔Eigen↔g2o conversions + g2o SE3Quat/Sim3 types,
reference: src/Converter.cc:26-150, Thirdparty/g2o/g2o/types/{se3quat.h,sim3.h})
with one batched, jittable module. Conventions:

- Quaternions are Hamilton, [w, x, y, z], unit norm.
- Poses are world→camera transforms Tcw stored as (R [..,3,3], t [..,3]) pairs
  or 4x4 homogeneous matrices; helpers convert between them.
- All functions broadcast over leading batch dims and are vmap/jit safe.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from gf_orb_slam2_tpu.utils.precision import einsum, matmul

_EPS = 1e-8


# ---------------------------------------------------------------- quaternions
def quat_normalize(q):
    return q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), _EPS)


def quat_mul(q1, q2):
    w1, x1, y1, z1 = jnp.moveaxis(q1, -1, 0)
    w2, x2, y2, z2 = jnp.moveaxis(q2, -1, 0)
    return jnp.stack(
        [
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        ],
        axis=-1,
    )


def quat_conj(q):
    return q * jnp.array([1.0, -1.0, -1.0, -1.0], q.dtype)


def quat_to_rot(q):
    """Unit quaternion [w,x,y,z] → rotation matrix [..,3,3]."""
    q = quat_normalize(q)
    w, x, y, z = jnp.moveaxis(q, -1, 0)
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    R = jnp.stack(
        [
            jnp.stack([1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy)], -1),
            jnp.stack([2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx)], -1),
            jnp.stack([2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy)], -1),
        ],
        axis=-2,
    )
    return R


def rot_to_quat(R):
    """Rotation matrix → unit quaternion [w,x,y,z]; branchless (Shepperd)."""
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22
    # four candidate constructions, pick numerically best by largest pivot
    qw = jnp.stack(
        [
            1.0 + tr,
            1.0 + m00 - m11 - m22,
            1.0 - m00 + m11 - m22,
            1.0 - m00 - m11 + m22,
        ],
        -1,
    )
    qw = jnp.sqrt(jnp.maximum(qw, _EPS)) * 0.5
    c0 = jnp.stack([qw[..., 0], (m21 - m12) / (4 * qw[..., 0]), (m02 - m20) / (4 * qw[..., 0]), (m10 - m01) / (4 * qw[..., 0])], -1)
    c1 = jnp.stack([(m21 - m12) / (4 * qw[..., 1]), qw[..., 1], (m01 + m10) / (4 * qw[..., 1]), (m02 + m20) / (4 * qw[..., 1])], -1)
    c2 = jnp.stack([(m02 - m20) / (4 * qw[..., 2]), (m01 + m10) / (4 * qw[..., 2]), qw[..., 2], (m12 + m21) / (4 * qw[..., 2])], -1)
    c3 = jnp.stack([(m10 - m01) / (4 * qw[..., 3]), (m02 + m20) / (4 * qw[..., 3]), (m12 + m21) / (4 * qw[..., 3]), qw[..., 3]], -1)
    idx = jnp.argmax(qw, axis=-1)
    cands = jnp.stack([c0, c1, c2, c3], -2)
    q = jnp.take_along_axis(cands, idx[..., None, None].repeat(4, -1), axis=-2)[..., 0, :]
    # canonical sign: w >= 0
    q = q * jnp.where(q[..., :1] < 0, -1.0, 1.0)
    return quat_normalize(q)


# ---------------------------------------------------------------------- SO(3)
def hat(w):
    """[..,3] → skew-symmetric [..,3,3]."""
    wx, wy, wz = jnp.moveaxis(w, -1, 0)
    z = jnp.zeros_like(wx)
    return jnp.stack(
        [
            jnp.stack([z, -wz, wy], -1),
            jnp.stack([wz, z, -wx], -1),
            jnp.stack([-wy, wx, z], -1),
        ],
        -2,
    )


def so3_exp(w):
    """Rodrigues: axis-angle [..,3] → R [..,3,3]; stable near 0."""
    theta2 = jnp.sum(w * w, -1, keepdims=True)[..., None]
    theta = jnp.sqrt(jnp.maximum(theta2, _EPS * _EPS))
    W = hat(w)
    W2 = matmul(W, W)
    small = theta2 < 1e-3
    A = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    B = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye + A * W + B * W2


def so3_log(R):
    """R [..,3,3] → axis-angle [..,3]; stable near 0 and pi."""
    tr = jnp.clip((R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2] - 1.0) * 0.5, -1.0, 1.0)
    theta = jnp.arccos(tr)
    vee = jnp.stack(
        [R[..., 2, 1] - R[..., 1, 2], R[..., 0, 2] - R[..., 2, 0], R[..., 1, 0] - R[..., 0, 1]],
        -1,
    )
    sin_t = jnp.sin(theta)
    small = theta[..., None] < 3e-2
    # near pi: fall back through quaternion log
    near_pi = theta[..., None] > (jnp.pi - 1e-3)
    scale = jnp.where(small, 0.5 + theta[..., None] ** 2 / 12.0, theta[..., None] / jnp.maximum(2.0 * sin_t[..., None], _EPS))
    w = vee * scale
    q = rot_to_quat(R)
    qv = q[..., 1:]
    qn = jnp.linalg.norm(qv, axis=-1, keepdims=True)
    w_pi = qv / jnp.maximum(qn, _EPS) * (2.0 * jnp.arctan2(qn, q[..., :1]))
    return jnp.where(near_pi, w_pi, w)


# ---------------------------------------------------------------------- SE(3)
def se3_matrix(R, t):
    """(R, t) → 4x4."""
    batch = R.shape[:-2]
    T = jnp.zeros(batch + (4, 4), R.dtype)
    T = T.at[..., :3, :3].set(R)
    T = T.at[..., :3, 3].set(t)
    T = T.at[..., 3, 3].set(1.0)
    return T


def se3_inv(R, t):
    Ri = jnp.swapaxes(R, -1, -2)
    return Ri, -einsum("...ij,...j->...i", Ri, t)


def se3_compose(Ra, ta, Rb, tb):
    """T_a ∘ T_b  (apply b first)."""
    return matmul(Ra, Rb), einsum("...ij,...j->...i", Ra, tb) + ta


def transform(R, t, pts):
    """Apply T to points [..,3]."""
    return einsum("...ij,...j->...i", R, pts) + t


def se3_exp(xi):
    """Twist [..,6] = [rho(3), phi(3)] → (R, t). Uses V(phi) for translation."""
    rho, phi = xi[..., :3], xi[..., 3:]
    R = so3_exp(phi)
    theta2 = jnp.sum(phi * phi, -1, keepdims=True)[..., None]
    theta = jnp.sqrt(jnp.maximum(theta2, _EPS * _EPS))
    W = hat(phi)
    W2 = matmul(W, W)
    small = theta2 < 1e-3
    B = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2)
    C = jnp.where(small, 1.0 / 6.0 - theta2 / 120.0, (theta - jnp.sin(theta)) / (theta2 * theta))
    eye = jnp.broadcast_to(jnp.eye(3, dtype=xi.dtype), W.shape)
    V = eye + B * W + C * W2
    t = einsum("...ij,...j->...i", V, rho)
    return R, t


def se3_log(R, t):
    """(R, t) → twist [..,6]."""
    phi = so3_log(R)
    theta2 = jnp.sum(phi * phi, -1, keepdims=True)[..., None]
    theta = jnp.sqrt(jnp.maximum(theta2, _EPS * _EPS))
    W = hat(phi)
    W2 = matmul(W, W)
    small = theta2 < 1e-3
    # V^{-1} = I - W/2 + (1/theta^2)(1 - A/(2B)) W^2
    A = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    B = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2)
    coef = jnp.where(small, 1.0 / 12.0 + theta2 / 720.0, (1.0 - A / (2.0 * B)) / theta2)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=R.dtype), W.shape)
    Vinv = eye - 0.5 * W + coef * W2
    rho = einsum("...ij,...j->...i", Vinv, t)
    return jnp.concatenate([rho, phi], -1)


# ---------------------------------------------------------------------- Sim(3)
def sim3_apply(s, R, t, pts):
    """Similarity transform s·R·p + t (reference: g2o Sim3 map())."""
    return s[..., None] * einsum("...ij,...j->...i", R, pts) + t


def sim3_inv(s, R, t):
    si = 1.0 / jnp.maximum(s, _EPS)
    Ri = jnp.swapaxes(R, -1, -2)
    return si, Ri, -si[..., None] * einsum("...ij,...j->...i", Ri, t)


def sim3_compose(sa, Ra, ta, sb, Rb, tb):
    return sa * sb, matmul(Ra, Rb), sa[..., None] * einsum("...ij,...j->...i", Ra, tb) + ta


def sim3_exp(xi):
    """7-dof twist [rho(3), phi(3), sigma] → (s, R, t).

    Follows the standard Sim(3) exponential (Strasdat); replaces
    g2o/types/sim3.h exp. Stable small-angle/small-scale branches.
    """
    rho, phi, sigma = xi[..., :3], xi[..., 3:6], xi[..., 6]
    s = jnp.exp(sigma)
    R = so3_exp(phi)
    theta = jnp.sqrt(jnp.maximum(jnp.sum(phi * phi, -1), _EPS * _EPS))
    W = hat(phi)
    W2 = matmul(W, W)
    eps = 1e-3  # f32-safe: below this, general-branch cancellation dominates
    th_small = theta < eps
    sig_small = jnp.abs(sigma) < eps
    th2 = theta * theta
    sig2 = sigma * sigma
    sin_t, cos_t = jnp.sin(theta), jnp.cos(theta)
    # V = C*I + A*W + B*W^2 with the four-branch coefficient table (Sophus sim3)
    C_ = jnp.where(sig_small, 1.0, (s - 1.0) / jnp.where(sig_small, 1.0, sigma))
    a_ = s * sin_t
    b_ = s * cos_t
    c_ = th2 + sig2
    A_gen = (a_ * sigma + (1.0 - b_) * theta) / jnp.maximum(theta * c_, _EPS)
    A_sig0 = (1.0 - cos_t) / jnp.maximum(th2, _EPS)
    A_th0 = ((sigma - 1.0) * s + 1.0) / jnp.maximum(sig2, _EPS)
    B_gen = (C_ - ((b_ - 1.0) * sigma + a_ * theta) / jnp.maximum(c_, _EPS)) / jnp.maximum(th2, _EPS)
    B_sig0 = (theta - sin_t) / jnp.maximum(th2 * theta, _EPS)
    B_th0 = ((0.5 * sig2 - sigma + 1.0) * s - 1.0) / jnp.maximum(sig2 * sigma, _EPS)
    A_ = jnp.where(
        sig_small,
        jnp.where(th_small, 0.5, A_sig0),
        jnp.where(th_small, A_th0, A_gen),
    )
    B_ = jnp.where(
        sig_small,
        jnp.where(th_small, 1.0 / 6.0, B_sig0),
        jnp.where(th_small, B_th0, B_gen),
    )
    eye = jnp.broadcast_to(jnp.eye(3, dtype=xi.dtype), W.shape)
    V = C_[..., None, None] * eye + A_[..., None, None] * W + B_[..., None, None] * W2
    t = einsum("...ij,...j->...i", V, rho)
    return s, R, t


def sim3_log(s, R, t):
    """(s, R, t) → 7-dof twist. Inverse of sim3_exp via linear solve on V."""
    sigma = jnp.log(jnp.maximum(s, _EPS))
    phi = so3_log(R)
    xi_test = jnp.concatenate([jnp.zeros_like(phi), phi, sigma[..., None]], -1)
    # Recover V from sim3_exp pieces by re-evaluating with rho = e_i
    def v_col(e):
        full = jnp.concatenate([jnp.broadcast_to(e, phi.shape), phi, sigma[..., None]], -1)
        _, _, col = sim3_exp(full)
        return col

    del xi_test
    e = jnp.eye(3, dtype=R.dtype)
    V = jnp.stack([v_col(e[0]), v_col(e[1]), v_col(e[2])], -1)
    rho = jnp.linalg.solve(V, t[..., None])[..., 0]
    return jnp.concatenate([rho, phi, sigma[..., None]], -1)


# ------------------------------------------------------------------ alignment
def horn_sim3(src, dst, fix_scale=False):
    """Closed-form similarity alignment dst ≈ s·R·src + t (Horn / Umeyama).

    Replaces Sim3Solver::ComputeSim3 (reference: src/Sim3Solver.cc:~229) for
    both RANSAC hypothesis generation (3-point minimal) and full alignment.
    src, dst: [..., N, 3]. Returns (s, R, t).
    """
    mu_s = jnp.mean(src, axis=-2, keepdims=True)
    mu_d = jnp.mean(dst, axis=-2, keepdims=True)
    sc = src - mu_s
    dc = dst - mu_d
    # cross-covariance
    H = einsum("...ni,...nj->...ij", sc, dc)
    U, S, Vt = jnp.linalg.svd(H)
    d = jnp.sign(jnp.linalg.det(einsum("...ij,...jk->...ik", jnp.swapaxes(Vt, -1, -2), jnp.swapaxes(U, -1, -2))))
    D = jnp.stack([jnp.ones_like(d), jnp.ones_like(d), d], -1)
    R = einsum("...ji,...j,...jk->...ik", Vt, D, jnp.swapaxes(U, -1, -2))
    var_s = jnp.sum(sc * sc, axis=(-1, -2))
    s_num = jnp.sum(S * D, axis=-1)
    s = jnp.where(fix_scale, jnp.ones_like(var_s), s_num / jnp.maximum(var_s, _EPS))
    t = mu_d[..., 0, :] - s[..., None] * einsum("...ij,...j->...i", R, mu_s[..., 0, :])
    return s, R, t


def average_quat(qs, weights=None):
    """Weighted chordal quaternion mean via largest eigenvector of Σ w qqᵀ."""
    if weights is None:
        weights = jnp.ones(qs.shape[:-1], qs.dtype)
    M = einsum("...n,...ni,...nj->...ij", weights, qs, qs)
    _, vecs = jnp.linalg.eigh(M)
    q = vecs[..., -1]
    return q * jnp.where(q[..., :1] < 0, -1.0, 1.0)
