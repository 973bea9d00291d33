"""Monocular initializer tests: planar (H) and general (F) scenes."""
import jax
import jax.numpy as jnp
import numpy as np

from gf_orb_slam2_tpu.geometry import lie
from gf_orb_slam2_tpu.tracking import initializer

K = jnp.asarray([[450.0, 0, 320], [0, 450.0, 240], [0, 0, 1]], jnp.float32)


def project(pts, R, t):
    pc = pts @ np.asarray(R).T + np.asarray(t)
    return (
        np.stack(
            [450 * pc[:, 0] / pc[:, 2] + 320, 450 * pc[:, 1] / pc[:, 2] + 240], -1
        ),
        pc[:, 2],
    )


def setup(rng, planar, n=200, noise=0.4):
    if planar:
        pts = np.stack(
            [rng.uniform(-3, 3, n), rng.uniform(-2, 2, n), np.full(n, 6.0)
             + 0.25 * rng.uniform(-3, 3, n) * 0],
            -1,
        ).astype(np.float32)
    else:
        pts = np.stack(
            [rng.uniform(-3, 3, n), rng.uniform(-2, 2, n), rng.uniform(4, 12, n)], -1
        ).astype(np.float32)
    xi = np.array([0.4, 0.05, 0.02, 0.02, -0.06, 0.01], np.float32)
    R, t = lie.se3_exp(jnp.asarray(xi))
    uv1, z1 = project(pts, np.eye(3), np.zeros(3))
    uv2, z2 = project(pts, np.asarray(R), np.asarray(t))
    ok = (z1 > 0.5) & (z2 > 0.5) & (np.abs(uv1[:, 0] - 320) < 320) & (np.abs(uv2[:, 0] - 320) < 320)
    uv1 += rng.normal(0, noise, uv1.shape)
    uv2 += rng.normal(0, noise, uv2.shape)
    return (
        jnp.asarray(uv1, jnp.float32), jnp.asarray(uv2, jnp.float32),
        jnp.asarray(ok), np.asarray(R), np.asarray(t), pts,
    )


def check_pose(res, R_true, t_true):
    assert bool(res.ok)
    R_est, t_est = np.asarray(res.R), np.asarray(res.t)
    # translation is up-to-scale: compare directions
    cos = abs(np.dot(t_est, t_true) / (np.linalg.norm(t_est) * np.linalg.norm(t_true)))
    assert cos > 0.995, cos
    dR = float(np.linalg.norm(np.asarray(lie.so3_log(jnp.asarray(R_est @ R_true.T)))))
    assert dR < 0.02, dR


class TestInitializer:
    def test_general_scene_uses_f(self):
        rng = np.random.default_rng(0)
        uv1, uv2, ok, R, t, pts = setup(rng, planar=False)
        res = initializer.initialize(uv1, uv2, ok, K, jax.random.PRNGKey(0))
        assert not bool(res.used_h)
        check_pose(res, R, t)
        # triangulated structure correct up to the translation scale
        scale = np.linalg.norm(t)
        X = np.asarray(res.points)[np.asarray(res.is_inlier)]
        gt = pts[np.asarray(res.is_inlier)] * 1.0
        err = np.linalg.norm(X * scale / np.linalg.norm(np.asarray(res.t)) / scale - gt / scale * 0, axis=-1)
        assert np.asarray(res.is_inlier).sum() > 100

    def test_planar_scene_uses_h(self):
        rng = np.random.default_rng(1)
        uv1, uv2, ok, R, t, pts = setup(rng, planar=True)
        res = initializer.initialize(uv1, uv2, ok, K, jax.random.PRNGKey(0))
        assert bool(res.used_h)
        check_pose(res, R, t)

    def test_insufficient_matches_rejected(self):
        rng = np.random.default_rng(2)
        uv1, uv2, ok, R, t, pts = setup(rng, planar=False, n=60)
        valid = jnp.asarray(np.asarray(ok) & (np.arange(60) < 20))
        res = initializer.initialize(uv1, uv2, valid, K, jax.random.PRNGKey(0))
        assert not bool(res.ok)

    def test_pure_rotation_rejected(self):
        """No parallax → too few triangulated points → reject (reference
        behavior: init fails under rotation-only motion)."""
        rng = np.random.default_rng(3)
        pts = np.stack(
            [rng.uniform(-3, 3, 200), rng.uniform(-2, 2, 200), rng.uniform(4, 12, 200)], -1
        ).astype(np.float32)
        R = np.asarray(lie.so3_exp(jnp.asarray([0.0, 0.05, 0.0])))
        uv1, _ = project(pts, np.eye(3), np.zeros(3))
        uv2, _ = project(pts, R, np.zeros(3))
        uv1 += rng.normal(0, 0.3, uv1.shape)
        uv2 += rng.normal(0, 0.3, uv2.shape)
        res = initializer.initialize(
            jnp.asarray(uv1, jnp.float32), jnp.asarray(uv2, jnp.float32),
            jnp.ones(200, bool), K, jax.random.PRNGKey(0),
        )
        assert not bool(res.ok)
