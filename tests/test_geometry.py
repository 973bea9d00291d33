"""Geometry golden/roundtrip tests.

Mirrors the reference's golden-value test style (test/test_Jacobian.cpp,
test/test_Kine_*.cpp) using analytically-known transforms instead of MATLAB
constants.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gf_orb_slam2_tpu.geometry import lie, camera, triangulate


def rand_rot(rng, n=()):
    w = rng.standard_normal(n + (3,)).astype(np.float32)
    return np.asarray(lie.so3_exp(jnp.asarray(w)))


class TestQuat:
    def test_quat_rot_roundtrip(self):
        rng = np.random.default_rng(0)
        R = rand_rot(rng, (32,))
        q = lie.rot_to_quat(jnp.asarray(R))
        R2 = lie.quat_to_rot(q)
        np.testing.assert_allclose(R, np.asarray(R2), atol=1e-5)

    def test_quat_mul_matches_rot_compose(self):
        rng = np.random.default_rng(1)
        Ra, Rb = rand_rot(rng, (8,)), rand_rot(rng, (8,))
        qa, qb = lie.rot_to_quat(jnp.asarray(Ra)), lie.rot_to_quat(jnp.asarray(Rb))
        Rab = jnp.asarray(Ra) @ jnp.asarray(Rb)
        qab = lie.quat_mul(qa, qb)
        np.testing.assert_allclose(
            np.asarray(lie.quat_to_rot(qab)), np.asarray(Rab), atol=1e-5
        )

    def test_identity(self):
        q = lie.rot_to_quat(jnp.eye(3))
        np.testing.assert_allclose(np.asarray(q), [1, 0, 0, 0], atol=1e-6)


class TestSO3:
    def test_exp_log_roundtrip(self):
        rng = np.random.default_rng(2)
        w = rng.uniform(-2, 2, (64, 3)).astype(np.float32)
        w2 = lie.so3_log(lie.so3_exp(jnp.asarray(w)))
        np.testing.assert_allclose(w, np.asarray(w2), atol=1e-4)

    def test_small_angle(self):
        w = jnp.array([[1e-9, 0, 0], [0.0, 0, 0]])
        R = lie.so3_exp(w)
        np.testing.assert_allclose(np.asarray(R[1]), np.eye(3), atol=1e-7)
        assert np.all(np.isfinite(np.asarray(lie.so3_log(R))))

    def test_near_pi(self):
        w = np.array([[np.pi - 1e-4, 0, 0]], np.float32)
        w2 = lie.so3_log(lie.so3_exp(jnp.asarray(w)))
        np.testing.assert_allclose(w, np.asarray(w2), atol=1e-3)


class TestSE3:
    def test_exp_log_roundtrip(self):
        rng = np.random.default_rng(3)
        xi = rng.uniform(-1, 1, (32, 6)).astype(np.float32)
        R, t = lie.se3_exp(jnp.asarray(xi))
        xi2 = lie.se3_log(R, t)
        np.testing.assert_allclose(xi, np.asarray(xi2), atol=1e-4)

    def test_inverse_compose(self):
        rng = np.random.default_rng(4)
        xi = rng.uniform(-1, 1, (8, 6)).astype(np.float32)
        R, t = lie.se3_exp(jnp.asarray(xi))
        Ri, ti = lie.se3_inv(R, t)
        Rc, tc = lie.se3_compose(R, t, Ri, ti)
        np.testing.assert_allclose(np.asarray(Rc), np.broadcast_to(np.eye(3), (8, 3, 3)), atol=1e-5)
        np.testing.assert_allclose(np.asarray(tc), 0, atol=1e-5)

    def test_transform(self):
        R = lie.so3_exp(jnp.array([0.0, 0.0, jnp.pi / 2]))
        p = lie.transform(R, jnp.array([1.0, 0, 0]), jnp.array([1.0, 0, 0]))
        np.testing.assert_allclose(np.asarray(p), [1, 1, 0], atol=1e-6)


class TestSim3:
    def test_exp_log_roundtrip(self):
        rng = np.random.default_rng(5)
        xi = rng.uniform(-0.8, 0.8, (16, 7)).astype(np.float32)
        s, R, t = lie.sim3_exp(jnp.asarray(xi))
        xi2 = lie.sim3_log(s, R, t)
        np.testing.assert_allclose(xi, np.asarray(xi2), atol=2e-4)

    def test_sigma_zero_matches_se3(self):
        rng = np.random.default_rng(6)
        xi6 = rng.uniform(-1, 1, (8, 6)).astype(np.float32)
        xi7 = np.concatenate([xi6, np.zeros((8, 1), np.float32)], -1)
        s, R, t = lie.sim3_exp(jnp.asarray(xi7))
        R2, t2 = lie.se3_exp(jnp.asarray(xi6))
        np.testing.assert_allclose(np.asarray(s), 1.0, atol=1e-6)
        np.testing.assert_allclose(np.asarray(R), np.asarray(R2), atol=1e-5)
        np.testing.assert_allclose(np.asarray(t), np.asarray(t2), atol=1e-4)

    def test_compose_inverse(self):
        rng = np.random.default_rng(7)
        xi = rng.uniform(-0.5, 0.5, (4, 7)).astype(np.float32)
        s, R, t = lie.sim3_exp(jnp.asarray(xi))
        si, Ri, ti = lie.sim3_inv(s, R, t)
        sc, Rc, tc = lie.sim3_compose(s, R, t, si, Ri, ti)
        np.testing.assert_allclose(np.asarray(sc), 1.0, atol=1e-5)
        np.testing.assert_allclose(np.asarray(tc), 0.0, atol=1e-5)


class TestHorn:
    def test_exact_alignment(self):
        rng = np.random.default_rng(8)
        src = rng.standard_normal((50, 3)).astype(np.float32)
        R = rand_rot(rng)
        s_true, t_true = 1.7, np.array([0.3, -2.0, 1.1], np.float32)
        dst = s_true * src @ R.T + t_true
        s, Re, te = lie.horn_sim3(jnp.asarray(src), jnp.asarray(dst))
        np.testing.assert_allclose(float(s), s_true, atol=1e-4)
        np.testing.assert_allclose(np.asarray(Re), R, atol=1e-4)
        np.testing.assert_allclose(np.asarray(te), t_true, atol=1e-3)

    def test_fixed_scale(self):
        rng = np.random.default_rng(9)
        src = rng.standard_normal((30, 3)).astype(np.float32)
        R = rand_rot(rng)
        dst = src @ R.T + 1.0
        s, Re, te = lie.horn_sim3(jnp.asarray(src), jnp.asarray(dst), fix_scale=True)
        assert float(s) == 1.0
        np.testing.assert_allclose(np.asarray(Re), R, atol=1e-4)


class TestCamera:
    def cam(self, dist=(0.1, -0.05, 0.001, -0.002, 0.01)):
        return camera.PinholeCamera(
            fx=jnp.float32(450.0), fy=jnp.float32(455.0),
            cx=jnp.float32(320.0), cy=jnp.float32(240.0),
            dist=jnp.asarray(dist, jnp.float32), width=640, height=480,
        )

    def test_project_backproject(self):
        cam = self.cam()
        rng = np.random.default_rng(10)
        pc = rng.uniform(-1, 1, (40, 3)).astype(np.float32)
        pc[:, 2] = rng.uniform(1, 10, 40)
        uv, z = camera.project(cam, jnp.asarray(pc))
        pc2 = camera.backproject(cam, uv, z)
        np.testing.assert_allclose(pc, np.asarray(pc2), atol=1e-4)

    def test_undistort_roundtrip(self):
        cam = self.cam()
        rng = np.random.default_rng(11)
        xn = rng.uniform(-0.4, 0.4, (64, 2)).astype(np.float32)
        xd = camera.distort_radtan(jnp.asarray(xn), cam.dist)
        xu = camera.undistort_normalized(xd, cam.dist)
        np.testing.assert_allclose(xn, np.asarray(xu), atol=1e-5)

    def test_fisheye_roundtrip(self):
        dist = jnp.asarray([0.01, -0.002, 0.001, 0.0, 0.0], jnp.float32)
        rng = np.random.default_rng(12)
        xn = rng.uniform(-0.5, 0.5, (32, 2)).astype(np.float32)
        xd = camera.distort_fisheye(jnp.asarray(xn), dist)
        xu = camera.undistort_normalized(xd, dist, fisheye=True)
        np.testing.assert_allclose(xn, np.asarray(xu), atol=1e-4)

    def test_rectify_identity(self):
        """With D=0, R=I, P=[K|0] rectification is identity."""
        K = np.array([[450, 0, 320], [0, 455, 240], [0, 0, 1]], np.float32)
        rm = camera.RectifyMap.from_np(K, np.zeros(5), np.eye(3), np.hstack([K, np.zeros((3, 1))]))
        uv = jnp.asarray(np.random.default_rng(13).uniform(0, 640, (16, 2)), jnp.float32)
        uv2 = camera.rectify_keypoints(rm, uv)
        np.testing.assert_allclose(np.asarray(uv), np.asarray(uv2), atol=1e-3)

    def test_stereo_unproject(self):
        cam = self.cam(dist=(0, 0, 0, 0, 0))
        bf = 450.0 * 0.1
        X = jnp.array([[0.5, -0.2, 4.0]])
        uv, z = camera.project(cam, X)
        disp = bf / z
        X2 = camera.stereo_unproject(cam, uv, disp, bf)
        np.testing.assert_allclose(np.asarray(X2), np.asarray(X), atol=1e-4)


class TestTriangulate:
    def test_two_view(self):
        rng = np.random.default_rng(14)
        K = jnp.array([[450.0, 0, 320], [0, 450, 240], [0, 0, 1]])
        R1, t1 = jnp.eye(3), jnp.zeros(3)
        R2 = lie.so3_exp(jnp.array([0.0, 0.1, 0.0]))
        t2 = jnp.array([-0.2, 0.0, 0.02])
        Xw = np.stack(
            [rng.uniform(-2, 2, 100), rng.uniform(-1.5, 1.5, 100), rng.uniform(3, 12, 100)],
            -1,
        ).astype(np.float32)
        P1 = triangulate.projection_matrix(K, R1, t1)
        P2 = triangulate.projection_matrix(K, R2, t2)
        uv1, _ = camera.project(
            camera.PinholeCamera(K[0, 0], K[1, 1], K[0, 2], K[1, 2], jnp.zeros(5), 640, 480),
            jnp.asarray(Xw),
        )
        pc2 = lie.transform(R2, t2, jnp.asarray(Xw))
        uv2, _ = camera.project(
            camera.PinholeCamera(K[0, 0], K[1, 1], K[0, 2], K[1, 2], jnp.zeros(5), 640, 480),
            pc2,
        )
        Xt = triangulate.triangulate_dlt(P1, P2, uv1, uv2)
        np.testing.assert_allclose(np.asarray(Xt), Xw, atol=5e-2)
        ok = triangulate.triangulation_checks(
            Xt, R1, t1, R2, t2, uv1, uv2, K,
            jnp.ones(100), jnp.ones(100), min_parallax_cos=0.99999,
        )
        assert np.asarray(ok).mean() > 0.95

    def test_cheirality_rejects_behind(self):
        K = jnp.array([[450.0, 0, 320], [0, 450, 240], [0, 0, 1]])
        R1, t1 = jnp.eye(3), jnp.zeros(3)
        R2, t2 = jnp.eye(3), jnp.array([-0.2, 0.0, 0.0])
        X = jnp.array([[0.0, 0.0, -5.0]])
        ok = triangulate.triangulation_checks(
            X, R1, t1, R2, t2, jnp.zeros((1, 2)), jnp.zeros((1, 2)), K,
            jnp.ones(1), jnp.ones(1),
        )
        assert not bool(ok[0])
