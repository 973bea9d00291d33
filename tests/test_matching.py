"""Matching + stereo + pose-optimization tests on synthetic data."""
import jax.numpy as jnp
import numpy as np

from gf_orb_slam2_tpu.matching import hamming, matcher, stereo
from gf_orb_slam2_tpu.optim import pose_opt
from gf_orb_slam2_tpu.geometry import lie


def rand_desc(rng, n):
    return rng.integers(0, 2**32, (n, 8), dtype=np.uint32)


def flip_bits(rng, desc, k):
    """Flip k random bits in each 256-bit descriptor."""
    out = desc.copy()
    for i in range(desc.shape[0]):
        for b in rng.choice(256, k, replace=False):
            out[i, b // 32] ^= np.uint32(1 << (b % 32))
    return out


class TestHamming:
    def test_distance_exact(self):
        a = np.zeros((1, 8), np.uint32)
        b = np.zeros((1, 8), np.uint32)
        b[0, 0] = 0b1011
        b[0, 7] = 1 << 31
        d = int(hamming.distance_matrix(jnp.asarray(a), jnp.asarray(b))[0, 0])
        assert d == 4

    def test_matrix_vs_pairs(self):
        rng = np.random.default_rng(0)
        a, b = rand_desc(rng, 10), rand_desc(rng, 10)
        D = np.asarray(hamming.distance_matrix(jnp.asarray(a), jnp.asarray(b)))
        p = np.asarray(hamming.distance_pairs(jnp.asarray(a), jnp.asarray(b)))
        np.testing.assert_array_equal(np.diag(D), p)

    def test_resolve_duplicates(self):
        best_idx = jnp.asarray([0, 0, 1], jnp.int32)
        best = jnp.asarray([10, 5, 7], jnp.int32)
        accept = jnp.asarray([True, True, True])
        keep = np.asarray(hamming.resolve_duplicates(best_idx, best, accept, 4))
        np.testing.assert_array_equal(keep, [False, True, True])


class TestMatchAll:
    def test_permuted_recovery(self):
        rng = np.random.default_rng(1)
        a = rand_desc(rng, 100)
        perm = rng.permutation(100)
        b = flip_bits(rng, a, 8)[perm]
        m = matcher.match_all(
            jnp.asarray(a), jnp.ones(100, bool), jnp.asarray(b), jnp.ones(100, bool)
        )
        idx = np.asarray(m.idx)
        ok = np.asarray(m.valid)
        assert ok.sum() > 90
        inv = np.argsort(perm)
        np.testing.assert_array_equal(idx[ok], inv[np.nonzero(ok)[0]][: ok.sum()] if False else idx[ok])
        # correctness: matched b row must be the permuted a row
        for i in np.nonzero(ok)[0]:
            assert perm[idx[i]] == i

    def test_invalid_masked_out(self):
        rng = np.random.default_rng(2)
        a = rand_desc(rng, 10)
        m = matcher.match_all(
            jnp.asarray(a), jnp.zeros(10, bool), jnp.asarray(a), jnp.ones(10, bool)
        )
        assert not bool(m.valid.any())


class TestProjectionSearch:
    def test_window_constraint(self):
        rng = np.random.default_rng(3)
        desc = rand_desc(rng, 50)
        kp_uv = rng.uniform(0, 600, (50, 2)).astype(np.float32)
        # points predicted exactly at keypoints, same descriptors
        m = matcher.search_by_projection(
            jnp.asarray(kp_uv), jnp.zeros(50, jnp.int32), jnp.ones(50, bool),
            jnp.asarray(desc),
            jnp.asarray(kp_uv), jnp.zeros(50, jnp.int32), jnp.ones(50, bool),
            jnp.asarray(desc),
            radius=4.0, level_scales=jnp.ones(8),
        )
        assert bool(m.valid.all())
        np.testing.assert_array_equal(np.asarray(m.idx), np.arange(50))
        # shift predictions far away -> no matches
        m2 = matcher.search_by_projection(
            jnp.asarray(kp_uv + 500.0), jnp.zeros(50, jnp.int32), jnp.ones(50, bool),
            jnp.asarray(desc),
            jnp.asarray(kp_uv), jnp.zeros(50, jnp.int32), jnp.ones(50, bool),
            jnp.asarray(desc),
            radius=4.0, level_scales=jnp.ones(8),
        )
        assert not bool(m2.valid.any())


class TestRotationConsistency:
    def test_outlier_rotation_removed(self):
        n = 100
        rng = np.random.default_rng(4)
        ang_a = rng.uniform(-np.pi, np.pi, n).astype(np.float32)
        ang_b = ang_a - 0.3  # consistent rotation of 0.3 rad
        ang_b[:5] = ang_a[:5] + np.pi  # 5 inconsistent matches
        m = matcher.Matches(
            idx=jnp.arange(n, dtype=jnp.int32),
            dist=jnp.zeros(n, jnp.int32),
            valid=jnp.ones(n, bool),
        )
        m2 = matcher.rotation_consistency(jnp.asarray(ang_a), jnp.asarray(ang_b), m)
        ok = np.asarray(m2.valid)
        assert not ok[:5].any()
        assert ok[5:].sum() > 90


class TestStereo:
    def test_known_disparity(self):
        rng = np.random.default_rng(5)
        h, w = 120, 160
        img_l = rng.uniform(0, 255, (h, w)).astype(np.float32)
        true_disp = 7.0
        img_r = np.roll(img_l, -int(true_disp), axis=1)  # right image shifted left
        n = 30
        uv_l = np.stack(
            [rng.uniform(30, w - 30, n), rng.uniform(20, h - 20, n)], -1
        ).astype(np.float32).round()
        uv_r = uv_l - np.array([true_disp, 0.0], np.float32)
        desc = rand_desc(rng, n)
        bf = 40.0
        sm = stereo.match_stereo(
            jnp.asarray(uv_l), jnp.zeros(n, jnp.int32), jnp.asarray(desc), jnp.ones(n, bool),
            jnp.asarray(uv_r), jnp.zeros(n, jnp.int32), jnp.asarray(desc), jnp.ones(n, bool),
            jnp.asarray(img_l), jnp.asarray(img_r), jnp.ones(8), bf,
        )
        ok = np.asarray(sm.valid)
        assert ok.sum() > 25
        d = np.asarray(sm.depth)[ok]
        np.testing.assert_allclose(d, bf / true_disp, rtol=0.05)

    def test_rgbd(self):
        n = 10
        uv = jnp.asarray(np.random.default_rng(6).uniform(10, 90, (n, 2)), jnp.float32)
        depth_map = jnp.full((100, 100), 3.0)
        sm = stereo.depth_to_disparity(uv, jnp.ones(n, bool), depth_map, bf=40.0)
        np.testing.assert_allclose(np.asarray(sm.depth), 3.0)
        np.testing.assert_allclose(np.asarray(sm.u_right), np.asarray(uv)[:, 0] - 40.0 / 3.0, rtol=1e-5)


class TestPoseOpt:
    def _setup(self, n=200, stereo_frac=0.5, noise=0.5, outliers=0):
        rng = np.random.default_rng(7)
        fx = fy = 450.0
        cx, cy = 320.0, 240.0
        bf = 45.0
        Xw = np.stack(
            [rng.uniform(-3, 3, n), rng.uniform(-2, 2, n), rng.uniform(4, 12, n)], -1
        ).astype(np.float32)
        xi_true = np.array([0.1, -0.05, 0.08, 0.02, -0.03, 0.01], np.float32)
        R_true, t_true = lie.se3_exp(jnp.asarray(xi_true))
        pc = np.asarray(lie.transform(R_true, t_true, jnp.asarray(Xw)))
        uv = np.stack(
            [fx * pc[:, 0] / pc[:, 2] + cx, fy * pc[:, 1] / pc[:, 2] + cy], -1
        )
        uv += rng.normal(0, noise, uv.shape)
        u_right = uv[:, 0] - bf / pc[:, 2]
        u_right[int(n * stereo_frac):] = -1.0
        if outliers:
            idx = rng.choice(n, outliers, replace=False)
            uv[idx] += rng.uniform(30, 80, (outliers, 2))
        return (Xw, uv.astype(np.float32), u_right.astype(np.float32),
                R_true, t_true, fx, fy, cx, cy, bf)

    def test_converges_from_identity(self):
        Xw, uv, ur, R_true, t_true, fx, fy, cx, cy, bf = self._setup()
        res = pose_opt.pose_optimization(
            jnp.eye(3), jnp.zeros(3), jnp.asarray(Xw), jnp.asarray(uv),
            jnp.asarray(ur), jnp.ones(len(Xw)), jnp.ones(len(Xw), bool),
            fx, fy, cx, cy, bf,
        )
        err_t = float(jnp.linalg.norm(res.t - t_true))
        err_R = float(jnp.linalg.norm(lie.so3_log(res.R @ R_true.T)))
        assert err_t < 0.02 and err_R < 0.005
        assert int(res.n_inliers) > 150

    def test_rejects_outliers(self):
        Xw, uv, ur, R_true, t_true, fx, fy, cx, cy, bf = self._setup(outliers=40)
        res = pose_opt.pose_optimization(
            jnp.eye(3), jnp.zeros(3), jnp.asarray(Xw), jnp.asarray(uv),
            jnp.asarray(ur), jnp.ones(len(Xw)), jnp.ones(len(Xw), bool),
            fx, fy, cx, cy, bf,
        )
        err_t = float(jnp.linalg.norm(res.t - t_true))
        assert err_t < 0.03
        # outliers gated out
        assert int(res.n_inliers) <= 200 - 35
