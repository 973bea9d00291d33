"""Good-feature selection tests.

Mirrors the reference's test strategy: Jacobian correctness (test_Jacobian.cpp
— here validated against autodiff rather than MATLAB constants, which is a
strictly stronger check) and lazier-greedy selection quality vs exact greedy
(test_Greedy.cpp:209 — statistical logDet-gap assertions).
"""
import jax
import jax.numpy as jnp
import numpy as np

from gf_orb_slam2_tpu.geometry import lie
from gf_orb_slam2_tpu.selection import observability as obs
from gf_orb_slam2_tpu.selection import good_feature as gf

FX = FY = 450.0
BF = 45.0


def random_state(rng):
    q = np.asarray(lie.rot_to_quat(lie.so3_exp(jnp.asarray(rng.normal(0, 0.5, 3), jnp.float32))))
    p = rng.normal(0, 1.0, 3).astype(np.float32)
    return jnp.asarray(q), jnp.asarray(p)


class TestJacobians:
    def test_matches_autodiff(self):
        """H = [∂h/∂p | ∂h/∂q] against full autodiff of the measurement."""
        rng = np.random.default_rng(0)
        q, p = random_state(rng)
        pts = jnp.asarray(
            np.stack([rng.uniform(-3, 3, 20), rng.uniform(-2, 2, 20), rng.uniform(5, 15, 20)], -1),
            jnp.float32,
        )
        stereo = jnp.ones(20, bool)
        H, pc = obs.measurement_jacobians(q, p, pts, FX, FY, BF, stereo)

        def h_fn(state, y):
            qq, pp = state[:4], state[4:]
            R = lie.quat_to_rot(qq)
            pc = R.T @ (y - pp)
            z = pc[2]
            u = FX * pc[0] / z
            v = FY * pc[1] / z
            return jnp.stack([u, v, u - BF / z])

        state = jnp.concatenate([q, p])
        for i in range(20):
            J = jax.jacfwd(h_fn)(state, pts[i])  # [3,7] wrt (q,p)
            J_reordered = jnp.concatenate([J[:, 4:], J[:, :4]], -1)  # (p,q)
            np.testing.assert_allclose(
                np.asarray(H[i]), np.asarray(J_reordered), rtol=2e-3, atol=2e-3
            )

    def test_info_matrix_psd(self):
        rng = np.random.default_rng(1)
        q, p = random_state(rng)
        pts = jnp.asarray(rng.uniform(-2, 2, (50, 3)) + np.array([0, 0, 8]), jnp.float32)
        M = obs.info_matrices(q, p, pts, FX, FY, BF, jnp.ones(50, bool), jnp.ones(50), jnp.ones(50, bool))
        evs = np.linalg.eigvalsh(np.asarray(M))
        assert evs.min() > -1e-6 * max(1.0, evs.max())  # PSD up to f32 noise

    def test_invalid_points_zeroed(self):
        rng = np.random.default_rng(2)
        q, p = random_state(rng)
        pts = jnp.asarray(rng.uniform(-2, 2, (10, 3)) + np.array([0, 0, 8]), jnp.float32)
        valid = jnp.zeros(10, bool)
        M = obs.info_matrices(q, p, pts, FX, FY, BF, jnp.ones(10, bool), jnp.ones(10), valid)
        np.testing.assert_allclose(np.asarray(M), 0.0)


def make_obs_mats(rng, P=400):
    """Synthetic per-point info matrices from a camera looking at a cloud."""
    q, p = random_state(rng)
    pts = jnp.asarray(
        np.stack([rng.uniform(-4, 4, P), rng.uniform(-3, 3, P), rng.uniform(4, 20, P)], -1),
        jnp.float32,
    )
    stereo = jnp.asarray(rng.random(P) < 0.5)
    return obs.info_matrices(q, p, pts, FX, FY, BF, stereo, jnp.ones(P), jnp.ones(P, bool))


class TestGreedy:
    def test_greedy_beats_random(self):
        """logDet of greedy selection must beat random selection clearly
        (reference: test_Greedy statistical comparison)."""
        rng = np.random.default_rng(3)
        M = make_obs_mats(rng)
        valid = jnp.ones(M.shape[0], bool)
        n_sel = 40
        sel_g, _ = gf.greedy_select_exact(M, valid, n_sel)
        lds_r = []
        for s in range(5):
            sel_r, _ = gf.random_select(valid, n_sel, jax.random.PRNGKey(s))
            lds_r.append(float(gf.selection_logdet(M, sel_r)))
        ld_g = float(gf.selection_logdet(M, sel_g))
        assert ld_g > np.mean(lds_r) + 1.0, (ld_g, lds_r)

    def test_lazier_close_to_exact(self):
        """Lazier-greedy (subset scoring) stays within a small logDet gap of
        exact greedy (reference: test_Greedy.cpp:213-270 tolerance)."""
        rng = np.random.default_rng(4)
        M = make_obs_mats(rng)
        valid = jnp.ones(M.shape[0], bool)
        n_sel = 40
        sel_e, _ = gf.greedy_select_exact(M, valid, n_sel)
        ld_e = float(gf.selection_logdet(M, sel_e))
        gaps = []
        for s in range(3):
            sel_l, _ = gf.lazier_greedy_select(M, valid, n_sel, jax.random.PRNGKey(s), lazier_factor=10)
            gaps.append(ld_e - float(gf.selection_logdet(M, sel_l)))
        assert np.mean(gaps) < 0.1 * abs(ld_e) + 2.0, gaps

    def test_budget_respected(self):
        rng = np.random.default_rng(5)
        M = make_obs_mats(rng, P=100)
        sel, order = gf.lazier_greedy_select(M, jnp.ones(100, bool), 30, jax.random.PRNGKey(0))
        assert int(sel.sum()) == 30
        assert int((order >= 0).sum()) == 30

    def test_fewer_candidates_than_budget(self):
        rng = np.random.default_rng(6)
        M = make_obs_mats(rng, P=100)
        valid = jnp.zeros(100, bool).at[:10].set(True)
        sel, order = gf.lazier_greedy_select(M, valid, 30, jax.random.PRNGKey(0))
        assert int(sel.sum()) == 10


class TestHybrid13:
    def test_info13_psd_and_selection(self):
        """Hybrid 13x13 mode (reference: USE_HYBRID_INFO_MATRIX,
        Tracking.cc:271-274): matrices PSD, greedy selection runs at D=13."""
        import jax
        import jax.numpy as jnp
        import numpy as np

        from gf_orb_slam2_tpu.selection import good_feature, observability

        rng = np.random.default_rng(0)
        P = 64
        pts = jnp.asarray(np.stack(
            [rng.uniform(-3, 3, P), rng.uniform(-2, 2, P),
             rng.uniform(3, 10, P)], -1), jnp.float32)
        q = jnp.asarray([1.0, 0, 0, 0], jnp.float32)
        p = jnp.zeros(3, jnp.float32)
        M = observability.info_matrices_13(
            q, p, pts, 450.0, 450.0, 45.0,
            jnp.ones(P, bool), jnp.ones(P, jnp.float32), jnp.ones(P, bool))
        assert M.shape == (P, 13, 13)
        evs = np.linalg.eigvalsh(np.asarray(M[0]))
        assert evs.min() > -1e-2
        sel, order = good_feature.lazier_greedy_select(
            M, jnp.ones(P, bool), 10, jax.random.PRNGKey(0))
        assert int(sel.sum()) == 10

    def test_som_rank_grows_with_segments(self):
        """SOM (reference: compute_SOM_In_Segment Observability.cc:34): the
        stripe matrix over multiple kinematic segments gains rank on the
        velocity columns that a single measurement cannot observe."""
        import jax.numpy as jnp
        import numpy as np

        from gf_orb_slam2_tpu.selection import observability

        rng = np.random.default_rng(1)
        P = 8
        pts = jnp.asarray(np.stack(
            [rng.uniform(-3, 3, P), rng.uniform(-2, 2, P),
             rng.uniform(3, 10, P)], -1), jnp.float32)
        q = jnp.asarray([1.0, 0, 0, 0], jnp.float32)
        p = jnp.zeros(3, jnp.float32)
        v = jnp.asarray([0.5, 0, 0.2], jnp.float32)
        w = jnp.asarray([0.0, 0.1, 0.0], jnp.float32)
        som1 = observability.som_matrices(
            q, p, v, w, [0.1], pts, 450.0, 450.0, 45.0, jnp.ones(P, bool))
        som3 = observability.som_matrices(
            q, p, v, w, [0.1, 0.1, 0.1], pts, 450.0, 450.0, 45.0,
            jnp.ones(P, bool))
        assert som1.shape == (P, 3, 13)
        assert som3.shape == (P, 9, 13)
        # stack all points' stripes: rank over the full state
        r1 = np.linalg.matrix_rank(np.asarray(som1).reshape(-1, 13), tol=1e-4)
        r3 = np.linalg.matrix_rank(np.asarray(som3).reshape(-1, 13), tol=1e-4)
        assert r3 > r1
