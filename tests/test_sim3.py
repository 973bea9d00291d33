"""Sim3 RANSAC + GN refinement tests (reference: Sim3Solver + OptimizeSim3)."""
import jax
import jax.numpy as jnp
import numpy as np

from gf_orb_slam2_tpu.geometry import lie
from gf_orb_slam2_tpu.loopclosing.sim3solver import optimize_sim3, solve_sim3

FX = FY = 450.0
CX, CY = 320.0, 240.0


def setup(rng, n=120, scale=1.3, outlier_frac=0.2, noise=0.01):
    pc1 = np.stack(
        [rng.uniform(-3, 3, n), rng.uniform(-2, 2, n), rng.uniform(4, 12, n)], -1
    ).astype(np.float32)
    xi = np.concatenate([rng.uniform(-0.3, 0.3, 6), [np.log(scale)]]).astype(np.float32)
    s, R, t = lie.sim3_exp(jnp.asarray(xi))
    pc2 = np.array(lie.sim3_apply(jnp.broadcast_to(s, (n,)), R, t, jnp.asarray(pc1)))
    pc2 += rng.normal(0, noise, pc2.shape)
    n_out = int(outlier_frac * n)
    idx = rng.choice(n, n_out, replace=False)
    pc2[idx] += rng.uniform(0.5, 2.0, (n_out, 3))
    return jnp.asarray(pc1), jnp.asarray(pc2), float(s), np.asarray(R), np.asarray(t)


class TestSim3:
    def test_ransac_recovers(self):
        rng = np.random.default_rng(0)
        pc1, pc2, s_true, R_true, t_true = setup(rng)
        res = solve_sim3(pc1, pc2, jnp.ones(pc1.shape[0], bool),
                         FX, FY, CX, CY, jax.random.PRNGKey(0))
        assert bool(res.ok)
        assert abs(float(res.s) - s_true) < 0.05
        assert float(jnp.linalg.norm(res.t - t_true)) < 0.1

    def test_fix_scale(self):
        rng = np.random.default_rng(1)
        pc1, pc2, s_true, R_true, t_true = setup(rng, scale=1.0)
        res = solve_sim3(pc1, pc2, jnp.ones(pc1.shape[0], bool),
                         FX, FY, CX, CY, jax.random.PRNGKey(0), fix_scale=True)
        assert bool(res.ok)
        assert float(res.s) == 1.0

    def test_correct_loop_convention(self):
        """Pin the Sim3 composition direction used by LoopCloser._correct_loop:
        with (s12,R12,t12) mapping CURRENT-KF camera coords into LOOP-KF
        camera coords (solve_sim3's output on (pc_kf, pc_loop) pairs),
        S_cw(kf) = S12⁻¹ ∘ T_cw(loop_kf) must recover kf's TRUE world→cam
        pose when the loop KF's pose is trusted."""
        rng = np.random.default_rng(3)
        # true world→cam poses of the two keyframes
        xi_k = rng.uniform(-0.4, 0.4, 6).astype(np.float32)
        xi_l = rng.uniform(-0.4, 0.4, 6).astype(np.float32)
        R_k, t_k = lie.se3_exp(jnp.asarray(xi_k))
        R_l, t_l = lie.se3_exp(jnp.asarray(xi_l))
        Xw = jnp.asarray(rng.uniform(-2, 2, (50, 3)).astype(np.float32))
        pc_kf = lie.transform(R_k, t_k, Xw)
        pc_loop = lie.transform(R_l, t_l, Xw)
        # ground-truth S12 from the same solver the loop closer uses
        res = solve_sim3(pc_kf, pc_loop, jnp.ones(50, bool),
                         FX, FY, CX, CY, jax.random.PRNGKey(0), fix_scale=True)
        assert bool(res.ok)
        # the composition from _correct_loop
        si, Ri, ti = lie.sim3_inv(res.s, res.R, res.t)
        s_c, R_c, t_c = lie.sim3_compose(
            si, Ri, ti, jnp.float32(1.0), R_l, t_l)
        np.testing.assert_allclose(np.asarray(R_c), np.asarray(R_k), atol=1e-3)
        np.testing.assert_allclose(np.asarray(t_c) / float(s_c),
                                   np.asarray(t_k), atol=1e-2)

    def test_gn_refinement_improves(self):
        rng = np.random.default_rng(2)
        pc1, pc2, s_true, R_true, t_true = setup(rng, noise=0.02)
        res = solve_sim3(pc1, pc2, jnp.ones(pc1.shape[0], bool),
                         FX, FY, CX, CY, jax.random.PRNGKey(0))
        s_o, R_o, t_o, inl = optimize_sim3(
            res.s, res.R, res.t, pc1, pc2, res.inliers, FX, FY, CX, CY
        )
        err0 = float(jnp.linalg.norm(res.t - t_true))
        err1 = float(jnp.linalg.norm(t_o - t_true))
        assert err1 <= err0 + 1e-3
        assert abs(float(s_o) - s_true) < 0.03
