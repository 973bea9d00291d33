"""PnP RANSAC tests (reference test analogue for PnPsolver)."""
import jax
import jax.numpy as jnp
import numpy as np

from gf_orb_slam2_tpu.geometry import lie
from gf_orb_slam2_tpu.tracking.pnp import pnp_ransac

FX = FY = 450.0
CX, CY = 320.0, 240.0


def setup(rng, n=150, outlier_frac=0.0, noise=0.5):
    Xw = np.stack(
        [rng.uniform(-4, 4, n), rng.uniform(-3, 3, n), rng.uniform(3, 15, n)], -1
    ).astype(np.float32)
    xi = rng.uniform(-0.5, 0.5, 6).astype(np.float32)
    R, t = lie.se3_exp(jnp.asarray(xi))
    R, t = np.asarray(R), np.asarray(t)
    pc = Xw @ R.T + t
    keep = pc[:, 2] > 0.5
    uv = np.stack(
        [FX * pc[:, 0] / pc[:, 2] + CX, FY * pc[:, 1] / pc[:, 2] + CY], -1
    ) + rng.normal(0, noise, (n, 2))
    if outlier_frac:
        k = int(outlier_frac * n)
        idx = rng.choice(n, k, replace=False)
        uv[idx] += rng.uniform(40, 150, (k, 2))
    return (jnp.asarray(Xw), jnp.asarray(uv, jnp.float32), jnp.asarray(keep), R, t)


class TestPnP:
    def test_recovers_pose(self):
        rng = np.random.default_rng(0)
        Xw, uv, valid, R, t = setup(rng)
        res = pnp_ransac(Xw, uv, valid, FX, FY, CX, CY, jax.random.PRNGKey(0))
        assert bool(res.ok)
        assert float(jnp.linalg.norm(res.t - t)) < 0.05
        dR = float(np.linalg.norm(np.asarray(lie.so3_log(jnp.asarray(np.asarray(res.R) @ R.T)))))
        assert dR < 0.02

    def test_robust_to_outliers(self):
        rng = np.random.default_rng(1)
        Xw, uv, valid, R, t = setup(rng, outlier_frac=0.3)
        res = pnp_ransac(Xw, uv, valid, FX, FY, CX, CY, jax.random.PRNGKey(0))
        assert bool(res.ok)
        assert float(jnp.linalg.norm(res.t - t)) < 0.1

    def test_planar_scene(self):
        """EPnP parity case: relocalization against a (near-)planar landmark
        set — a wall/floor-dominated scene where a 6-point DLT is degenerate
        (reference solver: EPnP PnPsolver.cc:480 handles planar via the
        control-point parametrization)."""
        rng = np.random.default_rng(3)
        n = 150
        Xw = np.stack(
            [rng.uniform(-4, 4, n), rng.uniform(-3, 3, n),
             np.full(n, 8.0) + rng.normal(0, 1e-3, n)], -1
        ).astype(np.float32)
        xi = np.asarray([0.1, -0.15, 0.05, 0.2, -0.1, 0.3], np.float32)
        R, t = lie.se3_exp(jnp.asarray(xi))
        R, t = np.asarray(R), np.asarray(t)
        pc = Xw @ R.T + t
        uv = np.stack(
            [FX * pc[:, 0] / pc[:, 2] + CX, FY * pc[:, 1] / pc[:, 2] + CY], -1
        ) + rng.normal(0, 0.3, (n, 2))
        res = pnp_ransac(
            jnp.asarray(Xw), jnp.asarray(uv, jnp.float32),
            jnp.ones(n, bool), FX, FY, CX, CY, jax.random.PRNGKey(0))
        assert bool(res.ok)
        assert float(jnp.linalg.norm(res.t - t)) < 0.1
        dR = float(np.linalg.norm(np.asarray(
            lie.so3_log(jnp.asarray(np.asarray(res.R) @ R.T)))))
        assert dR < 0.05

    def test_too_few_matches(self):
        rng = np.random.default_rng(2)
        Xw, uv, valid, R, t = setup(rng, n=30)
        valid = valid & (jnp.arange(30) < 8)
        res = pnp_ransac(Xw, uv, valid, FX, FY, CX, CY, jax.random.PRNGKey(0))
        assert not bool(res.ok)
