"""Distributed BA on the virtual 8-device CPU mesh (conftest sets
xla_force_host_platform_device_count=8)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gf_orb_slam2_tpu.parallel.mesh import make_mesh
from gf_orb_slam2_tpu.parallel.dist_ba import distributed_ba

from tests.test_local_ba import build_problem, FX, FY, CX, CY, BF


class TestDistributedBA:
    @pytest.mark.parametrize("n_dev", [2, 8])
    def test_matches_ground_truth(self, n_dev):
        assert len(jax.devices()) >= n_dev
        rng = np.random.default_rng(0)
        prob, gt_R, gt_t, gt_pts = build_problem(rng, K=6, P=304, O=6)
        mesh = make_mesh(n_dev)
        kf_R, kf_t, pt_pos, cost = distributed_ba(mesh, prob, FX, FY, CX, CY, BF, iters=12)
        terr = np.linalg.norm(np.asarray(kf_t) - gt_t, axis=-1)
        assert terr[1:].max() < 0.02, terr
        perr = np.linalg.norm(np.asarray(pt_pos) - gt_pts, axis=-1)
        assert np.median(perr) < 0.1

    def test_sharded_equals_single_device(self):
        """Same problem on 1-device and 8-device meshes must agree closely."""
        rng = np.random.default_rng(1)
        prob, gt_R, gt_t, gt_pts = build_problem(rng, K=6, P=304, O=6)
        out1 = distributed_ba(make_mesh(1), prob, FX, FY, CX, CY, BF, iters=6)
        out8 = distributed_ba(make_mesh(8), prob, FX, FY, CX, CY, BF, iters=6)
        np.testing.assert_allclose(
            np.asarray(out1[1]), np.asarray(out8[1]), atol=1e-3
        )
        np.testing.assert_allclose(
            np.asarray(out1[2]), np.asarray(out8[2]), atol=5e-3
        )

    def test_kf_sharded_pcg_converges(self):
        """KF-sharded variant (reduce-scattered camera system + distributed
        PCG — no replicated [6K,6K] factor): must converge to ground truth
        like the dense solve. K divisible by the mesh size."""
        rng = np.random.default_rng(2)
        prob, gt_R, gt_t, gt_pts = build_problem(rng, K=16, P=512, O=8)
        mesh = make_mesh(8)
        kf_R, kf_t, pt_pos, cost = distributed_ba(
            mesh, prob, FX, FY, CX, CY, BF, iters=12, kf_sharded=True)
        terr = np.linalg.norm(np.asarray(kf_t) - gt_t, axis=-1)
        assert terr[1:].max() < 0.02, terr
        perr = np.linalg.norm(np.asarray(pt_pos) - gt_pts, axis=-1)
        assert np.median(perr) < 0.1

    def test_kf_sharded_matches_dense(self):
        """One LM step of the PCG variant ≈ the dense replicated solve."""
        rng = np.random.default_rng(3)
        prob, gt_R, gt_t, gt_pts = build_problem(rng, K=8, P=256, O=6)
        mesh = make_mesh(8)
        outd = distributed_ba(mesh, prob, FX, FY, CX, CY, BF, iters=1)
        outp = distributed_ba(mesh, prob, FX, FY, CX, CY, BF, iters=1,
                              kf_sharded=True)
        np.testing.assert_allclose(np.asarray(outd[1]), np.asarray(outp[1]),
                                   atol=2e-4)
