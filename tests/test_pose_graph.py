"""Sim3 pose-graph optimization tests: loop-closure drift correction."""
import jax.numpy as jnp
import numpy as np

from gf_orb_slam2_tpu.geometry import lie
from gf_orb_slam2_tpu.optim.pose_graph import PoseGraphProblem, optimize_pose_graph


def circle_graph(K=20, drift=0.03, seed=0, fix_scale=True, scale_drift=0.0):
    """Ground truth: cameras on a circle, sequential edges from TRUE relative
    poses, one loop edge closing the circle; initial estimates accumulate
    drift — the classic pose-graph benchmark."""
    rng = np.random.default_rng(seed)
    gt_R, gt_t = [], []
    for k in range(K):
        ang = 2 * np.pi * k / K
        Rwc = np.asarray(lie.so3_exp(jnp.asarray([0.0, ang, 0.0])), np.float32)
        C = np.array([5 * np.sin(ang), 0.0, 5 - 5 * np.cos(ang)], np.float32)
        R = Rwc.T
        t = -R @ C
        gt_R.append(R)
        gt_t.append(t)
    gt_R, gt_t = np.stack(gt_R), np.stack(gt_t)
    gt_s = np.ones(K, np.float32)

    # drifted estimates: integrate noisy relative poses
    est_R = [gt_R[0]]
    est_t = [gt_t[0]]
    est_s = [1.0]
    for k in range(1, K):
        # true relative i-1 → i
        R_rel = gt_R[k] @ gt_R[k - 1].T
        t_rel = gt_t[k] - R_rel @ gt_t[k - 1]
        xi = rng.normal(0, drift, 6).astype(np.float32)
        dR, dt = lie.se3_exp(jnp.asarray(xi))
        Rn = np.asarray(dR) @ R_rel
        tn = np.asarray(dR) @ t_rel + np.asarray(dt)
        s_noise = float(np.exp(rng.normal(0, scale_drift)))
        est_s.append(est_s[-1] * s_noise)
        est_R.append(Rn @ est_R[-1])
        est_t.append(s_noise * (Rn @ est_t[-1]) + tn)
    est_R, est_t = np.stack(est_R), np.stack(est_t)
    est_s = np.asarray(est_s, np.float32)

    # edges: sequential (true relatives) + loop edge K-1 → 0
    e_i, e_j, e_s, e_R, e_t = [], [], [], [], []
    for k in range(1, K):
        R_rel = gt_R[k] @ gt_R[k - 1].T
        t_rel = gt_t[k] - R_rel @ gt_t[k - 1]
        e_i.append(k)
        e_j.append(k - 1)
        e_s.append(1.0)
        e_R.append(R_rel)
        e_t.append(t_rel)
    R_loop = gt_R[0] @ gt_R[K - 1].T
    t_loop = gt_t[0] - R_loop @ gt_t[K - 1]
    e_i.append(0)
    e_j.append(K - 1)
    e_s.append(1.0)
    e_R.append(R_loop)
    e_t.append(t_loop)

    fixed = np.zeros(K, bool)
    fixed[0] = True
    prob = PoseGraphProblem(
        s=jnp.asarray(est_s), R=jnp.asarray(est_R), t=jnp.asarray(est_t),
        fixed=jnp.asarray(fixed), valid=jnp.ones(K, bool),
        e_i=jnp.asarray(e_i, jnp.int32), e_j=jnp.asarray(e_j, jnp.int32),
        e_s=jnp.asarray(e_s, jnp.float32), e_R=jnp.asarray(np.stack(e_R)),
        e_t=jnp.asarray(np.stack(e_t)), e_w=jnp.ones(len(e_i), jnp.float32),
        fix_scale=fix_scale,
    )
    return prob, gt_R, gt_t


def center_err(s, R, t, gt_R, gt_t):
    C_est = -np.einsum("kji,kj->ki", np.asarray(R), np.asarray(t) / np.asarray(s)[:, None])
    C_gt = -np.einsum("kji,kj->ki", gt_R, gt_t)
    return np.linalg.norm(C_est - C_gt, axis=-1)


class TestPoseGraph:
    def test_corrects_drift(self):
        prob, gt_R, gt_t = circle_graph()
        err0 = center_err(prob.s, prob.R, prob.t, gt_R, gt_t)
        s, R, t, cost = optimize_pose_graph(prob, iters=20)
        err1 = center_err(s, R, t, gt_R, gt_t)
        assert err1.max() < 0.25 * err0.max(), (err0.max(), err1.max())
        assert err1.max() < 0.15

    def test_fixed_vertex_pinned(self):
        prob, gt_R, gt_t = circle_graph()
        s, R, t, cost = optimize_pose_graph(prob, iters=10)
        np.testing.assert_allclose(np.asarray(t)[0], np.asarray(prob.t)[0], atol=1e-6)

    def test_sim3_scale_drift_mono(self):
        """Mono loop closure must also correct accumulated scale drift."""
        prob, gt_R, gt_t = circle_graph(drift=0.02, scale_drift=0.01, fix_scale=False)
        s0_err = np.abs(np.log(np.asarray(prob.s)))
        s, R, t, cost = optimize_pose_graph(prob, iters=25)
        s_err = np.abs(np.log(np.asarray(s)))
        assert s_err.max() < 0.5 * max(s0_err.max(), 1e-6) + 1e-3
