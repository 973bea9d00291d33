"""Good-graph subgraph selection tests (reference: test_GoodMap.cpp style)."""
import jax
import jax.numpy as jnp
import numpy as np

from gf_orb_slam2_tpu.optim.local_ba import pose_schur_blocks
from gf_orb_slam2_tpu.selection.good_graph import (
    masked_logdet, select_subgraph, estimate_kf_budget,
)

from tests.test_local_ba import build_problem, FX, FY, CX, CY, BF


def schur_for(rng, K=10, P=200):
    prob, gt_R, gt_t, gt_pts = build_problem(rng, K=K, P=P, O=min(8, K))
    S = pose_schur_blocks(prob, FX, FY, CX, CY, BF)
    return S, prob


class TestGoodGraph:
    def test_schur_psd(self):
        rng = np.random.default_rng(0)
        S, _ = schur_for(rng)
        K = S.shape[0]
        M = np.asarray(jnp.swapaxes(S, 1, 2).reshape(K * 6, K * 6))
        evs = np.linalg.eigvalsh((M + M.T) / 2)
        assert evs.min() > -1e-3 * max(1.0, abs(evs.max()))

    def test_masked_logdet_matches_submatrix(self):
        rng = np.random.default_rng(1)
        S, _ = schur_for(rng, K=6)
        mask = jnp.asarray([True, False, True, True, False, True])
        ld = float(masked_logdet(S, mask, eps=1e-3))
        # direct submatrix
        idx = np.nonzero(np.asarray(mask))[0]
        Ssub = np.asarray(S)[np.ix_(idx, idx)]
        M = Ssub.transpose(0, 2, 1, 3).reshape(len(idx) * 6, len(idx) * 6)
        diag = np.diag(M)
        s = np.sqrt(np.maximum(diag, 1e-3))
        Mn = M / np.outer(s, s) + 1e-5 * np.eye(len(M))
        ld_direct = np.linalg.slogdet(Mn)[1] + 2 * np.log(s).sum()
        np.testing.assert_allclose(ld, ld_direct, rtol=1e-3, atol=0.5)

    def test_selection_budget_and_quality(self):
        rng = np.random.default_rng(2)
        S, _ = schur_for(rng, K=12)
        free = jnp.ones(12, bool)
        keep = jnp.zeros(12, bool).at[0].set(True)
        sel = select_subgraph(S, free, 6, jax.random.PRNGKey(0), always_keep=keep)
        assert int(sel.sum()) == 6
        assert bool(sel[0])
        # greedy selection must beat the mean of random subsets
        ld_g = float(masked_logdet(S, sel))
        lds_r = []
        for s_ in range(8):
            r = np.zeros(12, bool)
            r[0] = True
            r[np.random.default_rng(s_).choice(np.arange(1, 12), 5, replace=False)] = True
            lds_r.append(float(masked_logdet(S, jnp.asarray(r))))
        assert ld_g >= np.mean(lds_r), (ld_g, lds_r)

    def test_budget_model(self):
        assert estimate_kf_budget(5.0) < estimate_kf_budget(100.0) <= 64

    def test_gg_ba_beats_baselines(self):
        """Good-graph-selected BA at a fixed KF budget must beat the
        sliding-window baseline on selection logDet AND on the trajectory
        error of the keyframes it chose to optimize (reference comparison:
        test_GoodMap.cpp:155 + the sliding-window/covis baselines of
        Optimizer.h:39-40). Information is heterogeneous: late KFs see few
        points, so 'most recent' is the wrong subset to spend budget on."""
        from gf_orb_slam2_tpu.optim.local_ba import local_bundle_adjustment
        from tests.test_local_ba import build_problem

        rng = np.random.default_rng(5)
        K, P, B = 16, 400, 6
        prob, gt_R, gt_t, gt_pts = build_problem(
            rng, K=K, P=P, O=8, pose_noise=0.05)
        # strip most observations of the last 6 KFs (weakly constrained)
        obs_kf = np.asarray(prob.obs_kf)
        obs_valid = np.asarray(prob.obs_valid)
        weak = obs_kf >= K - 6
        drop = weak & (rng.random(obs_valid.shape) < 0.9)
        obs_valid = obs_valid & ~drop
        prob = prob._replace(obs_valid=jnp.asarray(obs_valid))
        S = pose_schur_blocks(prob, FX, FY, CX, CY, BF)
        free = ~np.asarray(prob.kf_fixed)

        def run_with(sel_mask):
            pr = prob._replace(
                kf_fixed=prob.kf_fixed | jnp.asarray(~sel_mask & free))
            res = local_bundle_adjustment(pr, FX, FY, CX, CY, BF)
            terr = np.linalg.norm(np.asarray(res.kf_t) - gt_t, axis=-1)
            return float(terr[sel_mask & free].mean())

        keep = jnp.zeros(K, bool).at[1].set(True)
        sel_gg = np.asarray(select_subgraph(
            S, jnp.asarray(free), B, jax.random.PRNGKey(0),
            always_keep=keep))
        sel_sw = np.zeros(K, bool)
        sel_sw[K - B:] = True  # sliding window: most recent B
        ld_gg = float(masked_logdet(S, jnp.asarray(sel_gg)))
        ld_sw = float(masked_logdet(S, jnp.asarray(sel_sw & free)))
        assert ld_gg > ld_sw, (ld_gg, ld_sw)
        err_gg = run_with(sel_gg)
        err_sw = run_with(sel_sw)
        assert err_gg <= err_sw * 1.05, (err_gg, err_sw)


class TestAnticipation:
    def test_budget_distinguishes_exploration_from_reobservation(self):
        """The anticipation budget must shrink the selected subgraph when the
        predicted future views LEAVE the mapped area (exploration) and grow
        it when they keep re-observing it (reference: the visible-count →
        [100,800]ms budget → estimateKFNum chain, Optimizer.cc:1011-1131)."""
        from gf_orb_slam2_tpu.config import (
            CameraConfig, CapacityConfig, SystemConfig,
        )
        from gf_orb_slam2_tpu.selection.anticipation import (
            anticipated_subgraph_size,
        )
        from gf_orb_slam2_tpu.slammap.store import MapStore

        cfg = SystemConfig(camera=CameraConfig(
            fx=450.0, fy=450.0, cx=320.0, cy=240.0, bf=45.0))
        cap = CapacityConfig(max_map_points=4096, max_keyframes=8)
        store = MapStore(cap, 64)
        rng = np.random.default_rng(0)
        # map: points straight ahead of the identity pose, 4-12 m out
        pts = np.stack([rng.uniform(-2, 2, 1500), rng.uniform(-1.5, 1.5, 1500),
                        rng.uniform(4, 12, 1500)], -1).astype(np.float32)
        k = store.add_keyframe(
            np.eye(3, dtype=np.float32), np.zeros(3, np.float32),
            np.zeros((64, 2), np.float32), np.zeros(64, np.int32),
            np.zeros(64, np.float32), np.zeros((64, 8), np.uint32),
            np.full(64, -1.0, np.float32), np.full(64, -1.0, np.float32),
            np.ones(64, bool))
        store.add_points_batch(pts[:64], np.zeros((64, 8), np.uint32), k, k,
                               np.arange(64))
        store.point_pos[64:64 + len(pts) - 64] = pts[64:]
        store.point_valid[: len(pts)] = True
        R0 = np.eye(3, dtype=np.float32)
        t0 = np.zeros(3, np.float32)
        # re-observation: hold still (velocity = identity)
        V_hold = np.eye(4, dtype=np.float32)
        # exploration: fast yaw turning the camera away from the map
        from gf_orb_slam2_tpu.geometry import lie
        Ry, _ = lie.se3_exp(jnp.asarray([0, 0, 0, 0.0, 0.35, 0.0], jnp.float32))
        V_turn = np.eye(4, dtype=np.float32)
        V_turn[:3, :3] = np.asarray(Ry)
        n_reobs = anticipated_subgraph_size(store, cfg, R0, t0, V_hold)
        n_explore = anticipated_subgraph_size(store, cfg, R0, t0, V_turn)
        assert n_reobs > n_explore, (n_reobs, n_explore)
        gg = cfg.good_graph
        # anticipated sizes are clipped to the pool, and the selection scan
        # bound now equals the pool — the full [2, max_pool] range is
        # reachable with no silent truncation (ADVICE r2 low#3)
        assert 2 <= n_explore < n_reobs <= gg.max_pool
        assert n_reobs > 30, "re-observation budget must exceed the old cap"
