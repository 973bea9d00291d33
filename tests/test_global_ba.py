"""Global BA over a populated map store."""
import numpy as np

from gf_orb_slam2_tpu.optim.global_ba import global_bundle_adjustment
from gf_orb_slam2_tpu.tracking.tracker import TrackState

from tests.synthetic import SyntheticWorld, forward_trajectory, make_frame
from tests.test_system import make_system, N_KP


class TestGlobalBA:
    def test_reduces_injected_noise(self):
        sys_ = make_system()
        world = SyntheticWorld(6000, seed=17)
        gt = forward_trajectory(90, step=0.12)
        for i, (R, t) in enumerate(gt):
            f = make_frame(world, R, t, sys_.cfg.camera, i, n_kp=N_KP)
            sys_.track_frame(f)
        assert sys_.state == TrackState.OK
        s = sys_.store
        kfs = s.valid_kf_ids()
        assert kfs.size >= 3
        # perturb all non-anchor KF poses + points
        rng = np.random.default_rng(0)
        clean_t = s.kf_t[kfs].copy()
        for k in kfs[1:]:
            s.kf_t[k] += rng.normal(0, 0.03, 3).astype(np.float32)
        pts = s.valid_point_ids()
        clean_pts = s.point_pos[pts].copy()
        s.point_pos[pts] += rng.normal(0, 0.03, (pts.size, 3)).astype(np.float32)
        err_before = np.linalg.norm(s.kf_t[kfs] - clean_t, axis=-1).max()
        global_bundle_adjustment(s, sys_.cfg)
        err_after = np.linalg.norm(s.kf_t[kfs] - clean_t, axis=-1).max()
        assert err_after < 0.5 * err_before, (err_before, err_after)
        perr = np.linalg.norm(s.point_pos[pts] - clean_pts, axis=-1)
        assert np.median(perr) < 0.03
