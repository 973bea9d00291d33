"""Map checkpoint round-trip + localization against a loaded map
(reference: test/test_MapIO.cpp + README localization-mode workflow)."""
import numpy as np

from gf_orb_slam2_tpu.tracking.tracker import TrackState

from tests.synthetic import SyntheticWorld, forward_trajectory, make_frame
from tests.test_system import make_system, N_KP


class TestMapIO:
    def test_roundtrip_and_localization(self, tmp_path):
        sys_ = make_system()
        world = SyntheticWorld(6000, seed=21)
        gt = forward_trajectory(30, step=0.1)
        for i, (R, t) in enumerate(gt[:20]):
            f = make_frame(world, R, t, sys_.cfg.camera, i, n_kp=N_KP)
            sys_.track_frame(f)
        assert sys_.state == TrackState.OK
        n_pts = sys_.store.n_points
        n_kfs = sys_.store.n_keyframes
        path = tmp_path / "map.npz"
        sys_.save_map(path)

        # fresh system: load map, localization-only, relocalize and track
        sys2 = make_system()
        sys2.load_map(path)
        sys2.activate_localization_mode()
        assert sys2.store.n_points == n_pts
        assert sys2.store.n_keyframes == n_kfs
        np.testing.assert_allclose(sys2.store.kf_R, sys_.store.kf_R)
        ok = 0
        for i, (R, t) in enumerate(gt[18:28], start=100):
            f = make_frame(world, R, t, sys2.cfg.camera, i, n_kp=N_KP)
            sys2.track_frame(f)
            if sys2.state == TrackState.OK:
                ok += 1
                terr = np.linalg.norm((-f.R.T @ f.t) - (-R.T @ t))
                assert terr < 0.1, terr
        assert ok >= 8
        assert sys2.store.n_keyframes == n_kfs  # localization mode adds no KFs
