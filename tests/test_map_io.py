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


def test_keypoint_yaml_roundtrip(tmp_path):
    """Reference parity: Frame::ExportToYML / KeyPointLog (Frame.cc:514)."""
    import numpy as np

    from gf_orb_slam2_tpu.io.keypoints import (
        load_keypoints_yaml, save_keypoints_yaml,
    )

    class F:
        frame_id = 7
        timestamp = 1.25
        uv = np.asarray([[10.5, 20.25], [30.0, 40.0]], np.float32)
        octave = np.asarray([0, 2], np.int32)
        angle = np.asarray([0.1, -1.2], np.float32)
        response = np.asarray([12.0, 9.5], np.float32)
        u_right = np.asarray([8.0, -1.0], np.float32)
        depth = np.asarray([5.5, -1.0], np.float32)
        valid = np.asarray([True, True])

    p = tmp_path / "kp.yaml"
    save_keypoints_yaml(p, F)
    out = load_keypoints_yaml(p)
    assert out["frame_id"] == 7
    np.testing.assert_allclose(out["uv"], F.uv, atol=1e-3)
    np.testing.assert_allclose(out["depth"], F.depth, atol=1e-3)
    assert (out["octave"] == F.octave).all()
