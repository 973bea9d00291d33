"""End-to-end tracking tests on the synthetic world (stereo)."""
import numpy as np
import pytest

from gf_orb_slam2_tpu.config import SystemConfig, CameraConfig, CapacityConfig, Sensor
from gf_orb_slam2_tpu.slammap.store import MapStore
from gf_orb_slam2_tpu.tracking.tracker import Tracker, TrackState

from tests.synthetic import SyntheticWorld, forward_trajectory, make_frame, ate_rmse

N_KP = 512


def make_cfg(**kw):
    from gf_orb_slam2_tpu.config import ORBConfig
    cam = CameraConfig(fx=450.0, fy=450.0, cx=320.0, cy=240.0, bf=45.0, th_depth=35.0)
    cap = CapacityConfig(max_keypoints=N_KP, max_map_points=20000, max_keyframes=200,
                         max_local_points=2048)
    return SystemConfig(sensor=Sensor.STEREO, camera=cam, capacity=cap,
                        orb=ORBConfig(n_features=N_KP), **kw)


def level_scales(n=8, s=1.2):
    return np.asarray([s ** i for i in range(n)], np.float32)


class TestStereoTracking:
    def run_sequence(self, n_frames=40, step=0.06, **frame_kw):
        cfg = make_cfg()
        store = MapStore(cfg.capacity, N_KP)
        tracker = Tracker(cfg, store, N_KP, level_scales())
        world = SyntheticWorld(6000, seed=3)
        gt = forward_trajectory(n_frames, step=step)
        est = []
        for i, (R, t) in enumerate(gt):
            f = make_frame(world, R, t, cfg.camera, i, n_kp=N_KP, **frame_kw)
            st = tracker.process_frame(f)
            est.append((f.R.copy(), f.t.copy()))
        return tracker, store, est, gt

    def test_initialization(self):
        cfg = make_cfg()
        store = MapStore(cfg.capacity, N_KP)
        tracker = Tracker(cfg, store, N_KP, level_scales())
        world = SyntheticWorld(4000, seed=1)
        (R, t), = forward_trajectory(1)
        f = make_frame(world, R, t, cfg.camera, 0, n_kp=N_KP)
        tracker.process_frame(f)
        assert tracker.state == TrackState.OK
        assert store.n_keyframes == 1
        assert store.n_points > 300

    def test_tracks_sequence_low_ate(self):
        tracker, store, est, gt = self.run_sequence(40)
        states = [s.state for s in tracker.stats]
        assert states[1:] == ["OK"] * 39, states
        err = ate_rmse(est[1:], gt[1:])
        assert err < 0.05, f"ATE {err}"
        assert store.n_keyframes >= 2  # KFs created as scene changes

    def test_map_reobserved(self):
        tracker, store, est, gt = self.run_sequence(15)
        # most tracked frames should have a healthy inlier count
        inl = [s.n_inliers for s in tracker.stats[1:]]
        assert min(inl) > 50, inl

    def test_velocity_model_used(self):
        tracker, store, est, gt = self.run_sequence(10)
        assert tracker.velocity is not None
        # motion-model matches should dominate after frame 2
        assert tracker.stats[3].n_motion_matches > 50

    def test_lost_on_blackout(self):
        cfg = make_cfg()
        store = MapStore(cfg.capacity, N_KP)
        tracker = Tracker(cfg, store, N_KP, level_scales())
        world = SyntheticWorld(4000, seed=5)
        gt = forward_trajectory(8)
        for i, (R, t) in enumerate(gt[:4]):
            f = make_frame(world, R, t, cfg.camera, i, n_kp=N_KP)
            tracker.process_frame(f)
        assert tracker.state == TrackState.OK
        # blackout: a frame with no valid features
        f = make_frame(world, *gt[4], cfg.camera, 4, n_kp=N_KP)
        f.valid[:] = False
        f.desc[:] = 0
        tracker.process_frame(f)
        assert tracker.state == TrackState.LOST
        # recovery on next good frame via reloc fallback
        f = make_frame(world, *gt[5], cfg.camera, 5, n_kp=N_KP)
        tracker.process_frame(f)
        assert tracker.state == TrackState.OK
