"""Monocular end-to-end: init from two views, track, map via triangulation."""
import numpy as np

from gf_orb_slam2_tpu.config import (
    CameraConfig, CapacityConfig, ORBConfig, Sensor, SystemConfig,
)
from gf_orb_slam2_tpu.system import System
from gf_orb_slam2_tpu.tracking.tracker import TrackState

from tests.synthetic import SyntheticWorld, make_frame
from gf_orb_slam2_tpu.geometry import lie
import jax.numpy as jnp

N_KP = 512


def make_mono_system():
    cam = CameraConfig(fx=450.0, fy=450.0, cx=320.0, cy=240.0, bf=0.0)
    cap = CapacityConfig(max_keypoints=N_KP, max_map_points=20000,
                         max_keyframes=200, max_local_points=2048)
    return System(SystemConfig(sensor=Sensor.MONOCULAR, camera=cam, capacity=cap,
                               orb=ORBConfig(n_features=N_KP)))


def lateral_trajectory(n, step=0.05):
    """Sideways motion gives parallax for mono init."""
    poses = []
    for i in range(n):
        R = np.eye(3, dtype=np.float32)
        t = np.array([-i * step, 0, 0], np.float32)  # t = -R C, C = (i*step,0,0)
        poses.append((R, t))
    return poses


def mono_frame(world, R, t, cam, i):
    f = make_frame(world, R, t, cam, i, n_kp=N_KP)
    f.u_right[:] = -1.0
    f.depth[:] = -1.0
    return f


class TestMonoTracking:
    def test_initializes_and_tracks(self):
        sys_ = make_mono_system()
        world = SyntheticWorld(6000, seed=11)
        gt = lateral_trajectory(30)
        states = []
        for i, (R, t) in enumerate(gt):
            f = mono_frame(world, R, t, sys_.cfg.camera, i)
            sys_.track_frame(f)
            states.append(sys_.state)
        assert TrackState.OK in states
        first_ok = states.index(TrackState.OK)
        assert first_ok <= 3
        assert all(s == TrackState.OK for s in states[first_ok:]), states
        assert sys_.store.n_points > 100
        # mono scale is free: check shape of trajectory up to scale
        # (camera moves along -x in its own convention)
        centers = []
        for k in sys_.store.valid_kf_ids():
            centers.append(sys_.store.kf_center(int(k)))
        centers = np.stack(centers)
        span = centers[-1] - centers[0]
        # dominantly x-motion
        assert abs(span[0]) > 5 * (abs(span[1]) + 1e-9)
        assert abs(span[0]) > 5 * (abs(span[2]) + 1e-9)
