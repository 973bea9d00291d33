"""End-to-end System tests: tracking + local mapping + BA + trajectory IO."""
import os

import numpy as np
import pytest

from gf_orb_slam2_tpu.config import (
    CameraConfig, CapacityConfig, ORBConfig, Sensor, SystemConfig,
)
from gf_orb_slam2_tpu.system import System
from gf_orb_slam2_tpu.tracking.tracker import TrackState

from tests.synthetic import SyntheticWorld, forward_trajectory, make_frame, ate_rmse

N_KP = 512


def make_system():
    cam = CameraConfig(fx=450.0, fy=450.0, cx=320.0, cy=240.0, bf=45.0, th_depth=35.0)
    cap = CapacityConfig(
        max_keypoints=N_KP, max_map_points=20000, max_keyframes=200,
        max_local_points=2048,
    )
    cfg = SystemConfig(
        sensor=Sensor.STEREO, camera=cam, capacity=cap,
        orb=ORBConfig(n_features=N_KP),
    )
    return System(cfg)


class TestSystemStereo:
    def test_sequence_with_mapping(self):
        sys_ = make_system()
        world = SyntheticWorld(6000, seed=7)
        gt = forward_trajectory(60, step=0.1)
        est = []
        for i, (R, t) in enumerate(gt):
            f = make_frame(world, R, t, sys_.cfg.camera, i, n_kp=N_KP)
            sys_.track_frame(f)
            est.append((f.R.copy(), f.t.copy()))
        assert sys_.state == TrackState.OK
        err = ate_rmse(est[1:], gt[1:])
        assert err < 0.05, f"ATE {err}"
        # mapping ran: KFs inserted, new points triangulated/culled lifecycle
        assert sys_.store.n_keyframes >= 2
        assert sys_.store.n_points > 400

    def test_trajectory_io(self, tmp_path):
        sys_ = make_system()
        world = SyntheticWorld(6000, seed=8)
        gt = forward_trajectory(20, step=0.1)
        for i, (R, t) in enumerate(gt):
            f = make_frame(world, R, t, sys_.cfg.camera, i, n_kp=N_KP)
            sys_.track_frame(f)
        tum = tmp_path / "traj.txt"
        kitti = tmp_path / "traj_kitti.txt"
        kf = tmp_path / "kf.txt"
        sys_.save_trajectory_tum(tum)
        sys_.save_trajectory_kitti(kitti)
        sys_.save_keyframe_trajectory_tum(kf)
        rows = np.loadtxt(tum)
        assert rows.shape[1] == 8 and rows.shape[0] >= 18
        # recomposed trajectory ≈ ground truth centers (frame 0 included —
        # the initialization frame is tracked with identity pose)
        centers = rows[:, 1:4]
        gt_centers = np.stack([-R.T @ t for R, t in gt])
        n = min(len(centers), len(gt_centers))
        err = np.linalg.norm(centers[:n] - gt_centers[:n], axis=1)
        assert np.median(err) < 0.05
        krows = np.atleast_2d(np.loadtxt(kf))
        assert krows.shape[1] == 8
        kit = np.loadtxt(kitti)
        assert kit.shape[1] == 12

    def test_reset(self):
        sys_ = make_system()
        world = SyntheticWorld(6000, seed=9)
        gt = forward_trajectory(5, step=0.1)
        for i, (R, t) in enumerate(gt):
            f = make_frame(world, R, t, sys_.cfg.camera, i, n_kp=N_KP)
            sys_.track_frame(f)
        assert sys_.store.n_keyframes >= 1
        sys_.reset()
        assert sys_.store.n_keyframes == 0
        assert sys_.state == TrackState.NO_IMAGES_YET
        # can re-initialize after reset
        f = make_frame(world, *gt[0], sys_.cfg.camera, 99, n_kp=N_KP)
        sys_.track_frame(f)
        assert sys_.state == TrackState.OK

    def test_localization_only_mode(self):
        sys_ = make_system()
        world = SyntheticWorld(6000, seed=10)
        gt = forward_trajectory(30, step=0.1)
        for i, (R, t) in enumerate(gt[:15]):
            f = make_frame(world, R, t, sys_.cfg.camera, i, n_kp=N_KP)
            sys_.track_frame(f)
        n_kf = sys_.store.n_keyframes
        sys_.activate_localization_mode()
        for i, (R, t) in enumerate(gt[15:], start=15):
            f = make_frame(world, R, t, sys_.cfg.camera, i, n_kp=N_KP)
            sys_.track_frame(f)
        assert sys_.store.n_keyframes == n_kf  # no new KFs in localization mode
        assert sys_.state == TrackState.OK
