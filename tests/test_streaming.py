"""Streaming pipelined tracking (track_stereo_pipelined): device-chained
tracking state, results fetched `pipeline_depth` frames behind. Validates
against the synchronous path on the same rendered sequence."""
import numpy as np
import pytest

from gf_orb_slam2_tpu.config import (
    CameraConfig, CapacityConfig, ORBConfig, Sensor, SystemConfig,
)
from gf_orb_slam2_tpu.system import System

from tests.synthetic import render_plane_sequence as render_sequence


def make_system():
    cam = CameraConfig(fx=450.0, fy=450.0, cx=320.0, cy=240.0, bf=45.0,
                       th_depth=60.0)
    cfg = SystemConfig(
        sensor=Sensor.STEREO, camera=cam,
        orb=ORBConfig(n_features=500),
        capacity=CapacityConfig(max_keypoints=512, max_map_points=20000,
                                max_keyframes=100, max_local_points=2048),
    )
    return System(cfg)


@pytest.mark.slow
class TestStreamingPipeline:
    def test_pipelined_matches_sync(self):
        frames = render_sequence(n_frames=24, step=0.02)

        sys_p = make_system()
        results = {}
        for i, (l, r) in enumerate(frames):
            for fid, pose in sys_p.track_stereo_pipelined(l, r, i / 20.0):
                results[fid] = pose
        for fid, pose in sys_p.flush_pipeline():
            results[fid] = pose
        # every frame produced a pose exactly once
        assert sorted(results) == list(range(len(frames)))
        states = [s.state for s in sys_p.tracker.stats]
        assert states.count("OK") >= len(frames) - 2, states

        # poses track the sync path within a loose tolerance (the pipelined
        # pool is one frame staler; small divergence expected)
        sys_s = make_system()
        sync_poses = [sys_s.track_stereo(l, r, i / 20.0)
                      for i, (l, r) in enumerate(frames)]
        for i in range(2, len(frames)):
            dc = np.linalg.norm(
                (-results[i][:3, :3].T @ results[i][:3, 3])
                - (-sync_poses[i][:3, :3].T @ sync_poses[i][:3, 3]))
            assert dc < 0.05, (i, dc)

    def test_flush_midstream_then_continue(self):
        frames = render_sequence(n_frames=12, step=0.02)
        sys_ = make_system()
        results = {}
        for i, (l, r) in enumerate(frames[:8]):
            for fid, pose in sys_.track_stereo_pipelined(l, r, i / 20.0):
                results[fid] = pose
        for fid, pose in sys_.flush_pipeline():
            results[fid] = pose
        assert sorted(results) == list(range(8))
        # continue after a flush: pipeline re-bootstraps
        for i, (l, r) in enumerate(frames[8:], start=8):
            for fid, pose in sys_.track_stereo_pipelined(l, r, i / 20.0):
                results[fid] = pose
        for fid, pose in sys_.flush_pipeline():
            results[fid] = pose
        assert sorted(results) == list(range(12))
