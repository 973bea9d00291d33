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


@pytest.mark.slow
class TestAsyncMapping:
    """tracking.async_mapping=True: local mapping + loop closing run on the
    background worker (the reference's LocalMapping/LoopClosing threads,
    System.cc:113-124) while pipelined frames stay in flight."""

    def make_async_system(self):
        from gf_orb_slam2_tpu.config import TrackingConfig

        cam = CameraConfig(fx=450.0, fy=450.0, cx=320.0, cy=240.0, bf=45.0,
                           th_depth=60.0)
        cfg = SystemConfig(
            sensor=Sensor.STEREO, camera=cam,
            orb=ORBConfig(n_features=500),
            capacity=CapacityConfig(max_keypoints=512, max_map_points=20000,
                                    max_keyframes=100, max_local_points=2048),
            tracking=TrackingConfig(async_mapping=True),
        )
        return System(cfg)

    def test_pipelined_with_async_mapping(self):
        """Pose continuity across KF events while mapping runs concurrently
        (VERDICT r3 #2: a streaming test WITH async_mapping=True)."""
        frames = render_sequence(n_frames=24, step=0.02)
        sys_ = self.make_async_system()
        results = {}
        for i, (l, r) in enumerate(frames):
            for fid, pose in sys_.track_stereo_pipelined(l, r, i / 20.0):
                results[fid] = pose
        for fid, pose in sys_.flush_pipeline():
            results[fid] = pose
        assert sorted(results) == list(range(len(frames)))
        # mapping actually ran in the background at least once
        assert sys_.mapper.stats, "no keyframe was mapped"
        centers = np.stack([-results[i][:3, :3].T @ results[i][:3, 3]
                            for i in range(len(frames))])
        assert np.isfinite(centers).all()
        # continuity: no pose jump across KF events (camera advances ~2 cm
        # per frame in this sequence)
        steps = np.linalg.norm(np.diff(centers, axis=0), axis=1)
        assert steps.max() < 0.1, steps
        sys_.shutdown()

    def test_async_kf_loop_reset_interleave(self):
        """Failure-mode interleave (VERDICT r3 #8, reference stop/finish/
        reset protocol LocalMapping.cc:743-946): keyframes queue to the
        worker, a reset lands while frames are in flight, tracking restarts —
        no crash, no NaN, consistent map."""
        frames = render_sequence(n_frames=20, step=0.02)
        sys_ = self.make_async_system()
        results = {}
        for i, (l, r) in enumerate(frames[:10]):
            for fid, pose in sys_.track_stereo_pipelined(l, r, i / 20.0):
                results[fid] = pose
        # reset with frames still in flight and KF work possibly queued
        sys_.reset()
        assert sys_.store.n_keyframes == 0
        for i, (l, r) in enumerate(frames[10:], start=10):
            for fid, pose in sys_.track_stereo_pipelined(l, r, i / 20.0):
                results[fid] = pose
        for fid, pose in sys_.flush_pipeline():
            results[fid] = pose
        # the post-reset frames all produced finite poses and the map rebuilt
        post = [results[i] for i in range(10, 20) if i in results]
        assert len(post) == 10
        assert all(np.isfinite(p).all() for p in post)
        assert sys_.store.n_keyframes >= 1
        s = sys_.store
        kfs = s.valid_kf_ids()
        assert np.isfinite(s.kf_R[kfs]).all() and np.isfinite(s.kf_t[kfs]).all()
        pv = s.point_valid
        assert np.isfinite(s.point_pos[pv]).all()
        sys_.shutdown()
