"""Relocalization under realistic failure on the rendered circuit
(VERDICT r4 missing #5 / next-round #8).

The reference regime (Tracking.cc:2615-2801 Relocalization): tracking is
LOST mid-sequence (occlusion/blackout), candidate keyframes come from the
KeyFrameDatabase by BoW similarity, EPnP RANSAC gives a pose hypothesis,
projection-guided refinement confirms it. Here: a 6-frame full blackout is
injected mid-circuit; the tracker must go LOST, then RELOCALIZE on the
next textured frames — without the system resetting the map — and finish
the tour at normal accuracy.
"""
import numpy as np
import pytest

pytest.importorskip("cv2")

from tests.test_loop_rendered import (  # noqa: E402  (shared render cache)
    BF, CX, CY, FX, FY, _rendered_frames,
)

from gf_orb_slam2_tpu.config import (
    CameraConfig, CapacityConfig, LoopClosingConfig, ORBConfig, Sensor,
    SystemConfig,
)
from gf_orb_slam2_tpu.io.evaluation import ate_rmse
from gf_orb_slam2_tpu.system import System
from gf_orb_slam2_tpu.tracking.tracker import TrackState

BLACKOUT = range(70, 76)


def test_blackout_lost_then_relocalize():
    poses, frames = _rendered_frames()
    cam = CameraConfig(fx=FX, fy=FY, cx=CX, cy=CY, bf=BF, th_depth=40.0)
    cfg = SystemConfig(
        sensor=Sensor.STEREO, camera=cam, orb=ORBConfig(n_features=800),
        capacity=CapacityConfig(max_keypoints=1024, max_map_points=30000,
                                max_keyframes=160, max_local_points=2048),
        # loop closing ON so the KeyFrameDatabase (reloc candidate source,
        # reference: KeyFrameDatabase::DetectRelocalizationCandidates) is live
        loop=LoopClosingConfig(enabled=True, synchronous_gba=True),
    )
    slam = System(cfg)
    black = np.zeros((480, 640), np.float32)
    states = []
    est, gt = {}, {}
    resets = 0
    kf_count_before = 0
    # after the blackout the camera REOPENS INSIDE MAPPED TERRITORY (the
    # pose it had 16 frames earlier): a camera that kept moving through the
    # dark exits past the mapped frontier, where relocalization is
    # information-theoretically impossible (nothing of the scene ahead was
    # ever mapped — verified: BoW candidates exist but PnP cannot confirm)
    REWIND = 16
    n_run = 110
    for i in range(n_run):
        src = i if i < BLACKOUT[0] else max(i - REWIND, 0)
        R_cw, t_cw = poses[src]
        left, right = frames[src]
        if i in BLACKOUT:
            if i == BLACKOUT[0]:
                kf_count_before = slam.store.n_keyframes
            slam.track_stereo(black, black, i / 20.0)
        else:
            T = slam.track_stereo(left, right, i / 20.0)
            if slam.state == TrackState.OK:
                est[i] = -T[:3, :3].T @ T[:3, 3]
                gt[i] = -R_cw.T @ t_cw
        states.append(slam.state)
        if slam.store.n_keyframes < kf_count_before and kf_count_before:
            resets += 1
    slam.shutdown()
    # (a) the blackout must actually break tracking
    assert TrackState.LOST in states[BLACKOUT[0]:BLACKOUT[-1] + 2], (
        "blackout did not cause LOST")
    # (b) recovery: tracking returns OK within 10 frames of light returning
    post = states[BLACKOUT[-1] + 1: BLACKOUT[-1] + 11]
    assert TrackState.OK in post, f"no relocalization: {post}"
    # (c) the map survived — reloc, not reset (reference: reset only fires
    # when reloc fails for max_lost_frames)
    assert resets == 0, "system reset instead of relocalizing"
    assert slam.store.n_keyframes >= kf_count_before
    # (d) post-recovery accuracy: the tail tracks at normal accuracy
    # against ground truth (reloc'd pose is metrically right)
    tail = [i for i in est if i > BLACKOUT[-1] + 4]
    assert len(tail) >= 25
    ate_tail = ate_rmse(np.stack([est[i] for i in tail]),
                        np.stack([gt[i] for i in tail]))
    assert ate_tail < 0.25, f"post-reloc tail ATE {ate_tail:.3f} m"
