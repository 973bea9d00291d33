"""Loop closing on a REAL-texture rendered revisit.

The VERDICT-§3 acceptance test: a closed circular trajectory in the
ray-cast room (real reference-image textures) must (a) detect the loop on
revisit, (b) fuse duplicate landmarks (SearchAndFuse), and (c) end with a
consistent map — measured as ATE not degrading versus the loop-disabled
run of the same sequence (drift on this short loop is small, so the gate is
detection + fusion + no-harm rather than a large ATE delta)."""
import dataclasses

import numpy as np
import pytest

pytest.importorskip("cv2")

from tests.rendered_world import RoomWorld, trajectory_loop

from gf_orb_slam2_tpu.config import (
    CameraConfig, CapacityConfig, LoopClosingConfig, ORBConfig, Sensor,
    SystemConfig,
)
from gf_orb_slam2_tpu.io.evaluation import ate_rmse
from gf_orb_slam2_tpu.system import System

FX = FY = 450.0
CX, CY = 320.0, 240.0
BASELINE = 0.1
BF = FX * BASELINE
N_FRAMES = 140


_FRAMES_CACHE = {}


def _rendered_frames():
    """Render the circuit ONCE per process; both the loop-on and loop-off
    arms consume the same frames (the render is ~2/3 of each arm's cost)."""
    if "frames" not in _FRAMES_CACHE:
        world = RoomWorld(width=9.0, height=5.0, length=14.0)
        poses = trajectory_loop(N_FRAMES, radius=2.2, center=(0.0, 0.0, 7.0),
                                loops=1.27)
        frames = [
            world.render_stereo(R_cw, t_cw, baseline=BASELINE,
                                fx=FX, fy=FY, cx=CX, cy=CY)
            for R_cw, t_cw in poses
        ]
        _FRAMES_CACHE["frames"] = frames
        _FRAMES_CACHE["poses"] = poses
    return _FRAMES_CACHE["poses"], _FRAMES_CACHE["frames"]


def _run(loop_enabled: bool):
    poses, frames = _rendered_frames()
    cam = CameraConfig(fx=FX, fy=FY, cx=CX, cy=CY, bf=BF, th_depth=40.0)
    cfg = SystemConfig(
        sensor=Sensor.STEREO, camera=cam, orb=ORBConfig(n_features=800),
        capacity=CapacityConfig(max_keypoints=1024, max_map_points=30000,
                                max_keyframes=160, max_local_points=2048),
        # synchronous GBA: the post-correction full BA runs inline, so the
        # result does not depend on host load (detached-GBA write-back timing
        # made this gate flaky: 0.10 m solo vs 0.12 m under full-suite load)
        loop=LoopClosingConfig(enabled=loop_enabled, synchronous_gba=True),
    )
    slam = System(cfg)
    gt = {}
    for i, ((R_cw, t_cw), (l, r)) in enumerate(zip(poses, frames)):
        slam.track_stereo(l, r, i / 20.0)
        gt[i / 20.0] = -R_cw.T @ t_cw
    slam.shutdown()
    # evaluate the RECOMPOSED trajectory (T_rel × corrected ref-KF pose) —
    # this is what the reference's SaveTrajectoryTUM emits (System.cc:591):
    # loop/BA corrections propagate retroactively to every frame
    from gf_orb_slam2_tpu.io.trajectory import recompose_trajectory

    est, g = [], []
    for ts, T_cw in recompose_trajectory(slam.tracker.relative_poses,
                                         slam.store):
        est.append(-T_cw[:3, :3].T @ T_cw[:3, 3])
        g.append(gt[ts])
    return ate_rmse(np.stack(est), np.stack(g)), slam


def test_loop_detected_fused_and_consistent():
    ate_on, slam = _run(loop_enabled=True)
    # (a) the revisit must be detected and corrected
    stats = [] if slam.loop_closer is None else slam.loop_closer.stats
    corrected = [s for s in stats if s.corrected]
    assert corrected, "no loop closure fired on a closed circular revisit"
    # (b) SearchAndFuse must deduplicate landmarks
    assert sum(s.n_fused for s in corrected) > 0, "no landmarks fused"
    # (c) the corrected (recomposed) trajectory stays accurate. Measured on
    # this sequence: loop OFF ≈ 0.19 m, loop ON ≈ 0.10 m (the correction
    # halves the drift); the residual is the stereo triangulation noise
    # floor at baseline 0.1 m / depths to ~9 m, not uncorrected drift — more
    # pose-graph/GBA iterations leave it unchanged. Gate at 0.12 to absorb
    # detached-GBA timing variance while still requiring the correction to
    # have fired and worked (loop-off fails this gate by ~60%).
    assert ate_on < 0.12, f"ATE with loop closing {ate_on:.3f} m"
    # (d) control arm (VERDICT r3 #4): the same frames with loop closing OFF
    # must drift MORE — the no-harm/improvement property the docstring
    # promises, asserted rather than recorded as a comment
    ate_off, _ = _run(loop_enabled=False)
    assert ate_on < ate_off, (
        f"loop closing must not degrade ATE: on={ate_on:.3f} off={ate_off:.3f}")
