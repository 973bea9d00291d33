"""ChArUco world-frame anchoring (reference: INIT_WITH_ARUCHO,
src/ChArUco.cc — the first frame's pose comes from a calibration board
instead of the identity)."""
import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from gf_orb_slam2_tpu.io.charuco import CharucoBoard, detect_board_pose


def _board_frame(h=480, w=640):
    board = CharucoBoard()
    b, _ = board.build()
    img = b.generateImage((600, 840))
    frame = np.full((h, w), 128, np.uint8)
    small = cv2.resize(img, (300, 420))
    frame[30:450, 170:470] = small
    return board, frame


def test_detect_board_pose():
    board, frame = _board_frame()
    K = np.array([[450.0, 0, 320], [0, 450, 240], [0, 0, 1]])
    out = detect_board_pose(frame, board, K, np.zeros(5))
    assert out is not None
    R, t = out
    np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-5)
    assert t[2] > 0  # board in front of the camera


def test_anchor_used_at_stereo_init():
    """The tracker's stereo initialization must adopt the board pose as the
    first keyframe pose when charuco.enabled (world anchored to the board)."""
    from gf_orb_slam2_tpu.config import (
        CameraConfig, CapacityConfig, CharucoConfig, ORBConfig, Sensor,
        SystemConfig,
    )
    from gf_orb_slam2_tpu.slammap.store import MapStore
    from gf_orb_slam2_tpu.tracking.frame import Frame
    from gf_orb_slam2_tpu.tracking.tracker import Tracker

    board, img = _board_frame()
    cam = CameraConfig(fx=450.0, fy=450.0, cx=320.0, cy=240.0, bf=45.0)
    cfg = SystemConfig(
        sensor=Sensor.STEREO, camera=cam, orb=ORBConfig(n_features=800),
        capacity=CapacityConfig(max_keypoints=1024, max_map_points=4000,
                                max_keyframes=10, max_local_points=512),
        charuco=CharucoConfig(enabled=True),
    )
    n_kp = 1024
    store = MapStore(cfg.capacity, n_kp)
    tracker = Tracker(cfg, store, n_kp, np.asarray(
        [1.2 ** i for i in range(8)], np.float32))
    rng = np.random.default_rng(0)
    frame = Frame(
        frame_id=0, timestamp=0.0,
        uv=rng.uniform(50, 400, (n_kp, 2)).astype(np.float32),
        octave=np.zeros(n_kp, np.int32),
        angle=np.zeros(n_kp, np.float32),
        desc=rng.integers(0, 2 ** 32, (n_kp, 8), dtype=np.uint32),
        response=np.ones(n_kp, np.float32),
        valid=np.ones(n_kp, bool),
        u_right=rng.uniform(40, 390, n_kp).astype(np.float32),
        depth=rng.uniform(2, 10, n_kp).astype(np.float32),
    )
    frame._raw_img = img
    assert tracker._stereo_initialization(frame)
    # pose must equal the detected board pose (board fronto-parallel → R≈I,
    # but t anchors to the board, NOT zeros)
    K = np.array([[450.0, 0, 320], [0, 450, 240], [0, 0, 1]])
    R_ref, t_ref = detect_board_pose(img, board, K, np.zeros(5))
    assert np.linalg.norm(t_ref) > 0.05
    np.testing.assert_allclose(frame.R, R_ref, atol=1e-4)
    np.testing.assert_allclose(frame.t, t_ref, atol=1e-4)
