"""RGB-D end-to-end: depth-map frontend through tracking + mapping."""
import numpy as np

from gf_orb_slam2_tpu.config import (
    CameraConfig, CapacityConfig, ORBConfig, Sensor, SystemConfig,
)
from gf_orb_slam2_tpu.system import System


def render_rgbd(n_frames=14, h=480, w=640, fx=450.0, z=5.0, step=0.02):
    """Textured slanted plane + its depth map; camera translates laterally."""
    import cv2

    rng = np.random.default_rng(0)
    tex = rng.uniform(0, 255, (h // 6, (w + 200) // 6)).astype(np.float32)
    tex = cv2.resize(tex, ((w + 200), h), interpolation=cv2.INTER_CUBIC)
    tex += cv2.resize(
        rng.uniform(-60, 60, (h // 2, (w + 200) // 2)).astype(np.float32),
        ((w + 200), h), interpolation=cv2.INTER_CUBIC)
    tex = np.clip(tex, 0, 255)
    ys = np.arange(h)[:, None]
    depth = (z + 0.002 * (ys - h / 2)) * np.ones((h, w), np.float32)  # slanted
    frames = []
    for i in range(n_frames):
        dx = fx * (i * step) / z
        M = np.float32([[1, 0, -dx], [0, 1, 0]])
        img = cv2.warpAffine(tex, M, (w, h))
        frames.append((img, depth * 5000.0))  # TUM-style scaled uint16 depth
    return frames


class TestRGBD:
    def test_rgbd_sequence(self):
        cam = CameraConfig(fx=450.0, fy=450.0, cx=320.0, cy=240.0, bf=45.0,
                           th_depth=60.0, depth_map_factor=5000.0)
        cfg = SystemConfig(
            sensor=Sensor.RGBD, camera=cam,
            orb=ORBConfig(n_features=500),
            capacity=CapacityConfig(max_keypoints=512, max_map_points=20000,
                                    max_keyframes=100, max_local_points=2048),
        )
        sys_ = System(cfg)
        for i, (img, depth) in enumerate(render_rgbd()):
            sys_.track_rgbd(img, depth, i / 20.0)
        states = [s.state for s in sys_.tracker.stats]
        assert states[0] == "OK", states   # stereo-style init from depth
        assert states.count("OK") >= 12, states
        assert sys_.store.n_points > 200
