"""Image-level end-to-end: rendered stereo sequence through the FULL
pipeline (ORB extraction → stereo matching → tracking → mapping). This is
the closest in-repo analogue of running a real dataset (reference validates
end-to-end only via ROS + rosbags, SURVEY.md §4)."""
import numpy as np
import pytest

from gf_orb_slam2_tpu.config import (
    CameraConfig, CapacityConfig, ORBConfig, Sensor, SystemConfig,
)
from gf_orb_slam2_tpu.system import System

from tests.synthetic import render_plane_sequence as render_sequence


@pytest.mark.slow
class TestImagePipeline:
    def test_rendered_stereo_sequence(self):
        cam = CameraConfig(fx=450.0, fy=450.0, cx=320.0, cy=240.0, bf=45.0,
                           th_depth=60.0)
        cfg = SystemConfig(
            sensor=Sensor.STEREO, camera=cam,
            orb=ORBConfig(n_features=500),
            capacity=CapacityConfig(max_keypoints=512, max_map_points=20000,
                                    max_keyframes=100, max_local_points=2048),
        )
        sys_ = System(cfg)
        frames = render_sequence(n_frames=16, step=0.02)
        for i, (l, r) in enumerate(frames):
            sys_.track_stereo(l, r, i / 20.0)
        states = [s.state for s in sys_.tracker.stats]
        assert states[0] == "OK", states  # initialized from stereo depth
        assert states.count("OK") >= 14, states
        # lateral camera motion at 0.02 m/frame, plane at 5 m: the estimated
        # camera x-translation should track it
        est_x = -float(sys_.tracker.last_frame.R.T @ sys_.tracker.last_frame.t @ np.array([1, 0, 0]))
        true_x = -0.02 * (len(frames) - 1)
        assert abs(est_x - abs(true_x) * np.sign(est_x)) < 0.05 or abs(abs(est_x) - abs(true_x)) < 0.05
