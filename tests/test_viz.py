"""Visualization writers smoke tests."""
import numpy as np

from gf_orb_slam2_tpu.viz import visualizer

from tests.synthetic import SyntheticWorld, forward_trajectory, make_frame
from tests.test_system import make_system, N_KP


class TestViz:
    def test_frame_overlay_and_map_render(self, tmp_path):
        sys_ = make_system()
        world = SyntheticWorld(6000, seed=41)
        gt = forward_trajectory(8, step=0.1)
        f = None
        for i, (R, t) in enumerate(gt):
            f = make_frame(world, R, t, sys_.cfg.camera, i, n_kp=N_KP)
            sys_.track_frame(f)
        img = np.zeros((480, 640), np.uint8)
        out = visualizer.draw_frame(img, f)
        assert out.shape == (480, 640, 3)
        assert out.any()
        png = tmp_path / "map.png"
        visualizer.plot_map(sys_.store, png)
        assert png.exists() and png.stat().st_size > 1000
        ply = tmp_path / "map.ply"
        visualizer.export_ply(sys_.store, ply)
        head = ply.read_text().splitlines()
        assert head[0] == "ply"
        n = int(head[2].split()[-1])
        assert n > 100
