"""Loop-closing tests: vocabulary, KF database retrieval, end-to-end loop."""
import numpy as np
import pytest

from gf_orb_slam2_tpu.config import (
    CameraConfig, CapacityConfig, ORBConfig, Sensor, SystemConfig,
)
from gf_orb_slam2_tpu.place.vocabulary import Vocabulary
from gf_orb_slam2_tpu.system import System

from tests.synthetic import SyntheticWorld, make_frame
from gf_orb_slam2_tpu.geometry import lie
import jax.numpy as jnp

N_KP = 512


class TestVocabulary:
    def test_train_transform_roundtrip(self):
        rng = np.random.default_rng(0)
        descs = rng.integers(0, 2**32, (2000, 8), dtype=np.uint32)
        voc = Vocabulary.train(descs, k=6, levels=2, iters=3)
        assert voc.V == 36
        w = voc.words_np(descs[:100])
        assert w.shape == (100,) and w.max() < 36
        # same descriptor → same word; near descriptor → usually same word
        w2 = voc.words_np(descs[:100])
        np.testing.assert_array_equal(w, w2)

    def test_bow_similarity_ranks_same_scene_higher(self):
        rng = np.random.default_rng(1)
        base = rng.integers(0, 2**32, (3000, 8), dtype=np.uint32)
        voc = Vocabulary.train(base[:2000], k=8, levels=2, iters=3)
        scene_a = base[:300]
        # scene_a2: same descriptors with a few bit flips
        scene_a2 = scene_a.copy()
        flips = rng.integers(0, 2**8, scene_a2.shape, dtype=np.uint32)
        scene_a2 ^= (flips & np.uint32(3))
        scene_b = base[1000:1300]
        va = voc.bow_vector(scene_a)
        va2 = voc.bow_vector(scene_a2)
        vb = voc.bow_vector(scene_b)
        assert va @ va2 > va @ vb + 0.1

    def test_save_load(self, tmp_path):
        rng = np.random.default_rng(2)
        descs = rng.integers(0, 2**32, (1000, 8), dtype=np.uint32)
        voc = Vocabulary.train(descs, k=5, levels=2, iters=2)
        p = tmp_path / "voc.npz"
        voc.save(p)
        voc2 = Vocabulary.load(p)
        np.testing.assert_array_equal(voc.words_np(descs[:50]), voc2.words_np(descs[:50]))


def loop_trajectory(n, radius=6.0):
    """Circle in the x-z plane, camera looking outward; returns to start."""
    poses = []
    for i in range(n):
        ang = 2 * np.pi * i / n
        Rwc = np.asarray(lie.so3_exp(jnp.asarray([0.0, ang, 0.0])), np.float32)
        C = np.array([radius * np.sin(ang), 0.0, radius * (1 - np.cos(ang))], np.float32)
        R = Rwc.T
        t = (-R @ C).astype(np.float32)
        poses.append((R, t))
    return poses


class TestLoopClosingE2E:
    @pytest.mark.slow
    def test_loop_detected_and_corrected(self):
        cam = CameraConfig(fx=450.0, fy=450.0, cx=320.0, cy=240.0, bf=45.0, th_depth=40.0)
        cap = CapacityConfig(max_keypoints=N_KP, max_map_points=40000,
                             max_keyframes=300, max_local_points=2048)
        cfg = SystemConfig(sensor=Sensor.STEREO, camera=cam, capacity=cap,
                           orb=ORBConfig(n_features=N_KP))
        sys_ = System(cfg)
        # world: ring of landmarks around the circular path
        world = SyntheticWorld(12000, seed=13, extent=(1.0, 1.0, 1.0))
        rng = np.random.default_rng(13)
        n_pts = world.points.shape[0]
        ang = rng.uniform(0, 2 * np.pi, n_pts)
        r = rng.uniform(9, 16, n_pts)
        world.points = np.stack(
            [r * np.sin(ang), rng.uniform(-3, 3, n_pts), 6.0 - r * np.cos(ang) + 6.0], -1
        ).astype(np.float32)
        world.d0 = np.maximum(2.0, rng.uniform(4, 12, n_pts)).astype(np.float32)
        gt = loop_trajectory(260)
        states = []
        for i, (R, t) in enumerate(gt):
            f = make_frame(world, R, t, cfg.camera, i, n_kp=N_KP, max_z=30.0)
            sys_.track_frame(f)
            states.append(sys_.state.name)
        ok_frac = states.count("OK") / len(states)
        assert ok_frac > 0.9, states
        # place recognition became active
        assert sys_.voc is not None and sys_.loop_closer is not None
