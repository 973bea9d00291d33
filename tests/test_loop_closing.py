"""Loop-closing tests: vocabulary, KF database retrieval, end-to-end loop."""
import numpy as np
import pytest

from gf_orb_slam2_tpu.config import (
    CameraConfig, CapacityConfig, LoopClosingConfig, ORBConfig, Sensor,
    SystemConfig,
)
from gf_orb_slam2_tpu.place.vocabulary import Vocabulary
from gf_orb_slam2_tpu.system import System

from tests.synthetic import SyntheticWorld, ate_rmse, make_frame
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


class TestDBoW2Format:
    """DBoW2-format vocabulary interop (reference:
    TemplatedVocabulary.h:1380 text / :1469 binary; SURVEY §7.1 — a real
    ORBvoc asset must drop in)."""

    def test_text_roundtrip_preserves_words(self, tmp_path):
        rng = np.random.default_rng(5)
        descs = rng.integers(0, 2**32, (3000, 8), dtype=np.uint32)
        voc = Vocabulary.train(descs, k=4, levels=3, iters=3)
        p = tmp_path / "voc_dbow2.txt"
        voc.save_dbow2_text(p)
        voc2 = Vocabulary.load_dbow2(p)
        assert voc2.k == voc.k and voc2.levels == voc.levels
        q = rng.integers(0, 2**32, (500, 8), dtype=np.uint32)
        np.testing.assert_array_equal(voc.words_np(q), voc2.words_np(q))
        np.testing.assert_allclose(voc2.idf, voc.idf, rtol=1e-5)

    def test_binary_roundtrip(self, tmp_path):
        import struct

        rng = np.random.default_rng(6)
        descs = rng.integers(0, 2**32, (2000, 8), dtype=np.uint32)
        voc = Vocabulary.train(descs, k=3, levels=2, iters=3)
        # write the fork's binary layout (TemplatedVocabulary.h:1516
        # saveToBinaryFile): parent i32, 32 desc bytes, weight f32, leaf u8
        nodes = []
        offsets = [1]
        for lvl in range(voc.levels):
            offsets.append(offsets[-1] + voc.centers[lvl].shape[0])
        for lvl in range(voc.levels):
            cents = voc.centers[lvl]
            leaf = lvl == voc.levels - 1
            for i in range(cents.shape[0]):
                parent = 0 if lvl == 0 else offsets[lvl - 1] + i // voc.k
                w = float(voc.idf[i]) if leaf else 0.0
                nodes.append(struct.pack("<i", parent)
                             + cents[i].tobytes()
                             + struct.pack("<f", w)
                             + struct.pack("<B", int(leaf)))
        p = tmp_path / "voc.bin"
        with open(p, "wb") as f:
            f.write(struct.pack("<IIiiii", len(nodes), 41, voc.k,
                                voc.levels, 0, 0))
            f.writelines(nodes)
        voc2 = Vocabulary.load_dbow2(str(p))
        q = rng.integers(0, 2**32, (300, 8), dtype=np.uint32)
        np.testing.assert_array_equal(voc.words_np(q), voc2.words_np(q))

    def test_incomplete_tree_with_early_leaf(self, tmp_path):
        """A DBoW2 tree where one interior node has fewer than k children
        and one branch terminates in a leaf above level L — both legal in
        DBoW2 files — must load and transform consistently."""
        k, L = 2, 2
        d = np.zeros((4, 32), np.uint8)
        d[0, 0] = 0x00            # node 1: left subtree center
        d[1, 0] = 0xFF            # node 2: EARLY LEAF (level 1)
        d[2, 0] = 0x03            # node 3: leaf under node 1
        # node 1's second child slot is missing (only one child)
        lines = [f"{k} {L} 0 0"]
        lines.append("0 0 " + " ".join(map(str, d[0])) + " 0.0")   # node 1
        lines.append("0 1 " + " ".join(map(str, d[1])) + " 2.5")   # node 2
        lines.append("1 1 " + " ".join(map(str, d[2])) + " 1.5")   # node 3
        p = tmp_path / "tiny.txt"
        p.write_text("\n".join(lines) + "\n")
        voc = Vocabulary.load_dbow2(str(p))
        assert voc.V == k ** L
        # a descriptor equal to the early leaf must land on a slot carrying
        # its weight; one equal to the deep leaf likewise
        q = np.zeros((2, 8), np.uint32)
        q[0] = d[1].view(np.uint32)
        q[1] = d[2].view(np.uint32)
        w = voc.words_np(q)
        assert voc.idf[w[0]] == 2.5
        assert voc.idf[w[1]] == 1.5


def loop_trajectory(n, radius=6.0, loops=1.0):
    """Circle in the x-z plane, camera looking outward. `loops` > 1 keeps
    going past the full circle so the revisit overlap spans several
    keyframes (a loop detection needs 3 consecutive consistent KFs —
    reference: LoopClosing.cc:216 mnCovisibilityConsistencyTh)."""
    poses = []
    for i in range(n):
        ang = 2 * np.pi * loops * i / n
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
                           orb=ORBConfig(n_features=N_KP),
                           loop=LoopClosingConfig(synchronous_gba=True))
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
        gt = loop_trajectory(330, loops=1.27)
        states = []
        est = []
        for i, (R, t) in enumerate(gt):
            f = make_frame(world, R, t, cfg.camera, i, n_kp=N_KP, max_z=30.0)
            sys_.track_frame(f)
            states.append(sys_.state.name)
            est.append((f.R.copy(), f.t.copy()))
        sys_.shutdown()
        ok_frac = states.count("OK") / len(states)
        assert ok_frac > 0.95, states
        # the revisit must be DETECTED, Sim3-verified, CORRECTED and FUSED
        # (reference behavior: LoopClosing.cc:125-606)
        assert sys_.loop_closer is not None
        corrected = [s for s in sys_.loop_closer.stats if s.corrected]
        assert corrected, "no loop closure fired on a circular revisit"
        assert corrected[0].n_sim3_inliers >= 20
        assert sum(s.n_fused for s in corrected) > 0, "no landmarks fused"
        # trajectory stays metrically consistent after the correction
        tail = slice(-40, None)
        ate_tail = ate_rmse(est[tail], gt[tail])
        assert ate_tail < 0.5, f"post-loop tail ATE {ate_tail:.3f} m"
