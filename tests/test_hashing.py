"""Multi-index hashing tests (native C++ lib via ctypes)."""
import dataclasses

import numpy as np
import pytest

from gf_orb_slam2_tpu.config import HashingConfig, LocalMapMode, TrackingConfig
from gf_orb_slam2_tpu.hashing.mih import MultiIndexHashing


def flip_bits(rng, desc, k):
    out = desc.copy()
    for i in range(len(out)):
        for b in rng.choice(256, k, replace=False):
            out[i, b // 32] ^= np.uint32(1 << (b % 32))
    return out


class TestMIH:
    def make(self, **kw):
        cfg = HashingConfig(enabled=True, **kw)
        return MultiIndexHashing(cfg, max_points=10000), cfg

    def test_insert_query_exact(self):
        mih, _ = self.make()
        rng = np.random.default_rng(0)
        desc = rng.integers(0, 2**32, (500, 8), dtype=np.uint32)
        ids = np.arange(500, dtype=np.int32)
        mih.insert(desc, ids)
        got = mih.query(desc[:50])
        assert np.isin(np.arange(50), got).mean() == 1.0

    def test_query_with_bit_noise(self):
        """MIH guarantees retrieval when some 8-bit substring is exact: with
        4 flipped bits over 32 substrings, ≥1 of the 8 active tables is very
        likely clean (reference ICRA19 premise)."""
        mih, _ = self.make()
        rng = np.random.default_rng(1)
        desc = rng.integers(0, 2**32, (500, 8), dtype=np.uint32)
        mih.insert(desc, np.arange(500, dtype=np.int32))
        noisy = flip_bits(rng, desc[:100], 4)
        got = mih.query(noisy)
        recall = np.isin(np.arange(100), got).mean()
        assert recall > 0.85, recall

    def test_erase(self):
        mih, _ = self.make()
        rng = np.random.default_rng(2)
        desc = rng.integers(0, 2**32, (10, 8), dtype=np.uint32)
        mih.insert(desc, np.arange(10, dtype=np.int32))
        mih.erase(3)
        got = mih.query(desc)
        assert 3 not in got

    def test_bucket_bound(self):
        """Identical substrings cannot grow a bucket beyond the cap."""
        mih, cfg = self.make(max_bucket_size=5)
        desc = np.zeros((100, 8), np.uint32)  # all collide in every table
        mih.insert(desc, np.arange(100, dtype=np.int32))
        got = mih.query(desc[:1], max_out=1000)
        assert len(got) <= 5 * cfg.n_active_tables

    def test_candidate_budget_controller(self):
        mih, _ = self.make()
        b0 = mih.candidate_budget
        mih.update_dynamics(n_candidates_used=b0 * 2)
        assert mih.candidate_budget < b0
        for _ in range(5):
            mih.update_dynamics(n_candidates_used=10)
        assert mih.candidate_budget > b0 * 0.9


class TestHashingIntegration:
    def test_tracking_with_hash_local_map(self):
        from gf_orb_slam2_tpu.config import (
            CameraConfig, CapacityConfig, ORBConfig, Sensor, SystemConfig,
        )
        from gf_orb_slam2_tpu.system import System
        from tests.synthetic import SyntheticWorld, forward_trajectory, make_frame

        N_KP = 512
        cam = CameraConfig(fx=450.0, fy=450.0, cx=320.0, cy=240.0, bf=45.0)
        cfg = SystemConfig(
            sensor=Sensor.STEREO, camera=cam,
            capacity=CapacityConfig(max_keypoints=N_KP, max_map_points=20000,
                                    max_keyframes=200, max_local_points=2048),
            orb=ORBConfig(n_features=N_KP),
            hashing=HashingConfig(enabled=True, map_size_trigger=100),
            tracking=TrackingConfig(local_map_mode=LocalMapMode.COMBINED),
        )
        sys_ = System(cfg)
        world = SyntheticWorld(6000, seed=31)
        gt = forward_trajectory(25, step=0.1)
        for i, (R, t) in enumerate(gt):
            f = make_frame(world, R, t, cfg.camera, i, n_kp=N_KP)
            sys_.track_frame(f)
        states = [s.state for s in sys_.tracker.stats]
        assert states[1:].count("OK") >= 23, states


def test_ots_utility_selection_large_map():
    """Reference OTS parity (Tracking.cc:3111): table activation follows
    RETRIEVAL UTILITY from actual matches, not just load; the candidate
    budget controller reacts to oversized retrievals. Exercised past the
    2000-point hashing trigger."""
    import numpy as np

    from gf_orb_slam2_tpu.config import HashingConfig
    from gf_orb_slam2_tpu.hashing.mih import MultiIndexHashing

    rng = np.random.default_rng(0)
    cfg = HashingConfig(enabled=True)
    mih = MultiIndexHashing(cfg, 8192)
    P = 4096  # > map_size_trigger
    desc = rng.integers(0, 2 ** 32, (P, 8), dtype=np.uint32)
    mih.insert(desc, np.arange(P, dtype=np.int32))
    # matches whose descriptors agree with the stored points ONLY in the
    # substrings of tables 0..3 (others corrupted): utility concentrates
    q = desc[:256].copy()
    qb = q.view(np.uint8).reshape(256, 32)
    qb[:, 4:] = rng.integers(0, 256, (256, 28), dtype=np.uint8)  # keep t0..t3
    for _ in range(5):
        mih.update_query_scores(q, desc[:256])
    mih.update_table_selection()
    assert set(range(4)) <= set(int(t) for t in mih.active_tables), (
        mih.active_tables)
    # budget controller: oversized retrieval shrinks, small grows
    b0 = mih.candidate_budget
    mih.update_dynamics(100000)
    assert mih.candidate_budget < b0
    mih.update_dynamics(0)
    assert mih.candidate_budget > b0 * 0.9 * 0.99
    # query still returns candidates from the active tables
    out = mih.query(desc[:64])
    assert out.size > 0
