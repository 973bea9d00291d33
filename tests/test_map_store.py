"""MapStore lifecycle unit tests (reference: Map/KeyFrame/MapPoint semantics)."""
import numpy as np

from gf_orb_slam2_tpu.config import CapacityConfig
from gf_orb_slam2_tpu.slammap.store import MapStore

N = 64


def make_store():
    cap = CapacityConfig(max_keypoints=N, max_map_points=500, max_keyframes=20,
                         max_obs_per_point=8)
    return MapStore(cap, N)


def add_kf(s, n_kp=N):
    rng = np.random.default_rng(s.n_keyframes)
    return s.add_keyframe(
        np.eye(3, dtype=np.float32), np.zeros(3, np.float32),
        rng.uniform(0, 640, (N, 2)).astype(np.float32),
        np.zeros(N, np.int32), np.zeros(N, np.float32),
        rng.integers(0, 2**32, (N, 8), dtype=np.uint32),
        np.full(N, -1.0, np.float32), np.full(N, -1.0, np.float32),
        np.ones(N, bool),
    )


class TestPointLifecycle:
    def test_add_observe_erase(self):
        s = make_store()
        k0, k1 = add_kf(s), add_kf(s)
        p = s.add_point([0, 0, 5], np.zeros(8, np.uint32), first_kf=k0)
        s.add_observation(p, k0, 3)
        s.add_observation(p, k1, 7)
        assert s.point_nobs[p] == 2
        assert s.kf_point[k0, 3] == p and s.kf_point[k1, 7] == p
        s.erase_point(p)
        assert not s.point_valid[p]
        assert s.kf_point[k0, 3] == -1 and s.kf_point[k1, 7] == -1
        assert s.n_points == 0

    def test_remove_observation_erases_orphan(self):
        s = make_store()
        k0 = add_kf(s)
        p = s.add_point([0, 0, 5], np.zeros(8, np.uint32))
        s.add_observation(p, k0, 0)
        s.remove_observation(p, k0)
        assert not s.point_valid[p]  # 0 observations → erased

    def test_replace_transfers_observations(self):
        s = make_store()
        k0, k1 = add_kf(s), add_kf(s)
        a = s.add_point([0, 0, 5], np.zeros(8, np.uint32))
        b = s.add_point([0, 0, 5.01], np.ones(8, np.uint32))
        s.add_observation(a, k0, 1)
        s.add_observation(b, k1, 2)
        s.replace_point(a, b)
        assert not s.point_valid[a]
        assert s.point_replaced_by[a] == b
        assert s.kf_point[k0, 1] == b  # observation transferred
        ids = s.resolve_replaced(np.asarray([a], np.int32))
        assert ids[0] == b

    def test_slot_reuse_after_erase(self):
        s = make_store()
        ids = [s.add_point([0, 0, float(i + 1)], np.zeros(8, np.uint32)) for i in range(10)]
        for p in ids[:5]:
            s.erase_point(p)
        new = [s.add_point([1, 1, 2.0], np.zeros(8, np.uint32)) for _ in range(5)]
        assert len(set(new) & set(ids[5:])) == 0  # no collision with live points


class TestKeyFrameLifecycle:
    def test_covisibility_and_spanning_tree(self):
        s = make_store()
        k0, k1 = add_kf(s), add_kf(s)
        # 20 shared points (>= threshold 15)
        for i in range(20):
            p = s.add_point([0, 0, 5], np.zeros(8, np.uint32))
            s.add_observation(p, k0, i)
            s.add_observation(p, k1, i)
        s.update_connections(k1)
        assert s.covis[k1, k0] == 20
        assert s.kf_parent[k1] == k0
        assert list(s.covisible_kfs(k1)) == [k0]

    def test_covis_below_threshold_keeps_best(self):
        s = make_store()
        k0, k1 = add_kf(s), add_kf(s)
        for i in range(5):  # below threshold 15
            p = s.add_point([0, 0, 5], np.zeros(8, np.uint32))
            s.add_observation(p, k0, i)
            s.add_observation(p, k1, i)
        s.update_connections(k1)
        # single best edge kept even under threshold (reference :632)
        assert s.covis[k1, k0] == 5

    def test_erase_keyframe_detaches(self):
        s = make_store()
        k0, k1, k2 = add_kf(s), add_kf(s), add_kf(s)
        for i in range(16):
            p = s.add_point([0, 0, 5], np.zeros(8, np.uint32))
            s.add_observation(p, k0, i)
            s.add_observation(p, k1, i)
            s.add_observation(p, k2, i)
        s.update_connections(k1)
        s.update_connections(k2)
        assert s.kf_parent[k2] == k0  # earlier best-covis
        s.erase_keyframe(k1)
        assert not s.kf_valid[k1]
        assert (s.covis[k1] == 0).all()
        # points survive with 2 observations
        assert (s.point_nobs[s.valid_point_ids()] == 2).all()
