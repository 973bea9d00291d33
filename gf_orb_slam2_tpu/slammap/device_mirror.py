"""Device-resident mirror of the map-point arrays.

The streaming tracker's per-frame candidate pool used to ship ~310 KB of
gathered point data (pos/normal/dists/desc) over the relay every frame. The
mirror keeps those arrays ON DEVICE (full capacity, ~2.6 MB) and the frame
upload carries only pool INDICES; the stream step gathers on device.

Host writes (triangulation, BA, fusion, loop corrections) mark points dirty;
`sync()` ships one packed delta buffer and scatters it in a tiny jitted
update program. This realizes the SURVEY §2.3-P8 design: device-resident
SoA map owned by a host coordinator, versioned snapshots instead of locks —
a dispatched step keeps whichever snapshot it was given; `sync` swaps the
array references atomically (GIL) for subsequent dispatches.

Reference parity note: the reference shares MapPoint objects between
threads under per-object mutexes (MapPoint.h); the mirror is the TPU-native
equivalent with relaxed (snapshot) consistency — stale pool entries are
re-validated host-side at frame completion (tracker.stream_complete).
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from gf_orb_slam2_tpu.utils.packing import Layout

# delta-size buckets (points per sync) to bound recompilation
_BUCKETS = (256, 1024, 4096, 16384)


class DeviceMapMirror:
    FIELDS = ("pos", "normal", "mind", "maxd", "desc")

    def __init__(self, store):
        self.store = store
        P = store.cap.max_map_points
        self.P = P
        self.dirty = np.zeros(P, bool)
        with store.lock:
            self.arrays = jax.device_put(dict(
                pos=store.point_pos.copy(), normal=store.point_normal.copy(),
                mind=store.point_min_dist.copy(),
                maxd=store.point_max_dist.copy(),
                desc=store.point_desc.copy(),
            ))
        self._layouts = {}
        self._jits = {}

    def mark(self, ids):
        ids = np.asarray(ids)
        if ids.size:
            self.dirty[ids[ids >= 0]] = True

    def _bucket(self, n: int) -> int:
        for b in _BUCKETS:
            if n <= b:
                return b
        return self.P

    def sync(self):
        """Ship dirty points to the device as one packed buffer. The
        read-and-clear of the dirty mask and the host gather run under the
        store lock (the async mapping worker marks concurrently)."""
        if not self.dirty.any():
            return
        s = self.store
        with s.lock:
            ids = np.nonzero(self.dirty)[0]
            if ids.size == 0:
                return
            self.dirty[ids] = False
            D = self._bucket(ids.size)
            if D == self.P:
                # full refresh is cheaper than a capacity-sized scatter
                self.arrays = jax.device_put(dict(
                    pos=s.point_pos.copy(), normal=s.point_normal.copy(),
                    mind=s.point_min_dist.copy(),
                    maxd=s.point_max_dist.copy(), desc=s.point_desc.copy(),
                ))
                return
            host = dict(
                ids=ids,
                pos=s.point_pos[ids], normal=s.point_normal[ids],
                mind=s.point_min_dist[ids], maxd=s.point_max_dist[ids],
                desc=s.point_desc[ids],
            )
        if D not in self._layouts:
            self._layouts[D] = Layout([
                ("ids", (D,), "i32"),
                ("pos", (D, 3), "f32"), ("normal", (D, 3), "f32"),
                ("mind", (D,), "f32"), ("maxd", (D,), "f32"),
                ("desc", (D, 8), "u32"),
            ])
            lay = self._layouts[D]

            def update(arrays, buf):
                u = lay.unpack_jnp(buf)
                idx = u["ids"]
                ok = idx >= 0
                idc = jnp.maximum(idx, 0)

                def scat(cur, new):
                    mask = ok.reshape((-1,) + (1,) * (new.ndim - 1))
                    merged = jnp.where(mask, new,
                                       cur[idc].astype(new.dtype))
                    return cur.at[idc].set(merged.astype(cur.dtype))

                return {k: scat(arrays[k], u[k]) for k in self.FIELDS}

            self._jits[D] = jax.jit(update)
        lay = self._layouts[D]

        def padf(a, fill=0):
            out = np.full((D,) + a.shape[1:], fill, a.dtype)
            out[: a.shape[0]] = a
            return out

        buf = lay.pack_np(dict(
            ids=padf(host["ids"].astype(np.int32), -1),
            pos=padf(host["pos"]), normal=padf(host["normal"]),
            mind=padf(host["mind"]), maxd=padf(host["maxd"]),
            desc=padf(host["desc"]),
        ))
        self.arrays = self._jits[D](self.arrays, jax.device_put(buf))


# keyframe-row delta buckets (rows per sync)
_KF_BUCKETS = (1, 4, 16, 64)


class DeviceKFMirror:
    """Device-resident mirror of the keyframe FEATURE arrays (pose, keypoints,
    descriptors). The mapper's triangulation and fusion programs used to ship
    ~2-3 MB of gathered KF data over the relay per keyframe event; with the
    mirror they upload only KF indices + masks and gather on device.

    Two delta granularities: full rows (new keyframes — ~50 KB each) and
    pose-only updates (local BA / loop corrections — 48 B each). Same
    snapshot semantics as DeviceMapMirror.
    """

    FIELDS = ("R", "t", "uv", "oct", "desc", "ur", "kpv")

    def __init__(self, store):
        self.store = store
        K, N = store.cap.max_keyframes, store.n_kp
        self.K, self.N = K, N
        self.dirty_row = np.zeros(K, bool)
        self.dirty_pose = np.zeros(K, bool)
        with store.lock:
            self.arrays = jax.device_put(dict(
                R=store.kf_R.copy(), t=store.kf_t.copy(),
                uv=store.kf_uv.copy(),
                oct=store.kf_octave.copy(), desc=store.kf_desc.copy(),
                ur=store.kf_u_right.copy(), kpv=store.kf_kp_valid.copy(),
            ))
        self._row_layouts = {}
        self._row_jits = {}
        self._pose_jit = None

    def mark_row(self, k):
        self.dirty_row[k] = True

    def mark_pose(self, k):
        self.dirty_pose[k] = True

    def _bucket(self, n: int) -> int:
        for b in _KF_BUCKETS:
            if n <= b:
                return b
        return self.K

    def sync(self):
        s = self.store
        with s.lock:
            rows = np.nonzero(self.dirty_row)[0]
            poses = np.nonzero(self.dirty_pose & ~self.dirty_row)[0]
            self.dirty_row[:] = False
            self.dirty_pose[:] = False
            if rows.size:
                self._sync_rows(rows)
            if poses.size:
                self._sync_poses(poses)

    def _sync_poses(self, ids):
        s = self.store
        if self._pose_jit is None:
            def upd(arrays, ids, R, t):
                ok = ids >= 0
                idc = jnp.maximum(ids, 0)
                out = dict(arrays)
                out["R"] = arrays["R"].at[idc].set(
                    jnp.where(ok[:, None, None], R, arrays["R"][idc]))
                out["t"] = arrays["t"].at[idc].set(
                    jnp.where(ok[:, None], t, arrays["t"][idc]))
                return out

            self._pose_jit = jax.jit(upd)
        D = self._bucket(ids.size)

        def padf(a, fill=0):
            out = np.full((D,) + a.shape[1:], fill, a.dtype)
            out[: a.shape[0]] = a
            return out

        dev = jax.device_put((padf(ids.astype(np.int32), -1),
                              padf(s.kf_R[ids]), padf(s.kf_t[ids])))
        self.arrays = self._pose_jit(self.arrays, *dev)

    def _sync_rows(self, ids):
        s = self.store
        D = self._bucket(ids.size)
        if D == self.K:
            self.arrays = jax.device_put(dict(
                R=s.kf_R.copy(), t=s.kf_t.copy(), uv=s.kf_uv.copy(),
                oct=s.kf_octave.copy(), desc=s.kf_desc.copy(),
                ur=s.kf_u_right.copy(), kpv=s.kf_kp_valid.copy(),
            ))
            return
        N = self.N
        if D not in self._row_layouts:
            lay = Layout([
                ("ids", (D,), "i32"), ("R", (D, 3, 3), "f32"),
                ("t", (D, 3), "f32"), ("uv", (D, N, 2), "f32"),
                ("oct", (D, N), "i32"), ("desc", (D, N, 8), "u32"),
                ("ur", (D, N), "f32"), ("kpv", (D, N), "bool"),
            ])
            self._row_layouts[D] = lay

            def update(arrays, buf):
                u = lay.unpack_jnp(buf)
                idx = u["ids"]
                ok = idx >= 0
                idc = jnp.maximum(idx, 0)

                def scat(cur, new):
                    mask = ok.reshape((-1,) + (1,) * (new.ndim - 1))
                    merged = jnp.where(mask, new.astype(cur.dtype), cur[idc])
                    return cur.at[idc].set(merged)

                return {k: scat(arrays[k], u[k]) for k in self.FIELDS}

            self._row_jits[D] = jax.jit(update)
        lay = self._row_layouts[D]

        def padf(a, fill=0):
            out = np.full((D,) + a.shape[1:], fill, a.dtype)
            out[: a.shape[0]] = a
            return out

        buf = lay.pack_np(dict(
            ids=padf(ids.astype(np.int32), -1),
            R=padf(s.kf_R[ids]), t=padf(s.kf_t[ids]), uv=padf(s.kf_uv[ids]),
            oct=padf(s.kf_octave[ids]), desc=padf(s.kf_desc[ids]),
            ur=padf(s.kf_u_right[ids]), kpv=padf(s.kf_kp_valid[ids]),
        ))
        self.arrays = self._row_jits[D](self.arrays, jax.device_put(buf))
