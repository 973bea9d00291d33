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
