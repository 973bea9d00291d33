"""Wall-clock breakdown of the pipelined tracking loop on the real TPU:
complete (fetch-wait + bookkeeping) / prepare / upload / dispatch segments.
Run from repo root."""
from __future__ import annotations

import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

ACC = defaultdict(float)
CNT = defaultdict(int)


def main():
    sys.argv = [sys.argv[0]]
    import bench
    import jax

    frames = bench.render_sequence(n_frames=110)

    from gf_orb_slam2_tpu.config import (
        CameraConfig, CapacityConfig, ORBConfig, Sensor, SystemConfig,
    )
    from gf_orb_slam2_tpu.system import System, _to_u8

    cam = CameraConfig(fx=450.0, fy=450.0, cx=320.0, cy=240.0, bf=45.0,
                       th_depth=60.0)
    cfg = SystemConfig(
        sensor=Sensor.STEREO, camera=cam, orb=ORBConfig(n_features=800),
        capacity=CapacityConfig(max_keypoints=1024, max_map_points=40000,
                                max_keyframes=300, max_local_points=4096),
    )
    slam = System(cfg)
    for i in range(16):
        slam.track_stereo(frames[i][0], frames[i][1], i / 20.0)

    tr = slam.tracker
    n_meas = 0
    t_loop0 = None
    for i in range(16, len(frames)):
        l, r = frames[i]
        ts = i / 20.0
        if not tr.stream_ready():
            slam.flush_pipeline()
            slam.track_stereo(l, r, ts)
            continue
        if slam.store.mirror is None:
            from gf_orb_slam2_tpu.slammap.device_mirror import DeviceMapMirror

            slam.store.mirror = DeviceMapMirror(slam.store)
        if tr._chain is None:
            tr._chain = tr.stream_bootstrap_chain()
        t0 = time.perf_counter()
        kf_events = 0
        while len(slam._inflight) >= slam._pipeline_depth:
            frame, pool_ids = slam._inflight.popleft()
            tw0 = time.perf_counter()
            raw = slam._fetcher.get(frame.frame_id)
            tw1 = time.perf_counter()
            st = tr.stream_complete(frame, raw, pool_ids)
            tw2 = time.perf_counter()
            if st.created_kf:
                slam.mapper.process_keyframe(tr.ref_kf)
                kf_events += 1
            ACC["fetch_wait"] += tw1 - tw0
            ACC["bookkeeping"] += tw2 - tw1
            ACC["mapper"] += time.perf_counter() - tw2
        t1 = time.perf_counter()
        slam.store.mirror.sync()
        t1b = time.perf_counter()
        ACC["mirror_sync"] += t1b - t1 if i >= 24 else 0.0
        packed, pool_ids = tr.stream_prepare_upload(slam.frame_id)
        imgs = np.stack([_to_u8(l), _to_u8(r)])
        t2 = time.perf_counter()
        imgs_d, up_d = jax.device_put((imgs, packed))
        t3 = time.perf_counter()
        out = slam._get_frontend("stereo")(imgs_d)
        packed_out = tr.stream_dispatch(out, up_d)
        t4 = time.perf_counter()
        f = slam._make_frame(out, ts)
        if slam._fetcher is None:
            from gf_orb_slam2_tpu.system import _PipelineFetcher

            slam._fetcher = _PipelineFetcher()
        slam._fetcher.submit(f.frame_id, packed_out)
        slam._inflight.append((f, pool_ids))
        slam.frame_id += 1
        t5 = time.perf_counter()
        if i >= 24:
            if t_loop0 is None:
                t_loop0 = t0
            n_meas += 1
            ACC["total"] += t5 - t0
            ACC["complete_all"] += t1 - t0
            ACC["prepare+stack"] += t2 - t1b
            ACC["device_put"] += t3 - t2
            ACC["dispatch"] += t4 - t3
            ACC["frame+submit"] += t5 - t4
    slam.flush_pipeline()

    print(f"\n{n_meas} steady-state pipelined frames")
    for k in ["total", "complete_all", "fetch_wait", "bookkeeping", "mapper",
              "mirror_sync", "prepare+stack", "device_put", "dispatch",
              "frame+submit"]:
        print(f"  {k:16s} {1e3 * ACC[k] / max(n_meas, 1):8.2f} ms/frame")


if __name__ == "__main__":
    main()
