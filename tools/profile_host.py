"""Host-side profile of the end-to-end tracking loop (cProfile).

Separates numpy/bookkeeping host time from device waits (device_get shows up
as jax blocking calls). Run from the repo root: python tools/profile_host.py
"""
from __future__ import annotations

import cProfile
import os
import pstats
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    sys.argv = [sys.argv[0]]
    import bench

    frames, _ = bench.render_sequence()
    frames = frames[:40]

    from gf_orb_slam2_tpu.config import (
        CameraConfig, CapacityConfig, ORBConfig, Sensor, SystemConfig,
    )
    from gf_orb_slam2_tpu.system import System

    cam = CameraConfig(fx=450.0, fy=450.0, cx=320.0, cy=240.0, bf=45.0,
                       th_depth=60.0)
    cfg = SystemConfig(
        sensor=Sensor.STEREO,
        camera=cam,
        orb=ORBConfig(n_features=800),
        capacity=CapacityConfig(max_keypoints=1024, max_map_points=40000,
                                max_keyframes=300, max_local_points=4096),
    )
    slam = System(cfg)
    # warm up: first frames compile / initialize
    for i in range(8):
        slam.track_stereo(frames[i][0], frames[i][1], i / 20.0)

    prof = cProfile.Profile()
    t0 = time.perf_counter()
    prof.enable()
    for i in range(8, len(frames)):
        slam.track_stereo(frames[i][0], frames[i][1], i / 20.0)
    prof.disable()
    t1 = time.perf_counter()
    n = len(frames) - 8
    print(f"\n== {n} frames, {1e3 * (t1 - t0) / n:.1f} ms/frame ==\n")
    st = pstats.Stats(prof)
    st.sort_stats("cumulative")
    st.print_stats(35)
    print("\n== by self time ==\n")
    st.sort_stats("tottime")
    st.print_stats(25)


if __name__ == "__main__":
    main()
