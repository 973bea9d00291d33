"""Headline benchmark: end-to-end stereo tracking latency on TPU.

Measures the full image-in → pose-out pipeline (ORB pyramid extraction ×2,
stereo matching, motion-model tracking, local-map tracking with pose
optimization, KF/mapping when triggered) on a rendered synthetic stereo
sequence, and compares against the reference's best published number:
19.1 ms/frame CPU total tracking latency with all accelerations
(GF-ORB-SLAM2 README.md:15-17; see BASELINE.md).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
import json
import time

import numpy as np

BASELINE_MS = 19.1


def render_sequence(n_frames=60, h=480, w=640, fx=450.0, bf=45.0, z=5.0, step=0.02):
    """Textured plane at depth z; camera translates laterally. Right image is
    the left shifted by the constant disparity bf/z."""
    import cv2

    rng = np.random.default_rng(0)
    # fractal-ish texture with structure at several scales
    tex = rng.uniform(0, 255, (h // 8, (w + 200) // 8)).astype(np.float32)
    tex = cv2.resize(tex, ((w + 200), h), interpolation=cv2.INTER_CUBIC)
    tex += cv2.resize(
        rng.uniform(-60, 60, (h // 2, (w + 200) // 2)).astype(np.float32),
        ((w + 200), h), interpolation=cv2.INTER_CUBIC,
    )
    tex = np.clip(tex, 0, 255)
    disp = bf / z
    frames = []
    for i in range(n_frames):
        dx = fx * (i * step) / z  # pixel shift of the plane
        M = np.float32([[1, 0, -dx], [0, 1, 0]])
        left = cv2.warpAffine(tex, M, (w, h))
        Mr = np.float32([[1, 0, -dx - disp], [0, 1, 0]])
        right = cv2.warpAffine(tex, Mr, (w, h))
        frames.append((left, right))
    return frames


def main():
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
    sys_ = System(cfg)
    frames = render_sequence(n_frames=80)
    # Headline: SUSTAINED per-frame processing time of the streaming
    # pipelined tracker (track_stereo_pipelined) — the same quantity the
    # reference's 19.1 ms/frame measures (its tracking thread runs pipelined
    # against mapping/loop threads, SURVEY.md §6). Warmup frames compile +
    # fill the pipeline; sync-path latency is also recorded for reference.
    sync_times = []
    for i, (l, r) in enumerate(frames[:24]):
        t0 = time.perf_counter()
        sys_.track_stereo(l, r, i / 20.0)
        dt = (time.perf_counter() - t0) * 1e3
        if i >= 10:
            sync_times.append(dt)
    n_done = 0
    times = []
    for i, (l, r) in enumerate(frames[24:], start=24):
        t0 = time.perf_counter()
        n_done += len(sys_.track_stereo_pipelined(l, r, i / 20.0))
        dt = (time.perf_counter() - t0) * 1e3
        if i >= 28:  # pipeline filled + streaming programs compiled
            times.append(dt)
    sys_.flush_pipeline()
    med = float(np.median(times))
    print(json.dumps({
        "metric": "stereo_tracking_ms_per_frame",
        "value": round(med, 3),
        "unit": "ms/frame",
        "vs_baseline": round(BASELINE_MS / med, 3),
        "sync_latency_ms": round(float(np.median(sync_times)), 3),
    }))


if __name__ == "__main__":
    main()
