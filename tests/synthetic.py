"""Synthetic SLAM world: stable landmarks with descriptors + pose trajectory.

Feature-level test harness (bypasses the image pipeline): world points carry
stable 256-bit descriptors; frames are built by projecting the world under a
ground-truth pose, adding pixel noise and descriptor bit noise. Lets us
measure ATE against ground truth without dataset downloads — the end-to-end
gate the reference lacks in-repo (SURVEY.md §4 implication (d)).
"""
from __future__ import annotations

import numpy as np

from gf_orb_slam2_tpu.config import CameraConfig
from gf_orb_slam2_tpu.tracking.frame import Frame


class SyntheticWorld:
    def __init__(self, n_points=3000, seed=0, extent=(30.0, 4.0, 3.0)):
        rng = np.random.default_rng(seed)
        self.rng = rng
        # corridor along +z with points on the walls/ceiling
        zs = rng.uniform(0, extent[0], n_points)
        xs = rng.uniform(-extent[1] / 2, extent[1] / 2, n_points)
        ys = rng.uniform(-extent[2] / 2, extent[2] / 2, n_points)
        self.points = np.stack([xs, ys, zs], -1).astype(np.float32)
        self.desc = rng.integers(0, 2**32, (n_points, 8), dtype=np.uint32)
        # stable per-point saliency: detectors are repeatable, so each frame
        # "detects" the same strongest landmarks rather than a random subset
        self.saliency = rng.uniform(0.0, 1.0, n_points).astype(np.float32)
        # canonical scale distance: observed octave = log_1.2(d0 / dist).
        # d0 ≈ the distance at first sight (like a real detector: a feature
        # enters at octave ~0-2 and climbs levels as the camera approaches)
        self.d0 = np.maximum(
            2.0, zs * rng.uniform(0.9, 1.4, n_points)
        ).astype(np.float32)

    def noisy_desc(self, ids, bits=4):
        d = self.desc[ids].copy()
        for r in range(len(ids)):
            for b in self.rng.choice(256, bits, replace=False):
                d[r, b // 32] ^= np.uint32(1 << (b % 32))
        return d


def forward_trajectory(n_frames, step=0.12, yaw_rate=0.002):
    """Ground-truth camera poses (world→cam R, t): forward motion along +z
    with a slow yaw. Returns list of (R, t)."""
    poses = []
    pos = np.zeros(3)
    yaw = 0.0
    for i in range(n_frames):
        c, s = np.cos(yaw), np.sin(yaw)
        Rwc = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float32)
        R = Rwc.T
        t = (-R @ pos).astype(np.float32)
        poses.append((R.astype(np.float32), t))
        pos = pos + Rwc @ np.array([0, 0, step])
        yaw += yaw_rate
    return poses


def make_frame(
    world: SyntheticWorld, R, t, cam: CameraConfig, frame_id, n_kp=1024,
    noise_px=0.3, desc_bits=4, timestamp=None, min_z=0.5, max_z=25.0,
    drop_rate=0.05,
):
    """Render a Frame from the world under ground-truth pose (R, t)."""
    rng = world.rng
    pc = world.points @ R.T + t
    z = pc[:, 2]
    u = cam.fx * pc[:, 0] / np.maximum(z, 1e-6) + cam.cx
    v = cam.fy * pc[:, 1] / np.maximum(z, 1e-6) + cam.cy
    vis = (z > min_z) & (z < max_z) & (u >= 20) & (u < cam.width - 20) & (v >= 20) & (v < cam.height - 20)
    vis &= rng.random(len(z)) > drop_rate
    ids = np.nonzero(vis)[0]
    if ids.size > n_kp:
        ids = ids[np.argsort(-world.saliency[ids], kind="stable")[:n_kp]]
    n = ids.size
    order = rng.permutation(n)
    ids = ids[order]
    octave = np.clip(
        np.round(np.log(world.d0[ids] / np.maximum(z[ids], 0.3)) / np.log(1.2)), 0, 7
    ).astype(np.int32)
    # localization noise scales with detection octave (as in real pyramids),
    # which is exactly the per-octave sigma2 model the estimator assumes
    sig = noise_px * 1.2 ** octave
    uv = np.stack([u[ids], v[ids]], -1) + rng.normal(0, 1.0, (n, 2)) * sig[:, None]
    depth = z[ids].astype(np.float32)
    u_right = uv[:, 0] - cam.bf / depth + rng.normal(0, 1.0, n) * sig

    uv_p = np.zeros((n_kp, 2), np.float32)
    uv_p[:n] = uv
    depth_p = np.full(n_kp, -1.0, np.float32)
    depth_p[:n] = depth
    ur_p = np.full(n_kp, -1.0, np.float32)
    ur_p[:n] = u_right
    desc_p = np.zeros((n_kp, 8), np.uint32)
    desc_p[:n] = world.noisy_desc(ids, desc_bits)
    valid = np.zeros(n_kp, bool)
    valid[:n] = True
    oct_p = np.zeros(n_kp, np.int32)
    oct_p[:n] = octave
    f = Frame(
        frame_id=frame_id,
        timestamp=float(frame_id) / 20.0 if timestamp is None else timestamp,
        uv=uv_p,
        octave=oct_p,
        angle=np.zeros(n_kp, np.float32),
        desc=desc_p,
        response=np.ones(n_kp, np.float32),
        u_right=ur_p,
        depth=depth_p,
        valid=valid,
    )
    f.gt_ids = np.full(n_kp, -1, np.int64)
    f.gt_ids[:n] = ids
    return f


def ate_rmse(est_poses, gt_poses):
    """ATE on camera centers (stereo → no scale alignment needed)."""
    est_c = np.stack([-R.T @ t for R, t in est_poses])
    gt_c = np.stack([-R.T @ t for R, t in gt_poses])
    return float(np.sqrt(np.mean(np.sum((est_c - gt_c) ** 2, -1))))


def render_plane_sequence(n_frames=24, h=480, w=640, fx=450.0, bf=45.0,
                          z=5.0, step=0.02):
    """Textured fronto-parallel plane at depth z; the camera translates
    laterally at `step` m/frame. The right image is the left shifted by the
    constant disparity bf/z. (Image-pipeline smoke-test scene — the headline
    bench uses the ray-cast 6-DoF room in tests/rendered_world.py.)"""
    import cv2

    rng = np.random.default_rng(0)
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
        dx = fx * (i * step) / z
        M = np.float32([[1, 0, -dx], [0, 1, 0]])
        left = cv2.warpAffine(tex, M, (w, h))
        Mr = np.float32([[1, 0, -dx - disp], [0, 1, 0]])
        right = cv2.warpAffine(tex, Mr, (w, h))
        frames.append((left, right))
    return frames
