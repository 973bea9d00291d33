"""Smoke test for the examples/ CLI harness (VERDICT r3 #6).

Writes a rendered mini-sequence to disk in EuRoC ASL layout, drives
`examples/run_stereo.py --format euroc` as a SUBPROCESS (the exact
command a user runs the moment real data exists), then scores its
trajectory with `examples/eval_ate.py` — proving the whole offline
evaluation chain (dataset reader → System → TUM writer → ATE evaluator →
EuRoC-CSV ground-truth ingestion) end to end.

Reference practice this mirrors: batch_scripts/Run_Robot_Stereo.py:16-40
(subprocess-driven per-sequence runs + saved-trajectory inspection).
"""
import json
import os
import subprocess
import sys

import numpy as np
import pytest

pytest.importorskip("cv2")

FX = FY = 450.0
CX, CY = 320.0, 240.0
BASELINE = 0.1
BF = FX * BASELINE
N = 36

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _quat_wxyz(R):
    w = np.sqrt(max(0.0, 1.0 + R[0, 0] + R[1, 1] + R[2, 2])) / 2.0
    if w < 1e-8:
        return np.array([1.0, 0, 0, 0])
    return np.array([
        w,
        (R[2, 1] - R[1, 2]) / (4 * w),
        (R[0, 2] - R[2, 0]) / (4 * w),
        (R[1, 0] - R[0, 1]) / (4 * w),
    ])


@pytest.mark.slow
def test_run_stereo_euroc_then_eval_ate(tmp_path):
    import cv2

    from tests.rendered_world import RoomWorld, trajectory_arc

    world = RoomWorld(width=9.0, height=5.0, length=13.0)
    poses = trajectory_arc(N, radius=0.8, advance=1.5)

    # ---- EuRoC ASL layout
    seq = tmp_path / "seq"
    cam0 = seq / "mav0" / "cam0"
    cam1 = seq / "mav0" / "cam1"
    gt_dir = seq / "mav0" / "state_groundtruth_estimate0"
    (cam0 / "data").mkdir(parents=True)
    (cam1 / "data").mkdir(parents=True)
    gt_dir.mkdir(parents=True)
    rows0, rows1, gt_rows = [], [], []
    for i, (R_cw, t_cw) in enumerate(poses):
        l, r = world.render_stereo(R_cw, t_cw, baseline=BASELINE,
                                   fx=FX, fy=FY, cx=CX, cy=CY)
        ts_ns = int((1.0 + i / 20.0) * 1e9)
        name = f"{ts_ns}.png"
        cv2.imwrite(str(cam0 / "data" / name), np.clip(l, 0, 255).astype(np.uint8))
        cv2.imwrite(str(cam1 / "data" / name), np.clip(r, 0, 255).astype(np.uint8))
        rows0.append(f"{ts_ns},{name}")
        R_wc = R_cw.T
        c = -R_cw.T @ t_cw
        q = _quat_wxyz(R_wc)
        gt_rows.append(
            f"{ts_ns},{c[0]},{c[1]},{c[2]},{q[0]},{q[1]},{q[2]},{q[3]}"
            ",0,0,0,0,0,0,0,0,0")
    (cam0 / "data.csv").write_text(
        "#timestamp [ns],filename\n" + "\n".join(rows0) + "\n")
    (cam1 / "data.csv").write_text(
        "#timestamp [ns],filename\n" + "\n".join(rows0) + "\n")
    (gt_dir / "data.csv").write_text(
        "#timestamp, p_RS_R_x [m], ...\n" + "\n".join(gt_rows) + "\n")

    # ---- settings YAML for the rendered pinhole rig (no distortion)
    settings = tmp_path / "rendered.yaml"
    settings.write_text(
        "Sensor: STEREO\n"
        f"Camera.fx: {FX}\nCamera.fy: {FY}\n"
        f"Camera.cx: {CX}\nCamera.cy: {CY}\n"
        "Camera.width: 640\nCamera.height: 480\n"
        f"Camera.bf: {BF}\nCamera.fps: 20.0\nThDepth: 40.0\n"
        "ORBextractor.nFeatures: 500\n"
    )

    env = dict(os.environ, JAX_PLATFORMS="cpu")
    out_dir = tmp_path / "out"
    run = subprocess.run(
        [sys.executable, os.path.join(REPO, "examples", "run_stereo.py"),
         "--format", "euroc", "--data", str(seq),
         "--settings", str(settings), "--out", str(out_dir)],
        capture_output=True, text=True, env=env, cwd=REPO, timeout=1500,
    )
    assert run.returncode == 0, run.stdout[-2000:] + run.stderr[-2000:]
    summary = json.loads(run.stdout.strip().splitlines()[-1])
    assert summary["frames"] == N
    assert summary["keyframes"] >= 1
    traj = out_dir / "trajectory_tum.txt"
    assert traj.exists() and len(traj.read_text().splitlines()) > N // 2
    assert (out_dir / "trajectory_kitti.txt").exists()
    assert (out_dir / "tracking_log.jsonl").exists()

    ev = subprocess.run(
        [sys.executable, os.path.join(REPO, "examples", "eval_ate.py"),
         str(traj), str(gt_dir / "data.csv"), "--max-dt", "0.03"],
        capture_output=True, text=True, env=env, cwd=REPO, timeout=600,
    )
    assert ev.returncode == 0, ev.stdout[-2000:] + ev.stderr[-2000:]
    metrics = json.loads(ev.stdout.strip().splitlines()[-1])
    assert "ate_rmse" in metrics and np.isfinite(metrics["ate_rmse"])
    # a 2.7 m rendered arc tracked at stereo noise floor: comfortably <25 cm
    assert metrics["ate_rmse"] < 0.25, metrics
