"""Time the System's actual jitted device programs on the real TPU.

Uses the K-iteration data-dependent fold (see profile_frontend.py) to
amortize the ~30 ms relay round-trip. Run from repo root.
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=12)
    args = ap.parse_args()
    K = args.iters

    sys.argv = [sys.argv[0]]
    import bench

    frames, _ = bench.render_sequence()
    frames = frames[:24]

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
    for i in range(16):
        slam.track_stereo(frames[i][0], frames[i][1], i / 20.0)
    print("state:", slam.state.name)

    # ---- time the fused stereo frontend program
    imgs = jnp.asarray(np.stack([frames[16][0], frames[16][1]]))
    impl = slam._frontend_stereo_impl

    @jax.jit
    def fe_prog(ims):
        def body(_, carry):
            ims_, acc = carry
            out = impl(ims_)
            s = jnp.sum(out[0][:, 0]) * 1e-9 + jnp.sum(out[7]) * 1e-12
            return (ims_ + 0.0 * s, acc + s)

        _, acc = jax.lax.fori_loop(0, K, body, (imgs, jnp.float32(0.0)))
        return acc

    r = fe_prog(imgs); jax.device_get(r)
    t0 = time.perf_counter(); r = fe_prog(imgs); jax.device_get(r)
    print(f"frontend_stereo  {1e3 * (time.perf_counter() - t0) / K:8.2f} ms/iter")

    # ---- time the fused track program with realistic shapes
    tr = slam.tracker
    lf = tr.last_frame
    s = slam.store
    pool_ids, loc_dev = tr._cached_pool
    ids = s.resolve_replaced(lf.mp_ids)
    rows = ids >= 0
    pt_pos = np.zeros((tr.n_kp, 3), np.float32)
    pt_desc = np.zeros((tr.n_kp, 8), np.uint32)
    pt_pos[rows] = s.point_pos[ids[rows]]
    pt_desc[rows] = s.point_desc[ids[rows]]
    R0, t0_ = tr._predict_pose()
    kp = tr._frame_dev(lf)
    dev_in = jax.device_put((R0, t0_, lf.R, lf.t, pt_pos,
                             lf.octave.astype(np.int32), rows, pt_desc))

    impl_track = tr._fused_track_impl

    @jax.jit
    def tr_prog(R0_, t0__, Ri, ti, ppos, poct, pval, pdesc):
        def body(_, carry):
            (R0c, acc) = carry
            out = impl_track(
                R0c, t0__, Ri, ti, ppos, poct, pval, pdesc,
                *[jnp.asarray(x) for x in loc_dev],
                kp[0], kp[1], kp[2], kp[3], kp[4],
                jnp.float32(7.0), jnp.float32(1.0), jnp.int32(0),
            )
            res_m, kp_row_m, res_l, kp_row_l, kp_row_add, n_vis = out
            sc = jnp.sum(res_l.t) * 1e-9
            return (R0c + 0.0 * sc, acc + sc)

        _, acc = jax.lax.fori_loop(0, K, body, (R0_, jnp.float32(0.0)))
        return acc

    r = tr_prog(*dev_in); jax.device_get(r)
    t0 = time.perf_counter(); r = tr_prog(*dev_in); jax.device_get(r)
    print(f"fused_track      {1e3 * (time.perf_counter() - t0) / K:8.2f} ms/iter")


if __name__ == "__main__":
    main()
