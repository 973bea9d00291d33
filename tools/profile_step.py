"""Ablation timing of the fused tracking step's internals on the real TPU:
good-feature selection mode, pose-opt rounds, additional-match search.
K-iteration fori_loop amortizes the relay round trip."""
from __future__ import annotations

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def time_step(tracker, n_kp, L, K=16, label=""):
    rng = np.random.default_rng(0)
    args = dict(
        R0=jnp.eye(3), t0=jnp.zeros(3), R_init=jnp.eye(3), t_init=jnp.zeros(3),
        pt_pos=jnp.asarray(rng.uniform(-3, 3, (n_kp, 3)), jnp.float32),
        pt_oct=jnp.zeros(n_kp, jnp.int32),
        pt_valid=jnp.ones(n_kp, bool),
        pt_desc=jnp.asarray(rng.integers(0, 2**32, (n_kp, 8), dtype=np.uint32)),
        loc_pos=jnp.asarray(rng.uniform(-3, 3, (L, 3)), jnp.float32),
        loc_normal=jnp.tile(jnp.asarray([0.0, 0, 1]), (L, 1)),
        loc_mind=jnp.full(L, 0.1), loc_maxd=jnp.full(L, 100.0),
        loc_desc=jnp.asarray(rng.integers(0, 2**32, (L, 8), dtype=np.uint32)),
        loc_valid=jnp.ones(L, bool), loc_life=jnp.ones(L),
        kp_uv=jnp.asarray(rng.uniform(0, 600, (n_kp, 2)), jnp.float32),
        kp_oct=jnp.zeros(n_kp, jnp.int32),
        kp_ur=jnp.full(n_kp, -1.0), kp_valid=jnp.ones(n_kp, bool),
        kp_desc=jnp.asarray(rng.integers(0, 2**32, (n_kp, 8), dtype=np.uint32)),
        radius=jnp.float32(7.0), extra_radius=jnp.float32(1.0),
        seed=jnp.int32(3),
    )
    names = list(args)
    vals = tuple(args[k] for k in names)

    @jax.jit
    def prog(*a):
        d = dict(zip(names, a))

        def body(_, carry):
            acc, dd = carry
            out = tracker._fused_track_impl(**dd)
            s = out[0].t.sum() * 1e-9 + out[2].t.sum() * 1e-9
            dd = dict(dd, t0=dd["t0"] + 0.0 * s)
            return (acc + s, dd)

        acc, _ = jax.lax.fori_loop(0, K, body, (jnp.float32(0.0), d))
        return acc

    r = prog(*vals); jax.device_get(r)
    t0 = time.perf_counter(); r = prog(*vals); jax.device_get(r)
    dt = 1e3 * (time.perf_counter() - t0) / K
    print(f"  {label:44s} {dt:7.2f} ms/step", flush=True)
    return dt


def main():
    from gf_orb_slam2_tpu.config import (
        CapacityConfig, GFMatchingMode, ORBConfig, SystemConfig,
    )
    from gf_orb_slam2_tpu.slammap.store import MapStore
    from gf_orb_slam2_tpu.tracking.tracker import Tracker

    n_kp, L = 1024, 4096

    def make(gf=None, tr=None):
        cfg = SystemConfig(
            orb=ORBConfig(n_features=800),
            capacity=CapacityConfig(max_keypoints=n_kp, max_map_points=4096,
                                    max_keyframes=16, max_local_points=L),
        )
        if gf:
            cfg = cfg.replace(good_feature=dataclasses.replace(cfg.good_feature, **gf))
        if tr:
            cfg = cfg.replace(tracking=dataclasses.replace(cfg.tracking, **tr))
        store = MapStore(cfg.capacity, n_kp)
        scales = 1.2 ** np.arange(8)
        return Tracker(cfg, store, n_kp, scales.astype(np.float32))

    print("fused step ablations (n_kp=1024, L=4096):")
    time_step(make(), n_kp, L, label="baseline (GOOD_FEATURE, 4x10 LM, addsearch)")
    time_step(make(gf=dict(matching_mode=GFMatchingMode.ALL)), n_kp, L,
              label="selection=ALL (no greedy)")
    time_step(make(gf=dict(search_additional=False)), n_kp, L,
              label="no additional-match search")
    time_step(make(tr=dict(pose_opt_rounds=2)), n_kp, L,
              label="pose_opt 2x10")
    time_step(make(gf=dict(constr_per_frame=80)), n_kp, L,
              label="constr_per_frame=80")


if __name__ == "__main__":
    main()
