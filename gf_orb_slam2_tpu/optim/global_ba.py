"""Full-map (global) bundle adjustment.

TPU-native replacement for Optimizer::GlobalBundleAdjustemnt /
BundleAdjustment (reference: src/Optimizer.cc:51/:58) and the post-loop
RunGlobalBundleAdjustment thread (src/LoopClosing.cc:667): optimize all
keyframe poses + map points. Reuses the batched Schur-LM machinery of
optim/local_ba.py with map-scale capacities; KFs beyond the optimization cap
(and un-optimized points) are propagated through the spanning tree afterwards
exactly like the reference's re-anchoring pass (LoopClosing.cc:720-780).
"""
from __future__ import annotations

import numpy as np

from gf_orb_slam2_tpu.optim.local_ba import LocalBAProblem, local_bundle_adjustment
from gf_orb_slam2_tpu.slammap.store import MapStore

import jax
import jax.numpy as jnp


def global_bundle_adjustment(
    store: MapStore, cfg, iters: int = 20, max_kfs: int = 64,
    max_points: int = 16384, obs_cap: int = 16,
):
    """Optimize (up to max_kfs most-connected) KFs + their points in place."""
    s = store
    kfs_all = s.valid_kf_ids()
    if kfs_all.size < 2:
        return
    if kfs_all.size > max_kfs:
        # keep the most-connected KFs; the rest get spanning-tree propagation
        conn = s.covis[np.ix_(kfs_all, kfs_all)].sum(1)
        order = np.argsort(-conn, kind="stable")
        kfs = np.sort(kfs_all[order[:max_kfs]])
    else:
        kfs = kfs_all
    kf_index = {int(k): i for i, k in enumerate(kfs)}
    K = len(kfs)
    K_pad = max_kfs

    pts = np.unique(s.kf_point[kfs])
    pts = pts[pts >= 0]
    pts = pts[s.point_valid[pts]]
    if pts.size > max_points:
        order = np.argsort(-s.point_nobs[pts], kind="stable")
        pts = pts[order[:max_points]]
    P = int(pts.size)
    if P == 0:
        return
    P_pad = 1 << int(np.ceil(np.log2(max(P, 256))))

    obs_kf = np.full((P_pad, obs_cap), -1, np.int32)
    obs_uv = np.zeros((P_pad, obs_cap, 2), np.float32)
    obs_ur = np.full((P_pad, obs_cap), -1.0, np.float32)
    obs_inv2 = np.ones((P_pad, obs_cap), np.float32)
    obs_valid = np.zeros((P_pad, obs_cap), bool)
    scale = cfg.orb.scale_factor
    inv_sig = 1.0 / np.asarray(
        [scale ** (2 * i) for i in range(cfg.orb.n_levels)], np.float32
    )
    for pi, p in enumerate(pts):
        o = 0
        for si in range(s.obs_kf.shape[1]):
            k = s.obs_kf[p, si]
            if k < 0 or int(k) not in kf_index or o >= obs_cap:
                continue
            j = s.obs_idx[p, si]
            obs_kf[pi, o] = kf_index[int(k)]
            obs_uv[pi, o] = s.kf_uv[k, j]
            obs_ur[pi, o] = s.kf_u_right[k, j]
            obs_inv2[pi, o] = inv_sig[min(s.kf_octave[k, j], len(inv_sig) - 1)]
            obs_valid[pi, o] = True
            o += 1

    fixed = np.zeros(K_pad, bool)
    fixed[kf_index.get(0, 0)] = True  # anchor KF0 (reference fixes id 0)
    kf_valid = np.zeros(K_pad, bool)
    kf_valid[:K] = True
    kf_R = np.tile(np.eye(3, dtype=np.float32), (K_pad, 1, 1))
    kf_t = np.zeros((K_pad, 3), np.float32)
    kf_R[:K] = s.kf_R[kfs]
    kf_t[:K] = s.kf_t[kfs]
    pt_pos = np.zeros((P_pad, 3), np.float32)
    pt_pos[:P] = s.point_pos[pts]
    pt_val = np.zeros(P_pad, bool)
    pt_val[:P] = True

    prob = LocalBAProblem(
        kf_R=jnp.asarray(kf_R), kf_t=jnp.asarray(kf_t),
        kf_fixed=jnp.asarray(fixed), kf_valid=jnp.asarray(kf_valid),
        pt_pos=jnp.asarray(pt_pos), pt_valid=jnp.asarray(pt_val),
        obs_kf=jnp.asarray(obs_kf), obs_uv=jnp.asarray(obs_uv),
        obs_ur=jnp.asarray(obs_ur), obs_inv_sigma2=jnp.asarray(obs_inv2),
        obs_valid=jnp.asarray(obs_valid),
    )
    cam = cfg.camera
    res = local_bundle_adjustment(
        prob, cam.fx, cam.fy, cam.cx, cam.cy, cam.bf,
        iters_first=iters // 2, iters_second=iters - iters // 2,
    )
    old_R = {int(k): s.kf_R[k].copy() for k in kfs_all}
    old_t = {int(k): s.kf_t[k].copy() for k in kfs_all}
    R_np, t_np = np.asarray(res.kf_R), np.asarray(res.kf_t)
    optimized = set()
    for i, k in enumerate(kfs):
        if not fixed[i]:
            s.set_kf_pose(int(k), R_np[i], t_np[i])
        optimized.add(int(k))
    s.point_pos[pts] = np.asarray(res.pt_pos)[:P]
    s.mark_dirty(pts)
    moved = set(int(p) for p in pts)

    # spanning-tree propagation for KFs outside the optimized set
    # (reference: LoopClosing.cc:720-780 — child pose = T_child_parent_old ∘
    # parent_new; un-optimized points re-anchored via their reference KF)
    for k in kfs_all:
        k = int(k)
        if k in optimized:
            continue
        parent = int(s.kf_parent[k])
        if parent < 0 or parent not in optimized:
            continue
        T_rel_R = old_R[k] @ old_R[parent].T
        T_rel_t = old_t[k] - T_rel_R @ old_t[parent]
        s.set_kf_pose(k, T_rel_R @ s.kf_R[parent], T_rel_R @ s.kf_t[parent] + T_rel_t)
        optimized.add(k)
    for k in kfs_all:
        k = int(k)
        p_list = s.kf_point[k]
        p_list = np.unique(p_list[p_list >= 0])
        p_list = np.asarray([p for p in p_list if s.point_valid[p] and p not in moved], int)
        if not p_list.size:
            continue
        pc = s.point_pos[p_list] @ old_R[k].T + old_t[k]
        s.point_pos[p_list] = (pc - s.kf_t[k]) @ s.kf_R[k]
        s.mark_dirty(p_list)
        moved.update(int(p) for p in p_list)
