"""Loop closing: detection, Sim3 verification, loop correction.

TPU-native replacement for the LoopClosing thread (reference:
src/LoopClosing.cc:65 Run): BoW candidate retrieval with
covisibility-consistency over 3 consecutive KFs (DetectLoop :125),
Sim3 RANSAC + guided verification (ComputeSim3 :253), and loop correction —
pose propagation to the covisible neighborhood, point fusion, essential-graph
Sim3 optimization, asynchronous global BA (CorrectLoop :424,
RunGlobalBundleAdjustment :667). Runs as a host pipeline stage per KF with
device programs for matching/Sim3/pose-graph (SURVEY.md §2.3 P1).
"""
from __future__ import annotations

import dataclasses
from typing import Dict, List, Set, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gf_orb_slam2_tpu.config import Sensor, SystemConfig
from gf_orb_slam2_tpu.geometry import lie
from gf_orb_slam2_tpu.loopclosing.sim3solver import solve_sim3
from gf_orb_slam2_tpu.matching import matcher
from gf_orb_slam2_tpu.optim.pose_graph import PoseGraphProblem, optimize_pose_graph
from gf_orb_slam2_tpu.place.keyframe_db import KeyFrameDatabase
from gf_orb_slam2_tpu.slammap.store import MapStore


def _np_sim3_inv(s, R, t):
    """(s,R,t)⁻¹ = (1/s, Rᵀ, -(1/s)·Rᵀt) — float64-free numpy Sim3."""
    si = 1.0 / s
    Ri = R.T
    return si, Ri, (-si * (Ri @ t)).astype(np.float32)


def _np_sim3_compose(s1, R1, t1, s2, R2, t2):
    """(s1,R1,t1)∘(s2,R2,t2): x ↦ s1·R1(s2·R2 x + t2) + t1."""
    return (float(s1 * s2), (R1 @ R2).astype(np.float32),
            (s1 * (R1 @ t2) + t1).astype(np.float32))


@dataclasses.dataclass
class LoopStats:
    kf: int = -1
    n_candidates: int = 0
    loop_kf: int = -1
    n_sim3_inliers: int = 0
    corrected: bool = False
    pg_cost: float = 0.0
    n_fused: int = 0


class LoopCloser:
    def __init__(self, cfg: SystemConfig, store: MapStore, kfdb: KeyFrameDatabase):
        self.cfg = cfg
        self.store = store
        self.kfdb = kfdb
        # consistency groups: list of (set_of_kfs, count) (reference:
        # mvConsistentGroups LoopClosing.cc:216)
        self._consistent: List[Tuple[Set[int], int]] = []
        self.last_loop_kf: int = -1
        self.fix_scale = cfg.sensor != Sensor.MONOCULAR
        self._match_jit = None
        self.stats: List[LoopStats] = []
        # detached global BA (reference: LoopClosing.cc:601 spawns a thread;
        # mbStopGBA aborts it when a new loop arrives)
        self._gba_thread = None
        self._gba_abort = False
        self._fuse_jit = None

    # ------------------------------------------------------------- pipeline
    def process_keyframe(self, kf: int) -> LoopStats:
        """Takes store.lock internally, in phases: detection (the common,
        cheap case) locks briefly; Sim3 verification + the rare correction
        hold it for their host mutations — matching the reference's protocol
        of stopping LocalMapping during CorrectLoop while tracking continues
        between phases (LoopClosing.cc:430-460). Callers (sync pipeline or
        the async mapping worker) must NOT wrap this in the store lock."""
        st = LoopStats(kf=kf)
        self.stats.append(st)
        with self.store.lock:
            cands = self._detect_loop(kf, st)
            self.kfdb.add(kf)
        if not cands:
            return st
        with self.store.lock:
            hit = self._compute_sim3(kf, cands, st)
            if hit is None:
                return st
            loop_kf, s12, R12, t12, n_inl = hit
            st.loop_kf = loop_kf
            st.n_sim3_inliers = n_inl
            self._correct_loop(kf, loop_kf, s12, R12, t12, st)
        return st

    # ------------------------------------------------------------ detection
    def _detect_loop(self, kf: int, st: LoopStats) -> List[int]:
        s = self.store
        if kf < 10 or (self.last_loop_kf >= 0 and kf - self.last_loop_kf < 10):
            return []
        min_score = self.kfdb.min_covis_score(kf)
        cands = self.kfdb.detect_loop_candidates(kf, max(min_score, 1e-3))
        # temporal exclusion (see LoopClosingConfig.min_frame_gap): a loop
        # partner must be genuinely old, not a weakly-covisible neighbor
        gap = self.cfg.loop.min_frame_gap
        cands = [c for c in cands
                 if s.kf_frame_id[kf] - s.kf_frame_id[c] >= gap]
        st.n_candidates = len(cands)
        if not cands:
            self._consistent = []
            return []
        # covisibility-consistency over consecutive detections
        # (reference: LoopClosing.cc:160-250, threshold 3)
        th = self.cfg.loop.covisibility_consistency_th
        enough: List[int] = []
        new_groups: List[Tuple[Set[int], int]] = []
        for c in cands:
            group = set(int(x) for x in s.covisible_kfs(c))
            group.add(c)
            matched = False
            for prev_group, count in self._consistent:
                if group & prev_group:
                    new_groups.append((group, count + 1))
                    matched = True
                    if count + 1 >= th:
                        enough.append(c)
                    break
            if not matched:
                new_groups.append((group, 1))
        self._consistent = new_groups
        return enough

    # ----------------------------------------------------------- sim3 stage
    def _ensure_jits(self):
        """Jit the per-candidate device stages ONCE with fixed shapes
        (desc [n_kp,8], pairs padded to 256). Running them eagerly cost
        ~160 tiny remote compiles on the first loop event and hundreds of
        ms-scale eager dispatches per candidate afterwards (r4 profile:
        77 s of backend_compile inside one _compute_sim3 call)."""
        if self._match_jit is not None:
            return
        cam = self.cfg.camera
        fix = self.fix_scale
        mi = self.cfg.loop.min_sim3_inliers

        self._match_jit = jax.jit(lambda da, va, db, vb: matcher.match_all(
            da, va, db, vb, th=matcher.TH_LOW, nn_ratio=0.75, mutual=True))

        def sim3_full(pc1, pc2, val, key):
            res = solve_sim3(pc1, pc2, val, cam.fx, cam.fy, cam.cx, cam.cy,
                             key, fix_scale=fix, min_inliers=mi)
            # GN polish (reference: OptimizeSim3 between RANSAC and the
            # guided-projection verification, LoopClosing.cc:380) — always
            # computed (its cost is one fused program); gated on the host
            from gf_orb_slam2_tpu.loopclosing.sim3solver import optimize_sim3

            s_o, R_o, t_o, inl_o = optimize_sim3(
                res.s, res.R, res.t, pc1, pc2, res.inliers,
                cam.fx, cam.fy, cam.cx, cam.cy, fix_scale=fix)
            return res.ok, s_o, R_o, t_o, inl_o

        self._sim3_jit = jax.jit(sim3_full)

        def cam_project(p):
            z = jnp.maximum(p[..., 2], 1e-6)
            return (
                jnp.stack([cam.fx * p[..., 0] / z + cam.cx,
                           cam.fy * p[..., 1] / z + cam.cy], -1),
                p[..., 2],
            )

        def guided(s12, R12, t12, pc1, pc2, d1, d2, v1, v2):
            m = matcher.search_by_sim3(
                s12, R12, t12, pc1, pc2, d1, d2, v1, v2, cam_project)
            return jnp.sum(m.valid)

        self._guided_jit = jax.jit(guided)

    def _compute_sim3(self, kf: int, cands: List[int], st: LoopStats):
        s = self.store
        self._ensure_jits()
        for c in cands:
            # descriptor matches between map-point-bearing keypoints
            has_k = s.kf_point[kf] >= 0
            has_c = s.kf_point[c] >= 0
            m = self._match_jit(
                jnp.asarray(s.kf_desc[kf]), jnp.asarray(has_k & s.kf_kp_valid[kf]),
                jnp.asarray(s.kf_desc[c]), jnp.asarray(has_c & s.kf_kp_valid[c]),
            )
            idx, ok = jax.device_get((m.idx, m.valid))
            idx = np.asarray(idx)
            rows = np.nonzero(np.asarray(ok))[0]
            if rows.size < self.cfg.loop.min_sim3_inliers:
                continue
            p1 = s.kf_point[kf, rows]
            p2 = s.kf_point[c, idx[rows]]
            good = s.point_valid[p1] & s.point_valid[p2]
            rows, p1, p2 = rows[good], p1[good], p2[good]
            if rows.size < self.cfg.loop.min_sim3_inliers:
                continue
            N = 256
            pc1 = np.zeros((N, 3), np.float32)
            pc2 = np.zeros((N, 3), np.float32)
            val = np.zeros(N, bool)
            n = min(rows.size, N)
            pc1[:n] = s.point_pos[p1[:n]] @ s.kf_R[kf].T + s.kf_t[kf]
            pc2[:n] = s.point_pos[p2[:n]] @ s.kf_R[c].T + s.kf_t[c]
            val[:n] = True
            dev_in = jax.device_put((pc1, pc2, val))
            res_ok, s_o, R_o, t_o, inl_o = jax.device_get(self._sim3_jit(
                *dev_in, jax.random.PRNGKey(kf * 1000 + c)))
            if bool(res_ok):
                n_o = int(np.asarray(inl_o).sum())
                if n_o < self.cfg.loop.min_sim3_inliers:
                    continue
                # guided cross-projection verification over ALL mapped
                # keypoints of both KFs (reference: SearchBySim3 + the ≥40
                # total-matches gate, LoopClosing.cc:404-422)
                n_total = self._guided_match_count(kf, c, s_o, R_o, t_o)
                if n_total < self.cfg.loop.min_total_matches:
                    continue
                # Sim3 maps kf-camera coords → candidate-camera coords
                return (c, float(s_o), np.asarray(R_o), np.asarray(t_o), n_o)
        return None

    def _guided_match_count(self, kf: int, c: int, s12, R12, t12) -> int:
        """Count map-point matches under the Sim3 via two-way guided
        projection (reference: ORBmatcher::SearchBySim3 ORBmatcher.cc:406)."""
        s = self.store
        cam = self.cfg.camera

        def kf_points(k):
            slots = s.kf_point[k]
            valid = (slots >= 0) & s.kf_kp_valid[k]
            ids = np.maximum(slots, 0)
            pw = s.point_pos[ids]
            pc = pw @ s.kf_R[k].T + s.kf_t[k]
            valid = valid & s.point_valid[ids]
            return pc.astype(np.float32), s.kf_desc[k], valid

        pc1, d1, v1 = kf_points(kf)
        pc2, d2, v2 = kf_points(c)
        self._ensure_jits()
        dev_in = jax.device_put(
            (np.float32(s12), np.asarray(R12, np.float32),
             np.asarray(t12, np.float32), pc1, pc2, d1, d2, v1, v2))
        return int(jax.device_get(self._guided_jit(*dev_in)))

    # ----------------------------------------------------- loop correction
    def _correct_loop(self, kf: int, loop_kf: int, s12, R12, t12, st: LoopStats):
        """Reference: CorrectLoop (LoopClosing.cc:424) + OptimizeEssentialGraph.

        Convention (pinned by tests/test_sim3.py::test_correct_loop_convention):
        (s12, R12, t12) maps CURRENT-KF camera coords into LOOP-KF camera
        coords (solve_sim3's pc2 ≈ s·R·pc1 + t with pc1 from kf, pc2 from
        loop_kf). The corrected world→camera Sim3 of the current KF is

            S_cw(kf) = S12⁻¹ ∘ T_cw(loop_kf)

        — a world point lands in the loop KF's camera via its (trusted) pose,
        then S12⁻¹ carries it into the current KF's camera. This equals the
        reference's mScw = gScm · T_cw(matched) with gScm mapping matched→
        current camera, i.e. gScm = our S12⁻¹ (LoopClosing.cc:300-420).
        """
        s = self.store
        # host-side Sim3 algebra: these are a handful of 3x3 products per
        # neighborhood KF — running them as eager jnp ops paid a relay
        # dispatch EACH (hundreds of ms per correction); numpy is exact here
        si, Ri, ti = _np_sim3_inv(float(s12), np.asarray(R12), np.asarray(t12))
        s_corr, R_corr, t_corr = _np_sim3_compose(
            si, Ri, ti, 1.0, s.kf_R[loop_kf], s.kf_t[loop_kf])

        # --- propagate correction to the covisible neighborhood
        neighborhood = [kf] + [int(x) for x in s.covisible_kfs(kf)]
        old_R = {k: s.kf_R[k].copy() for k in neighborhood}
        old_t = {k: s.kf_t[k].copy() for k in neighborhood}
        corr_s: Dict[int, float] = {}
        moved_mask = np.zeros(s.cap.max_map_points, bool)
        for k in neighborhood:
            # relative pose to kf (pre-correction): T_k_kf = T_k ∘ T_kf⁻¹
            R_rel = old_R[k] @ old_R[kf].T
            t_rel = old_t[k] - R_rel @ old_t[kf]
            sk, Rk_np, tk_np = _np_sim3_compose(
                1.0, R_rel, t_rel, s_corr, R_corr, t_corr)
            corr_s[k] = sk
            # correct this KF's points: X_new = T_new⁻¹( s·T_old(X) )
            pts = s.kf_point[k]
            pts = np.unique(pts[pts >= 0])
            pts = pts[s.point_valid[pts] & ~moved_mask[pts]]
            if pts.size:
                pc = s.point_pos[pts] @ old_R[k].T + old_t[k]
                # X_new = S_new⁻¹(pc): re-anchor through the corrected Sim3
                s_inv, R_inv, t_inv = _np_sim3_inv(sk, Rk_np, tk_np)
                s.point_pos[pts] = s_inv * (pc @ R_inv.T) + t_inv
                s.mark_dirty(pts)
                moved_mask[pts] = True
            s.set_kf_pose(k, Rk_np, tk_np / sk)
        s.kf_loop_edges.setdefault(kf, set()).add(loop_kf)
        s.kf_loop_edges.setdefault(loop_kf, set()).add(kf)

        # --- project the loop side's points into the corrected neighborhood
        # and fuse duplicates (reference: SearchAndFuse LoopClosing.cc:609)
        st.n_fused = self._search_and_fuse(kf, loop_kf, neighborhood)
        # --- essential-graph optimization over all valid KFs
        self._optimize_essential_graph(kf, loop_kf, corr_s, st)
        # --- full BA in a detached, abortable thread (reference:
        # LoopClosing.cc:601 RunGlobalBundleAdjustment + mbStopGBA)
        self._launch_global_ba()
        self.last_loop_kf = kf
        st.corrected = True

    # --------------------------------------------------------- search & fuse
    def _search_and_fuse(self, kf: int, loop_kf: int,
                         neighborhood: List[int]) -> int:
        """Project loop-side map points into each corrected-neighborhood KF
        and merge duplicates, keeping the LOOP point (reference: SearchAndFuse
        LoopClosing.cc:609 → ORBmatcher::Fuse Scw variant ORBmatcher.cc:1089,
        pRep->Replace(pLoopMP)). Batched device program over the mirrors —
        the upload is KF indices + loop point ids."""
        s = self.store
        # loop-side point pool: loop KF + its covisible neighborhood
        loop_side = [loop_kf] + [int(x) for x in s.covisible_kfs(loop_kf, 10)]
        pts = np.unique(s.kf_point[loop_side])
        pts = pts[pts >= 0]
        pts = pts[s.point_valid[pts]]
        if pts.size == 0:
            return 0
        P = s.n_kp
        if pts.size > P:
            order = np.argsort(-s.point_nobs[pts], kind="stable")
            pts = np.sort(pts[order[:P]])
        # mirrors must see the corrected poses/positions
        if s.mirror is None or s.kf_mirror is None:
            from gf_orb_slam2_tpu.slammap.device_mirror import (
                DeviceKFMirror, DeviceMapMirror,
            )

            if s.mirror is None:
                s.mirror = DeviceMapMirror(s)
            if s.kf_mirror is None:
                s.kf_mirror = DeviceKFMirror(s)
        s.mirror.sync()
        s.kf_mirror.sync()
        B = 20
        dsts = (list(neighborhood) + [kf] * B)[:B]
        src_ids = np.full((B, P), -1, np.int32)
        n_dst = min(len(neighborhood), B)
        src_ids[:n_dst, : pts.size] = pts
        if self._fuse_jit is None:
            from gf_orb_slam2_tpu.matching import matcher as _m

            cam = self.cfg.camera
            scales_dev = jnp.asarray(
                np.asarray([self.cfg.orb.scale_factor ** i
                            for i in range(self.cfg.orb.n_levels)], np.float32))

            def fuse_one(dst, ids, kfm, ptm):
                ok = ids >= 0
                idc = jnp.maximum(ids, 0)
                R, t = kfm["R"][dst], kfm["t"][dst]
                pos = ptm["pos"][idc]
                pc = lie.transform(R, t, pos)
                z = jnp.where(jnp.abs(pc[..., 2]) < 1e-8, 1e-8, pc[..., 2])
                uv = jnp.stack([cam.fx * pc[..., 0] / z + cam.cx,
                                cam.fy * pc[..., 1] / z + cam.cy], -1)
                in_img = ((uv[..., 0] >= 0) & (uv[..., 0] < cam.width)
                          & (uv[..., 1] >= 0) & (uv[..., 1] < cam.height)
                          & (pc[..., 2] > 0))
                m = _m.search_by_projection(
                    uv, jnp.zeros_like(ids), ok & in_img, ptm["desc"][idc],
                    kfm["uv"][dst], kfm["oct"][dst], kfm["kpv"][dst],
                    kfm["desc"][dst],
                    radius=4.0, level_scales=scales_dev, th=_m.TH_LOW,
                )
                return m.idx, m.valid

            self._fuse_jit = jax.jit(
                lambda d, i, kfm, ptm: jax.vmap(
                    lambda dd, ii: fuse_one(dd, ii, kfm, ptm))(d, i))
        dev = jax.device_put((np.asarray(dsts, np.int32), src_ids))
        idx_b, ok_b = jax.device_get(
            self._fuse_jit(*dev, s.kf_mirror.arrays, s.mirror.arrays))
        fused = 0
        for bi in range(n_dst):
            dst = dsts[bi]
            rows = np.nonzero(ok_b[bi])[0]
            for r in rows:
                p = int(src_ids[bi, r])
                if p < 0 or not s.point_valid[p]:
                    continue
                j = int(idx_b[bi, r])
                q = int(s.kf_point[dst, j])
                if q >= 0 and s.point_valid[q]:
                    if q != p:
                        s.replace_point(q, p)  # reference keeps the loop point
                        fused += 1
                else:
                    s.add_observation(p, dst, j)
        for k in neighborhood:
            s.update_connections(k)
        return fused

    # ----------------------------------------------------------- global BA
    def _launch_global_ba(self):
        """Detached abortable full-map BA (reference: LoopClosing.cc:601)."""
        import threading

        from gf_orb_slam2_tpu.optim.global_ba import GlobalBARunner

        self.abort_gba()  # a new loop supersedes a running GBA
        runner = GlobalBARunner(self.store, self.cfg)
        if not runner.build():
            return
        self._gba_abort = False

        def run():
            if runner.solve(lambda: self._gba_abort):
                runner.write_back()

        if self.cfg.loop.synchronous_gba:
            run()
            return
        self._gba_thread = threading.Thread(target=run, daemon=True)
        self._gba_thread.start()

    def abort_gba(self):
        if self._gba_thread is not None and self._gba_thread.is_alive():
            self._gba_abort = True
            self._gba_thread.join()
        self._gba_thread = None

    def wait_gba(self):
        if self._gba_thread is not None:
            self._gba_thread.join()
            self._gba_thread = None

    def _optimize_essential_graph(self, kf: int, loop_kf: int, corr_s, st: LoopStats):
        s = self.store
        kfs = s.valid_kf_ids()
        K = int(kfs.max()) + 1  # index by kf id directly (dense up to max id)
        e_i, e_j, e_R, e_t, e_s, e_w = [], [], [], [], [], []

        def add_edge(i, j, w=1.0):
            R_rel = s.kf_R[i] @ s.kf_R[j].T
            t_rel = s.kf_t[i] - R_rel @ s.kf_t[j]
            e_i.append(i)
            e_j.append(j)
            e_R.append(R_rel)
            e_t.append(t_rel)
            e_s.append(1.0)
            e_w.append(w)

        seen = set()
        min_w = self.cfg.loop.essential_graph_min_weight
        for k in kfs:
            k = int(k)
            parent = int(s.kf_parent[k])
            if parent >= 0 and s.kf_valid[parent]:
                add_edge(k, parent, 1.0)
                seen.add((min(k, parent), max(k, parent)))
            for nb in s.covisible_kfs(k):
                nb = int(nb)
                if s.covis[k, nb] >= min_w and (min(k, nb), max(k, nb)) not in seen:
                    add_edge(k, nb, 1.0)
                    seen.add((min(k, nb), max(k, nb)))
            for le in s.kf_loop_edges.get(k, ()):  # loop edges, strong weight
                if (min(k, le), max(k, le)) not in seen and s.kf_valid[le]:
                    add_edge(k, le, 5.0)
                    seen.add((min(k, le), max(k, le)))
        if not e_i:
            return
        # bucket K and E to stable shapes so optimize_pose_graph's compiled
        # program is reused across loop events (padding: invalid vertices +
        # zero-weight self-edges at vertex 0 contribute nothing)
        K_pad = max(64, 1 << int(np.ceil(np.log2(K))))
        E = len(e_i)
        E_pad = max(256, 1 << int(np.ceil(np.log2(E))))
        pad = E_pad - E
        e_i = np.asarray(e_i + [0] * pad, np.int32)
        e_j = np.asarray(e_j + [0] * pad, np.int32)
        e_s = np.asarray(e_s + [1.0] * pad, np.float32)
        e_R = np.concatenate(
            [np.stack(e_R), np.tile(np.eye(3, dtype=np.float32), (pad, 1, 1))]
        ) if pad else np.stack(e_R)
        e_t = np.concatenate(
            [np.stack(e_t), np.zeros((pad, 3), np.float32)]
        ) if pad else np.stack(e_t)
        e_w = np.asarray(e_w + [0.0] * pad, np.float32)
        valid = np.zeros(K_pad, bool)
        valid[kfs] = True
        fixed = np.zeros(K_pad, bool)
        fixed[loop_kf] = True  # reference fixes the loop KF
        R_pad = np.tile(np.eye(3, dtype=np.float32), (K_pad, 1, 1))
        t_pad = np.zeros((K_pad, 3), np.float32)
        R_pad[:K] = s.kf_R[:K]
        t_pad[:K] = s.kf_t[:K]
        dev = jax.device_put((R_pad, t_pad, fixed, valid, e_i, e_j, e_s, e_R,
                              e_t, e_w))
        prob = PoseGraphProblem(
            s=jnp.ones(K_pad, jnp.float32),
            R=dev[0], t=dev[1], fixed=dev[2], valid=dev[3],
            e_i=dev[4], e_j=dev[5], e_s=dev[6], e_R=dev[7],
            e_t=dev[8], e_w=dev[9],
            fix_scale=self.fix_scale,
        )
        s_np, R_np, t_np, cost = jax.device_get(
            optimize_pose_graph(prob, iters=15))
        st.pg_cost = float(cost)
        # transform points with their reference KF's correction
        moved_mask = np.zeros(s.cap.max_map_points, bool)
        for k in kfs:
            k = int(k)
            R_old, t_old = s.kf_R[k].copy(), s.kf_t[k].copy()
            R_new, t_new = R_np[k], t_np[k] / max(s_np[k], 1e-9)
            pts = s.kf_point[k]
            pts = np.unique(pts[pts >= 0])
            pts = pts[s.point_valid[pts] & ~moved_mask[pts]]
            if pts.size:
                pc = s.point_pos[pts] @ R_old.T + t_old
                pw = (pc - t_new) @ R_new
                s.point_pos[pts] = pw
                s.mark_dirty(pts)
                moved_mask[pts] = True
            s.set_kf_pose(k, R_new, t_new)
