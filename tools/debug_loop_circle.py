"""Diagnose tracking losses on the synthetic circular loop trajectory
(tests/test_loop_closing.py::TestLoopClosingE2E). Run on CPU:

  JAX_PLATFORMS=cpu python tools/debug_loop_circle.py
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from gf_orb_slam2_tpu.config import (
    CameraConfig, CapacityConfig, ORBConfig, Sensor, SystemConfig,
)
from gf_orb_slam2_tpu.system import System

import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from tests.synthetic import SyntheticWorld, make_frame
from tests.test_loop_closing import loop_trajectory

N_KP = 512


def instrument_kf_policy(tr):
    import types
    orig = tr._need_new_keyframe

    def patched(self, frame):
        s = self.store
        n_kfs = len(s.valid_kf_ids())
        min_obs = 3 if n_kfs > 2 else 2
        ref_pts = s.kf_point[self.ref_kf]
        ref_pts = ref_pts[ref_pts >= 0]
        n_ref = int((s.point_nobs[ref_pts] >= min_obs).sum()) if ref_pts.size else 0
        close_ok = (frame.depth > 0) & (frame.depth < self.close_depth_th)
        tracked_close = int((close_ok & (frame.mp_ids >= 0)).sum())
        untracked_close = int((close_ok & (frame.mp_ids < 0) & frame.valid).sum())
        print(f"    KFPOL f={frame.frame_id} ref={self.ref_kf} n_ref={n_ref} "
              f"ref_sz={ref_pts.size} tracked={frame.n_matched} "
              f"cl_tr={tracked_close} cl_un={untracked_close} "
              f"since={frame.frame_id - self.last_kf_frame_id}")
        return orig(frame)

    tr._need_new_keyframe = types.MethodType(patched, tr)


def main():
    cam = CameraConfig(fx=450.0, fy=450.0, cx=320.0, cy=240.0, bf=45.0, th_depth=40.0)
    cap = CapacityConfig(max_keypoints=N_KP, max_map_points=40000,
                         max_keyframes=300, max_local_points=2048)
    import os as _os
    from gf_orb_slam2_tpu.config import GoodFeatureConfig, GFMatchingMode
    gf_kw = {}
    if _os.environ.get("GF_ALL"):
        gf_kw["good_feature"] = GoodFeatureConfig(matching_mode=GFMatchingMode.ALL)
    cfg = SystemConfig(sensor=Sensor.STEREO, camera=cam, capacity=cap,
                       orb=ORBConfig(n_features=N_KP), **gf_kw)
    sys_ = System(cfg)
    world = SyntheticWorld(12000, seed=13, extent=(1.0, 1.0, 1.0))
    rng = np.random.default_rng(13)
    n_pts = world.points.shape[0]
    ang = rng.uniform(0, 2 * np.pi, n_pts)
    r = rng.uniform(9, 16, n_pts)
    world.points = np.stack(
        [r * np.sin(ang), rng.uniform(-3, 3, n_pts), 6.0 - r * np.cos(ang) + 6.0], -1
    ).astype(np.float32)
    world.d0 = np.maximum(2.0, rng.uniform(4, 12, n_pts)).astype(np.float32)
    import os as _os2
    n_fr = int(_os2.environ.get("N_FRAMES", "260"))
    loops = float(_os2.environ.get("LOOPS", "1.0"))
    from tests.test_loop_closing import loop_trajectory as _lt
    import numpy as _np
    from gf_orb_slam2_tpu.geometry import lie as _lie
    import jax.numpy as _jnp
    def loop_traj_n(n, loops, radius=6.0):
        poses = []
        for i in range(n):
            a = 2 * _np.pi * loops * i / n
            Rwc = _np.asarray(_lie.so3_exp(_jnp.asarray([0.0, a, 0.0])), _np.float32)
            C = _np.array([radius * _np.sin(a), 0.0, radius * (1 - _np.cos(a))], _np.float32)
            R = Rwc.T
            poses.append((R, (-R @ C).astype(_np.float32)))
        return poses
    gt = loop_traj_n(n_fr, loops)
    tr = sys_.tracker
    instrument_kf_policy(tr)
    import gf_orb_slam2_tpu.loopclosing.loop_closer as lcmod
    orig_cs = lcmod.LoopCloser._compute_sim3
    def dbg_cs(self, kf, cands, st):
        import numpy as np, jax.numpy as jnp
        from gf_orb_slam2_tpu.matching import matcher
        s = self.store
        for c in cands:
            has_k = s.kf_point[kf] >= 0
            has_c = s.kf_point[c] >= 0
            m = matcher.match_all(
                jnp.asarray(s.kf_desc[kf]), jnp.asarray(has_k & s.kf_kp_valid[kf]),
                jnp.asarray(s.kf_desc[c]), jnp.asarray(has_c & s.kf_kp_valid[c]),
                th=matcher.TH_LOW, nn_ratio=0.75, mutual=True)
            nm = int(np.asarray(m.valid).sum())
            idx = np.asarray(m.idx); ok = np.asarray(m.valid)
            rows = np.nonzero(ok)[0]
            p1 = s.kf_point[kf, rows]; p2 = s.kf_point[c, idx[rows]]
            good = s.point_valid[p1] & s.point_valid[p2]
            rows2, p1g, p2g = rows[good], p1[good], p2[good]
            N = 256
            pc1 = np.zeros((N, 3), np.float32); pc2 = np.zeros((N, 3), np.float32)
            val = np.zeros(N, bool)
            n = min(rows2.size, N)
            pc1[:n] = s.point_pos[p1g[:n]] @ s.kf_R[kf].T + s.kf_t[kf]
            pc2[:n] = s.point_pos[p2g[:n]] @ s.kf_R[c].T + s.kf_t[c]
            val[:n] = True
            from gf_orb_slam2_tpu.loopclosing.sim3solver import solve_sim3, optimize_sim3
            import jax
            cam = self.cfg.camera
            res = solve_sim3(jnp.asarray(pc1), jnp.asarray(pc2), jnp.asarray(val),
                             cam.fx, cam.fy, cam.cx, cam.cy,
                             jax.random.PRNGKey(kf * 1000 + c),
                             fix_scale=self.fix_scale,
                             min_inliers=self.cfg.loop.min_sim3_inliers)
            n_ransac = int(np.asarray(res.inliers).sum())
            print(f"    SIM3 kf={kf} cand={c} matches={nm} valid_pairs={n} ransac_ok={bool(res.ok)} n_ransac={n_ransac}")
            if bool(res.ok):
                s_o, R_o, t_o, inl_o = optimize_sim3(
                    res.s, res.R, res.t, jnp.asarray(pc1), jnp.asarray(pc2), res.inliers,
                    cam.fx, cam.fy, cam.cx, cam.cy, fix_scale=self.fix_scale)
                n_o = int(jnp.sum(inl_o))
                n_total = self._guided_match_count(kf, c, s_o, R_o, t_o)
                print(f"      GN n_o={n_o} guided_total={n_total} min_total={self.cfg.loop.min_total_matches}")
        return orig_cs(self, kf, cands, st)
    lcmod.LoopCloser._compute_sim3 = dbg_cs
    for i, (R, t) in enumerate(gt):
        f = make_frame(world, R, t, cfg.camera, i, n_kp=N_KP, max_z=30.0)
        n_valid = int(f.valid.sum())
        sys_.track_frame(f)
        st = tr.stats[-1]
        # pose error vs gt
        if f.R is not None:
            C_est = -f.R.T @ f.t
            C_gt = -R.T @ t
            perr = float(np.linalg.norm(C_est - C_gt))
            Rerr = float(np.degrees(np.arccos(np.clip((np.trace(R @ f.R.T) - 1) / 2, -1, 1))))
        else:
            perr, Rerr = -1.0, -1.0
        print(f"{i:3d} {st.state:5s} feat={n_valid:3d} mot={st.n_motion_matches:3d} "
              f"locpts={st.n_local_points:4d} locm={st.n_local_matches:3d} "
              f"inl={st.n_inliers:3d} kf={int(st.created_kf)} "
              f"perr={perr:7.3f} rerr={Rerr:6.2f}")
    states = [s.state for s in tr.stats]
    print("ok_frac", states.count("OK") / len(states))
    lc = sys_.loop_closer
    if lc is not None:
        for s in lc.stats:
            if s.n_candidates or s.corrected:
                print("loopstat", s)


if __name__ == "__main__":
    main()
