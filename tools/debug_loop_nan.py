"""Hunt the NaN that poisons the rendered-loop trajectory (VERDICT r4 #1b).

Runs the exact test_loop_rendered scenario with per-stage NaN tripwires on
store poses/points and the tracker state; prints the first stage at which a
non-finite value appears, then exits.
"""
import sys

import numpy as np

sys.path.insert(0, ".")
from tests.rendered_world import RoomWorld, trajectory_loop

from gf_orb_slam2_tpu.config import (
    CameraConfig, CapacityConfig, LoopClosingConfig, ORBConfig, Sensor,
    SystemConfig,
)
from gf_orb_slam2_tpu.system import System

FX = FY = 450.0
CX, CY = 320.0, 240.0
BASELINE = 0.1
BF = FX * BASELINE
N_FRAMES = 140


def check(store, tag):
    kfs = store.valid_kf_ids()
    bad = []
    if kfs.size:
        if not np.isfinite(store.kf_R[kfs]).all():
            bad.append("kf_R")
        if not np.isfinite(store.kf_t[kfs]).all():
            bad.append("kf_t")
    pv = store.point_valid
    if pv.any() and not np.isfinite(store.point_pos[pv]).all():
        bad.append("point_pos")
    if bad:
        print(f"*** NON-FINITE at {tag}: {bad}")
        for name, arr, ids in (("kf_R", store.kf_R, kfs), ("kf_t", store.kf_t, kfs)):
            if name in bad:
                mask = ~np.isfinite(arr[ids]).reshape(ids.size, -1).all(1)
                print(f"    {name} bad kf ids: {ids[mask][:20]}")
        raise SystemExit(1)


def main():
    world = RoomWorld(width=9.0, height=5.0, length=14.0)
    poses = trajectory_loop(N_FRAMES, radius=2.2, center=(0.0, 0.0, 7.0),
                            loops=1.27)
    cam = CameraConfig(fx=FX, fy=FY, cx=CX, cy=CY, bf=BF, th_depth=40.0)
    cfg = SystemConfig(
        sensor=Sensor.STEREO, camera=cam, orb=ORBConfig(n_features=800),
        capacity=CapacityConfig(max_keypoints=1024, max_map_points=30000,
                                max_keyframes=160, max_local_points=2048),
        loop=LoopClosingConfig(enabled=True, synchronous_gba=True),
    )
    slam = System(cfg)

    # wrap mapper + loop closer stages with tripwires
    mapper = slam.mapper
    orig_pk = mapper.process_keyframe

    def pk(kf, **kw):
        check(slam.store, f"before mapper kf={kf}")
        st = MappingStagesProbe(mapper, kf, slam)
        check(slam.store, f"after mapper kf={kf}")
        return st

    class MappingStagesProbe:
        def __new__(cls, mapper, kf, slam):
            s = slam.store
            lk = s.lock
            from gf_orb_slam2_tpu.mapping.local_mapping import MappingStats
            st = MappingStats(kf=kf)
            with lk:
                mapper._refresh_point_stats(kf)
                st.n_culled_points = mapper.cull_recent_points(kf)
            check(s, f"kf={kf} after cull")
            st.n_new_points = mapper.create_new_points(kf)
            check(s, f"kf={kf} after triangulate")
            st.n_fused = mapper.fuse_neighbors(kf)
            check(s, f"kf={kf} after fuse")
            mapper.run_local_ba(kf, st)
            check(s, f"kf={kf} after local BA")
            with lk:
                st.n_culled_kfs = mapper.cull_keyframes(kf)
                mapper.update_hash_tables(kf)
            check(s, f"kf={kf} after kf-cull")
            mapper.stats.append(st)
            return st

    mapper.process_keyframe = pk

    def wrap_loop():
        lc = slam.loop_closer
        if lc is None or getattr(lc, "_wrapped", False):
            return
        lc._wrapped = True
        orig_cl = lc._correct_loop
        orig_eg = lc._optimize_essential_graph
        orig_gba = lc._launch_global_ba

        def cl(kf, loop_kf, s12, R12, t12, st):
            check(slam.store, f"before correct kf={kf}")
            print(f"   loop correction firing: kf={kf} loop_kf={loop_kf} "
                  f"s12={float(s12):.4f}")
            orig_cl(kf, loop_kf, s12, R12, t12, st)
            check(slam.store, f"after correct kf={kf}")

        def eg(kf, loop_kf, corr_s, st):
            check(slam.store, f"before essgraph kf={kf}")
            orig_eg(kf, loop_kf, corr_s, st)
            print(f"   essential graph done, cost={st.pg_cost:.3f}")
            check(slam.store, f"after essgraph kf={kf}")

        def gba():
            check(slam.store, "before GBA")
            orig_gba()
            check(slam.store, "after GBA")

        lc._correct_loop = cl
        lc._optimize_essential_graph = eg
        lc._launch_global_ba = gba

    for i, (R_cw, t_cw) in enumerate(poses):
        l, r = world.render_stereo(R_cw, t_cw, baseline=BASELINE,
                                   fx=FX, fy=FY, cx=CX, cy=CY)
        slam.track_stereo(l, r, i / 20.0)
        wrap_loop()
        f = slam.tracker.last_frame
        if f is not None and f.R is not None and not np.isfinite(f.R).all():
            print(f"*** frame {i} pose non-finite")
            raise SystemExit(1)
        check(slam.store, f"frame {i}")
    slam.shutdown()
    check(slam.store, "end")
    # recompose and find NaN frames
    from gf_orb_slam2_tpu.io.trajectory import recompose_trajectory

    bad = 0
    for ts, T_cw in recompose_trajectory(slam.tracker.relative_poses, slam.store):
        if not np.isfinite(T_cw).all():
            bad += 1
    print(f"recomposed trajectory: {bad} non-finite frames")
    if bad:
        # inspect relative poses + ref kf
        for rec in slam.tracker.relative_poses[:5]:
            print(type(rec), rec)


if __name__ == "__main__":
    main()
