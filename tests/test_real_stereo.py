"""Real-image stereo front-end regression (reference: test_Stereo.cpp:230
TestStereo.Detection — loads test/EuRoC_l.png + EuRoC_r.png / TUM pair,
builds a stereo Frame with the EuRoC LEFT/RIGHT K-D-R-P rectification,
checks detection + stereo matching).

Gates the image-domain front end (FAST on real texture, own-pattern rBRIEF
repeatability across the stereo pair, rectification + row-band matching) in
CI — the synthetic worlds cannot catch real-texture regressions."""
import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

EUROC_L = "/root/reference/test/EuRoC_l.png"
EUROC_R = "/root/reference/test/EuRoC_r.png"
TUM_L = "/root/reference/test/TUM_l.png"
TUM_R = "/root/reference/test/TUM_r.png"
SETTINGS = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "examples", "euroc_stereo.yaml")

pytestmark = pytest.mark.skipif(
    not all(os.path.exists(p) for p in (EUROC_L, EUROC_R, TUM_L, TUM_R)),
    reason="reference image fixtures unavailable",
)


def _euroc_system():
    from gf_orb_slam2_tpu.io.settings import load_settings
    from gf_orb_slam2_tpu.system import System

    cfg = load_settings(SETTINGS)
    cfg = cfg.replace(capacity=cfg.capacity.__class__(
        max_keypoints=1024, max_map_points=2000, max_keyframes=10,
        max_local_points=512))
    return System(cfg)


def test_euroc_stereo_detection_and_matching():
    """Reference parity: raw (unrectified) EuRoC images through the full
    rectifying stereo frontend — keypoint budget, stereo match fraction,
    disparity sanity (reference: TestStereo.Detection test_Stereo.cpp:230)."""
    im_l = cv2.imread(EUROC_L, cv2.IMREAD_GRAYSCALE)
    im_r = cv2.imread(EUROC_R, cv2.IMREAD_GRAYSCALE)
    slam = _euroc_system()
    frame = slam._build_stereo_frame(im_l, im_r, 0.0)
    frame.ensure_host()
    n_kp = int(frame.valid.sum())
    assert n_kp >= 600, f"only {n_kp} keypoints on real texture"
    matched = frame.valid & (frame.u_right >= 0)
    n_stereo = int(matched.sum())
    assert n_stereo >= 0.3 * n_kp, f"{n_stereo}/{n_kp} stereo matches"
    disp = frame.uv[matched, 0] - frame.u_right[matched]
    assert (disp > -1.0).mean() > 0.97
    # EuRoC machine-hall scene: depths of meters → disparities of a few to
    # tens of px at bf≈47.9
    assert 1.0 < np.median(disp) < 60.0, np.median(disp)
    depth = frame.depth[matched]
    assert np.median(depth[depth > 0]) < 30.0


@pytest.mark.parametrize("lp,rp", [(EUROC_L, EUROC_R), (TUM_L, TUM_R)],
                         ids=["euroc", "tum"])
def test_left_right_descriptor_repeatability(lp, rp):
    """Own-pattern rBRIEF must be repeatable across real stereo pairs:
    mutual brute-force matches plentiful and far below the TH_LOW gate."""
    import jax.numpy as jnp

    from gf_orb_slam2_tpu.config import (
        CameraConfig, CapacityConfig, ORBConfig, Sensor, SystemConfig,
    )
    from gf_orb_slam2_tpu.matching import matcher
    from gf_orb_slam2_tpu.system import System

    im_l = cv2.imread(lp, cv2.IMREAD_GRAYSCALE)
    im_r = cv2.imread(rp, cv2.IMREAD_GRAYSCALE)
    h, w = im_l.shape
    cam = CameraConfig(fx=435.0, fy=435.0, cx=w / 2, cy=h / 2,
                       bf=47.9, th_depth=35.0, width=w, height=h)
    cfg = SystemConfig(
        sensor=Sensor.MONOCULAR, camera=cam, orb=ORBConfig(n_features=800),
        capacity=CapacityConfig(max_keypoints=1024, max_map_points=2000,
                                max_keyframes=10, max_local_points=512),
    )
    slam = System(cfg)
    fl = slam._build_mono_frame(im_l, 0.0)
    fl.ensure_host()
    out_r = slam._get_frontend("mono")(jnp.asarray(im_r))
    m = matcher.match_all(
        jnp.asarray(fl.desc), jnp.asarray(fl.valid),
        out_r[3], out_r[5], th=matcher.TH_LOW, nn_ratio=0.85, mutual=True,
    )
    n = int(np.asarray(m.valid).sum())
    assert n >= 150, f"only {n} mutual L-R descriptor matches"
    dists = np.asarray(m.dist)[np.asarray(m.valid)]
    assert np.median(dists) <= 25, f"median Hamming {np.median(dists)}"
