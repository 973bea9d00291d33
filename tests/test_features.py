"""ORB front-end tests.

Mirrors the reference's test/test_Stereo.cpp image-fixture style: synthetic
checkerboard/corner images with known corner locations, plus (when available)
the real EuRoC/TUM PNG fixtures shipped in the reference repo — loaded
read-only, never copied.
"""
import os

import jax.numpy as jnp
import numpy as np
import pytest

from gf_orb_slam2_tpu.config import ORBConfig
from gf_orb_slam2_tpu.features.extractor import ORBExtractor, features_per_level
from gf_orb_slam2_tpu.ops import fast, orb

REF_IMG = "/root/reference/test/EuRoC_l.png"


def blocks(h=240, w=320, sq=24, fill=12):
    """Dark background with bright squares: L-corners are true FAST-9 corners
    (X-junctions of an ideal checkerboard are NOT — the ring splits 8+8)."""
    ys, xs = np.mgrid[0:h, 0:w]
    inside = ((ys % sq) < fill) & ((xs % sq) < fill)
    return (inside * 200.0 + 20.0).astype(np.float32)


class TestFast:
    def test_detects_block_corners(self):
        img = blocks()
        score, keep = fast.detect(jnp.asarray(img), 10.0, border=16)
        ys, xs = np.nonzero(np.asarray(keep))
        assert len(ys) > 20
        # detections near block corners: positions mod 24 close to {0, 12}
        dy = np.minimum.reduce([ys % 24, np.abs(ys % 24 - 12), 24 - ys % 24])
        dx = np.minimum.reduce([xs % 24, np.abs(xs % 24 - 12), 24 - xs % 24])
        assert np.percentile(dy + dx, 90) <= 6

    def test_flat_image_no_corners(self):
        img = jnp.full((100, 100), 50.0)
        _, keep = fast.detect(img, 10.0, border=16)
        assert int(keep.sum()) == 0

    def test_single_bright_dot(self):
        img = np.full((64, 64), 10.0, np.float32)
        img[32, 32] = 250.0
        score, keep = fast.detect(jnp.asarray(img), 20.0, border=3)
        assert bool(keep[32, 32])
        assert int(keep.sum()) == 1

    def test_score_is_max_threshold(self):
        img = np.full((64, 64), 100.0, np.float32)
        img[30:34, 30:34] = 180.0  # 4x4 bright block: corners are FAST corners
        s = np.asarray(fast.fast_score(jnp.asarray(img)))
        # corner pixel of block: ring has >=9 dark neighbors at diff 80
        assert s[30, 30] == pytest.approx(80.0)


class TestOrientation:
    def test_gradient_angle(self):
        # intensity increasing with +x → centroid points +x → angle ~ 0
        img = np.tile(np.arange(128, dtype=np.float32), (128, 1))
        a = float(orb.ic_angles(jnp.asarray(img), jnp.asarray([[64.0, 64.0]]))[0])
        assert abs(a) < 0.1
        # increasing with +y → angle ~ pi/2
        a2 = float(orb.ic_angles(jnp.asarray(img.T), jnp.asarray([[64.0, 64.0]]))[0])
        assert abs(a2 - np.pi / 2) < 0.1


class TestBrief:
    def test_descriptor_deterministic(self):
        img = blocks()
        b = orb.gaussian_blur(jnp.asarray(img))
        yx = jnp.asarray([[50.0, 60.0], [80.0, 100.0]])
        ang = jnp.asarray([0.3, -1.0])
        d1 = np.asarray(orb.brief_descriptors(b, yx, ang))
        d2 = np.asarray(orb.brief_descriptors(b, yx, ang))
        assert d1.shape == (2, 8) and d1.dtype == np.uint32
        np.testing.assert_array_equal(d1, d2)

    def test_rotation_invariance(self):
        """Descriptor computed with the patch rotated AND the angle adjusted
        should stay close in Hamming distance."""
        rng = np.random.default_rng(0)
        img = rng.uniform(0, 255, (201, 201)).astype(np.float32)
        img = np.asarray(orb.gaussian_blur(jnp.asarray(img), 7, 2.0))
        import scipy.ndimage as ndi

        ang_deg = 30.0
        rot = ndi.rotate(img, -ang_deg, reshape=False, order=1)
        c = jnp.asarray([[100.0, 100.0]])
        d0 = np.asarray(orb.brief_descriptors(jnp.asarray(img), c, jnp.asarray([0.0])))
        d1 = np.asarray(orb.brief_descriptors(jnp.asarray(rot), c, jnp.asarray([np.deg2rad(ang_deg)])))
        ham = bin(int.from_bytes(d0.tobytes(), "little") ^ int.from_bytes(d1.tobytes(), "little")).count("1")
        assert ham < 80  # well below random (~128)

    def test_distinct_patches_distinct_descriptors(self):
        rng = np.random.default_rng(1)
        img = rng.uniform(0, 255, (200, 200)).astype(np.float32)
        b = orb.gaussian_blur(jnp.asarray(img))
        yx = jnp.asarray([[60.0, 60.0], [140.0, 140.0]])
        d = np.asarray(orb.brief_descriptors(b, yx, jnp.zeros(2)))
        ham = bin(int.from_bytes(d[0].tobytes(), "little") ^ int.from_bytes(d[1].tobytes(), "little")).count("1")
        assert ham > 60


class TestExtractor:
    def test_budget_distribution(self):
        counts = features_per_level(800, 8, 1.2)
        assert sum(counts) == 800
        assert counts[0] > counts[1] > counts[-1] > 0

    def test_extract_checkerboard(self):
        cfg = ORBConfig(n_features=300, n_levels=4)
        ex = ORBExtractor(cfg, 240, 320)
        feats = ex(jnp.asarray(blocks()))
        n = int(feats.valid.sum())
        assert n > 150
        uv = np.asarray(feats.uv)[np.asarray(feats.valid)]
        assert uv[:, 0].max() < 320 and uv[:, 1].max() < 240
        # spatial spread: features should cover most of the image quadrants
        qx = (uv[:, 0] > 160).astype(int) * 2 + (uv[:, 1] > 120).astype(int)
        assert len(np.unique(qx)) == 4

    @pytest.mark.skipif(not os.path.exists(REF_IMG), reason="reference fixtures absent")
    def test_extract_real_euroc_image(self):
        import cv2

        img = cv2.imread(REF_IMG, cv2.IMREAD_GRAYSCALE)
        cfg = ORBConfig(n_features=800)
        ex = ORBExtractor(cfg, *img.shape)
        feats = ex(jnp.asarray(img))
        n = int(feats.valid.sum())
        assert n > 600  # real textured image should near-saturate the budget
        # angles populated and varied
        ang = np.asarray(feats.angle)[np.asarray(feats.valid)]
        assert ang.std() > 0.5
