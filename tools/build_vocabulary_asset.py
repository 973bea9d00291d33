#!/usr/bin/env python
"""Build the shipped vocabulary asset from a LEAK-FREE procedural corpus.

The reference loads a ~140 MB pretrained DBoW2 vocabulary trained on an
external corpus (reference: src/System.cc:78-84; ORB_Data repo). This
environment has no dataset egress, so the asset is trained on descriptors
from PROCEDURAL texture imagery only — several texture families (multi-scale
value noise, warped checker/stripe grids, shape collages, dot fields) under
rotation/scale/perspective/photometric augmentation. The real image fixtures
(/root/reference/test/*.png) are deliberately EXCLUDED so that place-
recognition evaluation on them (tests/test_place_recognition.py) is held-out
— a vocabulary trained on its own eval imagery overstates discriminative
power. k=10 × 4 levels = 10k words.

Usage: JAX_PLATFORMS=cpu python tools/build_vocabulary_asset.py \
           [--out gf_orb_slam2_tpu/assets/vocab10k.npz]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def noise_texture(rng, h, w):
    import cv2

    tex = rng.uniform(0, 255, (h // 8, w // 8)).astype(np.float32)
    tex = cv2.resize(tex, (w, h), interpolation=cv2.INTER_CUBIC)
    tex += cv2.resize(
        rng.uniform(-70, 70, (h // 2, w // 2)).astype(np.float32), (w, h),
        interpolation=cv2.INTER_CUBIC)
    tex += cv2.resize(
        rng.uniform(-40, 40, (h // 32, w // 32)).astype(np.float32), (w, h),
        interpolation=cv2.INTER_CUBIC)
    return np.clip(tex, 0, 255).astype(np.uint8)


def grid_texture(rng, h, w):
    """Warped checker/stripe grids — man-made-structure-like corners."""
    import cv2

    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    fx = rng.uniform(0.02, 0.12)
    fy = rng.uniform(0.02, 0.12)
    ph = rng.uniform(0, np.pi, 2)
    pat = (np.sign(np.sin(xx * fx + ph[0])) *
           np.sign(np.sin(yy * fy + ph[1])))
    img = ((pat * 0.5 + 0.5) * rng.uniform(120, 255)).astype(np.float32)
    img += noise_texture(rng, h, w).astype(np.float32) * rng.uniform(0.1, 0.4)
    M = cv2.getRotationMatrix2D((w / 2, h / 2), rng.uniform(0, 180),
                                rng.uniform(0.7, 1.3))
    img = cv2.warpAffine(img, M, (w, h), borderMode=cv2.BORDER_REFLECT)
    return np.clip(img, 0, 255).astype(np.uint8)


def collage_texture(rng, h, w, n_shapes=140):
    """Random ellipse/rectangle collage — blob- and corner-rich."""
    import cv2

    img = np.full((h, w), rng.uniform(40, 200), np.float32)
    for _ in range(n_shapes):
        c = (int(rng.uniform(0, w)), int(rng.uniform(0, h)))
        val = float(rng.uniform(0, 255))
        if rng.random() < 0.5:
            ax = (int(rng.uniform(4, 60)), int(rng.uniform(4, 60)))
            cv2.ellipse(img, c, ax, rng.uniform(0, 180), 0, 360, val, -1)
        else:
            sz = (int(rng.uniform(6, 80)), int(rng.uniform(6, 80)))
            pts = cv2.boxPoints(((c[0], c[1]), sz, rng.uniform(0, 180)))
            cv2.fillPoly(img, [pts.astype(np.int32)], val)
    return np.clip(img, 0, 255).astype(np.uint8)


def dots_texture(rng, h, w):
    """Dot fields at random densities/sizes — FAST-friendly blobs."""
    import cv2

    img = np.full((h, w), rng.uniform(60, 200), np.float32)
    n = int(rng.uniform(200, 1500))
    for _ in range(n):
        c = (int(rng.uniform(0, w)), int(rng.uniform(0, h)))
        cv2.circle(img, c, int(rng.uniform(1, 7)), float(rng.uniform(0, 255)), -1)
    img = cv2.GaussianBlur(img, (3, 3), 0.8)
    return np.clip(img, 0, 255).astype(np.uint8)


FAMILIES = (noise_texture, grid_texture, collage_texture, dots_texture)


def augment(img, rng):
    import cv2

    h, w = img.shape
    ang = rng.uniform(-30, 30)
    sc = rng.uniform(0.6, 1.4)
    M = cv2.getRotationMatrix2D((w / 2, h / 2), ang, sc)
    H = np.vstack([M, [0, 0, 1]]).astype(np.float32)
    H[2, :2] += rng.uniform(-8e-5, 8e-5, 2).astype(np.float32)
    v = cv2.warpPerspective(img, H, (w, h), borderMode=cv2.BORDER_REFLECT)
    gain = rng.uniform(0.6, 1.4)
    bias = rng.uniform(-25, 25)
    v = np.clip(v.astype(np.float32) * gain + bias, 0, 255).astype(np.uint8)
    if rng.random() < 0.3:
        v = cv2.GaussianBlur(v, (5, 5), rng.uniform(0.5, 1.5))
    return v


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "gf_orb_slam2_tpu", "assets", "vocab10k.npz"))
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--levels", type=int, default=4)
    ap.add_argument("--n-base", type=int, default=40,
                    help="base textures per family")
    ap.add_argument("--views-per-image", type=int, default=2)
    ap.add_argument("--max-desc", type=int, default=160000)
    args = ap.parse_args()

    import jax.numpy as jnp

    from gf_orb_slam2_tpu.config import ORBConfig
    from gf_orb_slam2_tpu.features.extractor import ORBExtractor

    rng = np.random.default_rng(0)
    h, w = 480, 640
    images = []
    for fam in FAMILIES:
        for _ in range(args.n_base):
            base = fam(rng, h, w)
            images.append(base)
            for _ in range(args.views_per_image):
                images.append(augment(base, rng))
    print(f"{len(images)} corpus images (procedural only — fixtures held out)")

    ex = ORBExtractor(ORBConfig(n_features=1200), h, w)
    descs = []
    for i, img in enumerate(images):
        f = ex(jnp.asarray(img))
        d = np.asarray(f.desc)[np.asarray(f.valid)]
        descs.append(d)
        if (i + 1) % 40 == 0:
            print(f"  {i + 1}/{len(images)} images, "
                  f"{sum(len(x) for x in descs)} descriptors")
    data = np.concatenate(descs, 0)
    if len(data) > args.max_desc:
        data = data[rng.choice(len(data), args.max_desc, replace=False)]
    print(f"training on {len(data)} descriptors "
          f"({args.k ** args.levels} words)")
    from gf_orb_slam2_tpu.place.vocabulary import Vocabulary

    voc = Vocabulary.train(data, k=args.k, levels=args.levels, iters=6)
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    voc.save(args.out)
    sz = os.path.getsize(args.out) / 1e6
    print(f"saved {args.out} ({sz:.1f} MB)")


if __name__ == "__main__":
    main()
