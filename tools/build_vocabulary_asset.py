#!/usr/bin/env python
"""Build the shipped vocabulary asset from the real image fixtures.

The reference loads a ~140 MB pretrained DBoW2 vocabulary trained on an
external corpus (reference: src/System.cc:78-84; ORB_Data repo). This
environment has no dataset egress, so the asset is trained on descriptors
from the in-repo real image fixtures (/root/reference/test/*.png — EuRoC and
TUM stereo pairs) under a broad augmentation sweep (perspective warps,
scales, rotations, brightness/blur) plus multi-scale procedural textures —
~100k+ own-pattern rBRIEF descriptors. k=10 × 4 levels = 10k words.

Usage: JAX_PLATFORMS=cpu python tools/build_vocabulary_asset.py \
           [--out gf_orb_slam2_tpu/assets/vocab10k.npz]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

FIXTURES = [
    "/root/reference/test/EuRoC_l.png",
    "/root/reference/test/EuRoC_r.png",
    "/root/reference/test/TUM_l.png",
    "/root/reference/test/TUM_r.png",
]


def augmented_views(img, rng, n=24):
    """Perspective/scale/rotation/photometric variants of one image."""
    import cv2

    h, w = img.shape
    out = [img]
    for _ in range(n):
        # random homography: rotation + scale + perspective jitter
        ang = rng.uniform(-30, 30)
        sc = rng.uniform(0.6, 1.4)
        M = cv2.getRotationMatrix2D((w / 2, h / 2), ang, sc)
        H = np.vstack([M, [0, 0, 1]]).astype(np.float32)
        pert = rng.uniform(-8e-5, 8e-5, 2).astype(np.float32)
        H[2, :2] += pert
        v = cv2.warpPerspective(img, H, (w, h), borderMode=cv2.BORDER_REFLECT)
        gain = rng.uniform(0.6, 1.4)
        bias = rng.uniform(-25, 25)
        v = np.clip(v.astype(np.float32) * gain + bias, 0, 255).astype(np.uint8)
        if rng.random() < 0.3:
            v = cv2.GaussianBlur(v, (5, 5), rng.uniform(0.5, 1.5))
        out.append(v)
    return out


def procedural_textures(rng, n=12, h=480, w=640):
    import cv2

    outs = []
    for _ in range(n):
        tex = rng.uniform(0, 255, (h // 8, w // 8)).astype(np.float32)
        tex = cv2.resize(tex, (w, h), interpolation=cv2.INTER_CUBIC)
        tex += cv2.resize(
            rng.uniform(-70, 70, (h // 2, w // 2)).astype(np.float32), (w, h),
            interpolation=cv2.INTER_CUBIC)
        tex += cv2.resize(
            rng.uniform(-40, 40, (h // 32, w // 32)).astype(np.float32), (w, h),
            interpolation=cv2.INTER_CUBIC)
        outs.append(np.clip(tex, 0, 255).astype(np.uint8))
    return outs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "gf_orb_slam2_tpu", "assets", "vocab10k.npz"))
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--levels", type=int, default=4)
    ap.add_argument("--views-per-image", type=int, default=24)
    ap.add_argument("--max-desc", type=int, default=160000)
    args = ap.parse_args()

    import cv2
    import jax.numpy as jnp

    from gf_orb_slam2_tpu.config import ORBConfig
    from gf_orb_slam2_tpu.features.extractor import ORBExtractor

    rng = np.random.default_rng(0)
    images = []
    for p in FIXTURES:
        img = cv2.imread(p, cv2.IMREAD_GRAYSCALE)
        if img is None:
            print(f"missing fixture {p}", file=sys.stderr)
            continue
        images.extend(augmented_views(img, rng, args.views_per_image))
    images.extend(procedural_textures(rng))
    print(f"{len(images)} corpus images")

    extractors = {}
    descs = []
    for i, img in enumerate(images):
        key = img.shape
        if key not in extractors:
            extractors[key] = ORBExtractor(
                ORBConfig(n_features=1200), *img.shape)
        f = extractors[key](jnp.asarray(img))
        d = np.asarray(f.desc)[np.asarray(f.valid)]
        descs.append(d)
        if (i + 1) % 20 == 0:
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
