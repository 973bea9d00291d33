#!/usr/bin/env python
"""Train a binary BoW vocabulary from images and save it as .npz.

Replaces the reference's offline DBoW2 vocabulary workflow + text→binary
converter (reference: tools/bin_vocabulary.cc; the pretrained ~140MB
ORBvoc lives in the external ORB_Data repo, README.md:63-66). Our
vocabularies are compact (k^levels words) and train in minutes from a
directory of images.

Usage:
  python tools/train_vocabulary.py --images /data/seq/*.png --out voc.npz \
      --k 10 --levels 4
"""
import argparse
import glob

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", nargs="+", required=True, help="paths or globs")
    ap.add_argument("--out", required=True)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--levels", type=int, default=3)
    ap.add_argument("--n-features", type=int, default=1000)
    ap.add_argument("--max-desc", type=int, default=200000)
    args = ap.parse_args()

    import cv2
    import jax.numpy as jnp

    from gf_orb_slam2_tpu.config import ORBConfig
    from gf_orb_slam2_tpu.features.extractor import ORBExtractor
    from gf_orb_slam2_tpu.place.vocabulary import Vocabulary

    paths = []
    for pattern in args.images:
        paths.extend(sorted(glob.glob(pattern)))
    if not paths:
        raise SystemExit("no images matched")
    extractors = {}
    descs = []
    for p in paths:
        img = cv2.imread(p, cv2.IMREAD_GRAYSCALE)
        if img is None:
            continue
        key = img.shape
        if key not in extractors:
            extractors[key] = ORBExtractor(
                ORBConfig(n_features=args.n_features), *img.shape
            )
        f = extractors[key](jnp.asarray(img))
        d = np.asarray(f.desc)[np.asarray(f.valid)]
        descs.append(d)
        print(f"{p}: {len(d)} descriptors")
    data = np.concatenate(descs, 0)
    if len(data) > args.max_desc:
        data = data[np.random.default_rng(0).choice(len(data), args.max_desc, replace=False)]
    print(f"training on {len(data)} descriptors, k={args.k} levels={args.levels} "
          f"({args.k ** args.levels} words)")
    voc = Vocabulary.train(data, k=args.k, levels=args.levels)
    voc.save(args.out)
    print(f"saved {args.out}")


if __name__ == "__main__":
    main()
