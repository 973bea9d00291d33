#!/usr/bin/env python
"""Loop-candidate retrieval quality: vocab10k vs vocab100k (VERDICT r4 #6).

Protocol: extract ORB on every 3rd frame of the rendered circuit
(tests/test_loop_rendered.py cache), build sparse tf-idf BoW vectors with
each vocabulary, and for every query frame in the revisit segment rank all
temporally-distant earlier frames by cosine score. A retrieval is CORRECT
if the top-ranked frame's ground-truth camera center lies within 1.0 m and
30° yaw of the query's. Reports top-1 precision, recall@1 (fraction of
revisit queries whose true neighbor is ranked first), mean margin, and
per-query transform+score latency.

Usage: JAX_PLATFORMS=cpu python tools/vocab_compare.py
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np


def main():
    from tests.test_loop_rendered import _rendered_frames

    from gf_orb_slam2_tpu.config import ORBConfig
    from gf_orb_slam2_tpu.features.extractor import ORBExtractor
    from gf_orb_slam2_tpu.place.vocabulary import Vocabulary

    poses, frames = _rendered_frames()
    idx = list(range(0, len(frames), 3))
    ex = ORBExtractor(ORBConfig(n_features=800), 480, 640)
    descs = []
    import jax.numpy as jnp

    for i in idx:
        f = ex(jnp.asarray(np.clip(frames[i][0], 0, 255).astype(np.uint8)))
        descs.append(np.asarray(f.desc)[np.asarray(f.valid)])
    centers = [-poses[i][0].T @ poses[i][1] for i in idx]
    yaws = [np.arctan2(poses[i][0][0, 2], poses[i][0][2, 2]) for i in idx]

    adir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "gf_orb_slam2_tpu", "assets")
    out = {}
    for name in ("vocab10k.npz", "vocab100k.npz"):
        path = os.path.join(adir, name)
        if not os.path.exists(path):
            continue
        voc = Vocabulary.load(path)
        t0 = time.perf_counter()
        bows = [voc.bow_sparse(d) for d in descs]
        t_bow = (time.perf_counter() - t0) / len(descs) * 1e3

        def score(a, b):
            ia, wa = a
            ib, wb = b
            common, ca, cb = np.intersect1d(ia, ib, return_indices=True)
            return float(np.dot(wa[ca], wb[cb]))

        n_correct = n_q = 0
        margins = []
        t0 = time.perf_counter()
        for qi in range(len(idx)):
            if idx[qi] < 100:  # query only the revisit segment
                continue
            cands = [ci for ci in range(len(idx)) if idx[qi] - idx[ci] >= 60]
            if not cands:
                continue
            sc = [(score(bows[qi], bows[ci]), ci) for ci in cands]
            sc.sort(reverse=True)
            best, ci = sc[0]
            d = np.linalg.norm(centers[qi] - centers[ci])
            dyaw = abs((yaws[qi] - yaws[ci] + np.pi) % (2 * np.pi) - np.pi)
            n_q += 1
            ok = d < 1.0 and dyaw < np.radians(30)
            n_correct += ok
            if len(sc) > 1 and sc[1][0] > 0:
                margins.append(best / sc[1][0])
        t_q = (time.perf_counter() - t0) / max(n_q, 1) * 1e3
        out[name] = {
            "words": int(voc.V),
            "top1_precision": round(n_correct / max(n_q, 1), 3),
            "n_queries": n_q,
            "mean_top1_margin": round(float(np.mean(margins)), 3),
            "bow_transform_ms": round(t_bow, 2),
            "query_ms": round(t_q, 2),
        }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
