"""Stage-level frontend profiler on the real TPU.

The relay adds ~30 ms per blocking round-trip and `block_until_ready` is a
no-op (CLAUDE.md), so each stage is timed as K data-dependent iterations
folded into ONE jitted program, fetched with a single `jax.device_get`.
The data dependence (output scalar folded back into the input) prevents XLA
from hoisting the loop body.

Usage:  python tools/profile_frontend.py [--iters 16]
"""
from __future__ import annotations

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from gf_orb_slam2_tpu.config import ORBConfig
from gf_orb_slam2_tpu.features.extractor import ORBExtractor
from gf_orb_slam2_tpu.ops import fast, orb, select

H, W = 480, 640


def timed_loop(fn, args, iters, perturb=None):
    """Compile fn folded K times with a data dependence; return ms/iter."""
    if perturb is None:
        # default: add (0 * scalar(out)) to the first arg
        def perturb(args, out_scalar):
            return (args[0] + 0.0 * out_scalar,) + tuple(args[1:])

    @jax.jit
    def prog(*a):
        def body(_, carry):
            a_, acc = carry
            out = fn(*a_)
            s = _to_scalar(out)
            return perturb(a_, s), acc + s

        (_, acc) = jax.lax.fori_loop(0, iters, body, (a, jnp.float32(0.0)))
        return acc

    # warm-up compile (not timed)
    r = prog(*args)
    jax.device_get(r)
    t0 = time.perf_counter()
    r = prog(*args)
    jax.device_get(r)
    t1 = time.perf_counter()
    return (t1 - t0) * 1e3 / iters


def _to_scalar(out):
    leaves = jax.tree_util.tree_leaves(out)
    s = jnp.float32(0.0)
    for leaf in leaves:
        s = s + jnp.sum(leaf[..., :1].astype(jnp.float32)) * 1e-9
    return s


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=16)
    args = ap.parse_args()
    K = args.iters

    rng = np.random.default_rng(0)
    img = rng.uniform(0, 255, (H, W)).astype(np.float32)
    cfg = ORBConfig(n_features=800)
    ex = ORBExtractor(cfg, H, W)
    L = cfg.n_levels
    H0, W0 = ex.sizes[0]
    n_total = ex.n_total

    img_d = jnp.asarray(img)

    results = {}

    # -- stage 1: pyramid build (resize all levels + pad + stack)
    def pyramid(im):
        level_imgs = [im]
        for lv in range(1, L):
            h, w = ex.sizes[lv]
            level_imgs.append(jax.image.resize(im, (h, w), "linear"))
        return jnp.stack([
            jnp.pad(li, ((0, H0 - li.shape[0]), (0, W0 - li.shape[1])))
            for li in level_imgs
        ])

    results["pyramid_resize"] = timed_loop(pyramid, (img_d,), K)

    stack = jax.device_get(jax.jit(pyramid)(img_d))
    stack_d = jnp.asarray(stack)
    hl = jnp.asarray([h for h, w in ex.sizes], jnp.int32)
    wl = jnp.asarray([w for h, w in ex.sizes], jnp.int32)

    # -- stage 2: FAST detect (score + NMS + masks)
    border = cfg.edge_threshold - 3
    results["fast_detect"] = timed_loop(
        lambda s: fast.detect(s, float(cfg.min_th_fast), border, (hl, wl)),
        (stack_d,), K)

    # -- stage 3: cell top-K + ranked top-N
    score, keep = jax.jit(
        lambda s: fast.detect(s, float(cfg.min_th_fast), border, (hl, wl))
    )(stack_d)
    N_CAP = max(ex.counts)

    def sel(score_, keep_):
        vals, ys, xs, rank = jax.vmap(
            lambda s, k: select.cell_topk(s, k, cfg.cell_size, cfg.per_cell_k)
        )(score_, keep_)
        return jax.vmap(
            lambda v, y, x, r: select.ranked_topn(v, y, x, r, N_CAP)
        )(vals, ys, xs, rank)

    results["cell_topk_topn"] = timed_loop(sel, (score, keep), K)

    # prepare a flat keypoint set like the extractor's
    feats = ex(img_d)
    li = jax.device_get(feats.octave)
    yx = np.stack([
        jax.device_get(feats.uv)[:, 1] / np.asarray(ex.scales)[li],
        jax.device_get(feats.uv)[:, 0] / np.asarray(ex.scales)[li],
    ], -1).astype(np.float32)
    li_d = jnp.asarray(li)
    yx_d = jnp.asarray(yx)

    # -- stage 4: patch gather [n,37,37]
    def pg(stack_, yx_):
        return orb.patches_at_flat(stack_, li_d, yx_)

    results["patch_gather"] = timed_loop(pg, (stack_d, yx_d), K)

    patches = jax.device_get(jax.jit(pg)(stack_d, yx_d))
    patches_d = jnp.asarray(patches)

    # -- stage 5: IC angle einsum on patches
    def ang(p):
        center31 = p[..., 3:34, 3:34]
        kx, ky = orb._ic_kernels()
        m10 = jnp.einsum("nab,ab->n", center31, jnp.asarray(kx))
        m01 = jnp.einsum("nab,ab->n", center31, jnp.asarray(ky))
        return jnp.arctan2(m01, m10)

    results["ic_angle"] = timed_loop(ang, (patches_d,), K)

    # -- stage 6: per-patch blur
    results["patch_blur"] = timed_loop(lambda p: orb._blur_patch(p), (patches_d,), K)

    # -- stage 7: rBRIEF sample gather + pack (current formulation)
    angles = jax.device_get(jax.jit(ang)(patches_d))
    angles_d = jnp.asarray(angles)
    blurred = jax.device_get(jax.jit(orb._blur_patch)(patches_d))
    blurred_d = jnp.asarray(blurred)

    def rbrief(blur_, angles_):
        pat = jnp.asarray(orb.brief_pattern())
        c, s = jnp.cos(angles_), jnp.sin(angles_)
        dy = pat[None, :, :, 0]
        dx = pat[None, :, :, 1]
        ry = dx * s[:, None, None] + dy * c[:, None, None]
        rx = dx * c[:, None, None] - dy * s[:, None, None]
        py = jnp.clip(jnp.round(15.0 + ry).astype(jnp.int32), 0, 30)
        px = jnp.clip(jnp.round(15.0 + rx).astype(jnp.int32), 0, 30)
        n = angles_.shape[0]
        ni = jnp.arange(n)[:, None, None]
        vals = blur_[ni, py, px]
        bits = (vals[..., 0] < vals[..., 1]).astype(jnp.uint32)
        bits = bits.reshape(n, 8, 32)
        weights = jnp.uint32(1) << jnp.arange(32, dtype=jnp.uint32)
        return jnp.sum(bits * weights, axis=-1, dtype=jnp.uint32)

    results["rbrief_gather"] = timed_loop(
        rbrief, (blurred_d, angles_d), K,
        perturb=lambda a, s: (a[0] + 0.0 * s, a[1] + 0.0 * s))

    # -- candidate A: one-hot matmul rBRIEF with quantized angle bins
    #    (folds the blur into the sampling matrix; pure MXU work)
    A_BINS = 32

    @functools.lru_cache()
    def sample_matrix():
        """S'[1369, A*512]: raw 37x37 patch -> blurred sample at each
        rotated pattern point for each angle bin."""
        pat = orb.brief_pattern()  # [256,2,2]
        g = orb._gauss_kernel()  # 7-tap
        blur2d = np.outer(g, g)  # [7,7]
        Smat = np.zeros((37 * 37, A_BINS * 512), np.float32)
        for b in range(A_BINS):
            th = 2 * np.pi * b / A_BINS
            c, s = np.cos(th), np.sin(th)
            dy = pat[:, :, 0]
            dx = pat[:, :, 1]
            ry = dx * s + dy * c  # [256,2]
            rx = dx * c - dy * s
            py = np.clip(np.round(15.0 + ry).astype(np.int64), 0, 30)
            px = np.clip(np.round(15.0 + rx).astype(np.int64), 0, 30)
            # blurred[py,px] = sum_{u,v} blur2d[u,v] * raw[py+u-3+3, px+v-3+3]
            # raw coords: blurred (15,15) center = raw (18,18); blurred idx +3
            for j in range(512):
                p_, q_ = py.reshape(-1)[j], px.reshape(-1)[j]
                for u in range(7):
                    for v in range(7):
                        Smat[(p_ + u) * 37 + (q_ + v), b * 512 + j] += blur2d[u, v]
        return Smat

    Smat_np = sample_matrix()
    S_d = jnp.asarray(Smat_np)

    def rbrief_onehot(patches_, angles_):
        n = angles_.shape[0]
        flat = patches_.reshape(n, 37 * 37)
        vals_all = jnp.dot(flat, S_d, preferred_element_type=jnp.float32)
        vals_all = vals_all.reshape(n, A_BINS, 512)
        bins = jnp.mod(
            jnp.round(angles_ / (2 * jnp.pi / A_BINS)).astype(jnp.int32), A_BINS)
        onehot = jax.nn.one_hot(bins, A_BINS, dtype=jnp.float32)
        vals = jnp.einsum("nas,na->ns", vals_all, onehot)
        vals = vals.reshape(n, 256, 2)
        bits = (vals[..., 0] < vals[..., 1]).astype(jnp.uint32)
        bits = bits.reshape(n, 8, 32)
        weights = jnp.uint32(1) << jnp.arange(32, dtype=jnp.uint32)
        return jnp.sum(bits * weights, axis=-1, dtype=jnp.uint32)

    results["rbrief_onehot_matmul"] = timed_loop(
        rbrief_onehot, (patches_d, angles_d), K,
        perturb=lambda a, s: (a[0] + 0.0 * s, a[1] + 0.0 * s))

    # -- candidate B: patch gather via row gather + col one-hot matmul
    def pg_rowcol(stack_, yx_):
        d = jnp.arange(-orb.PATCH_R, orb.PATCH_R + 1)
        y = jnp.clip(yx_[:, 0:1].astype(jnp.int32) + d[None, :], 0, H0 - 1)
        x = jnp.clip(yx_[:, 1:2].astype(jnp.int32) + d[None, :], 0, W0 - 1)
        rows = stack_[li_d[:, None], y]  # [n,37,W0] row gather
        onehot = jax.nn.one_hot(x, W0, dtype=jnp.float32)  # [n,37,W0]
        return jnp.einsum("nrw,nsw->nrs", rows, onehot)

    results["patch_gather_rowcol"] = timed_loop(pg_rowcol, (stack_d, yx_d), K)

    # -- full extractor for reference
    results["full_extractor"] = timed_loop(lambda im: ex._extract(im), (img_d,), K)

    # -- full extractor on both stereo images via vmap (what System uses)
    both = jnp.stack([img_d, img_d + 1.0])
    results["full_extractor_x2_vmap"] = timed_loop(
        lambda ims: jax.vmap(ex._extract)(ims), (both,), K)

    print("\n== frontend stage times (ms/iter, K=%d) ==" % K)
    for k, v in results.items():
        print(f"{k:28s} {v:8.2f}")


if __name__ == "__main__":
    main()
