"""FAST-9/16 corner detection as dense vectorized XLA ops.

TPU-native replacement for the reference's three FAST backends: plain OpenCV
CPU FAST (src/ORBextractor.cc:767 ComputeKeyPointsOctTree), the CUDA tiled
kernel `tileCalcKeypoints_kernel` (src/cuda/Fast_gpu.cu:284) and the NEON SIMD
path (src/FAST_NEON.cc). Instead of per-tile scalar loops we evaluate the
segment test for EVERY pixel at once on the VPU: 16 shifted copies of the
image, windowed-min over circular arcs via log-step reductions, then 3x3 NMS.
XLA fuses the whole thing into a few elementwise passes — there is no
data-dependent control flow at all.

The per-pixel score is the OpenCV-compatible "max threshold for which the
pixel remains a corner" (V-score), so NMS ordering matches the reference's
cornerScore semantics (src/cuda/Fast_gpu.cu isCorner/cornerScore).
"""
from __future__ import annotations

import jax.numpy as jnp

# Bresenham circle of radius 3 — the standard FAST-16 ring, clockwise from
# 12 o'clock. (dy, dx) offsets.
CIRCLE16 = (
    (-3, 0), (-3, 1), (-2, 2), (-1, 3), (0, 3), (1, 3), (2, 2), (3, 1),
    (3, 0), (3, -1), (2, -2), (1, -3), (0, -3), (-1, -3), (-2, -2), (-3, -1),
)


def _ring_stack(img):
    """[H,W] → [16,H,W] of ring neighbors via jnp.roll (borders masked later)."""
    return jnp.stack(
        [jnp.roll(img, shift=(-dy, -dx), axis=(0, 1)) for dy, dx in CIRCLE16], 0
    )


def _windowed_min9(d):
    """[16,H,W] circular → [16,H,W] where out[i] = min(d[i..i+8] mod 16).

    Log-step reduction: min2/min4/min8 then min9 = min(min8, shifted d[+8]).
    """
    def sh(x, k):
        return jnp.roll(x, shift=-k, axis=0)

    m2 = jnp.minimum(d, sh(d, 1))
    m4 = jnp.minimum(m2, sh(m2, 2))
    m8 = jnp.minimum(m4, sh(m4, 4))
    return jnp.minimum(m8, sh(d, 8))


def fast_score(img):
    """Per-pixel FAST-9/16 corner V-score for the whole image.

    img: [H, W] float32 (grayscale, any scale).
    Returns score [H, W] float32: the largest threshold t such that the pixel
    passes the segment test (9 contiguous ring pixels all > c+t or all < c-t).
    score <= 0 means not a corner at any positive threshold.
    """
    ring = _ring_stack(img)
    d = ring - img[None]  # [16,H,W]
    # brightest arc: max over starts of min over 9 consecutive (d > t ∀ arc)
    v_bright = jnp.max(_windowed_min9(d), axis=0)
    # darkest arc on -d
    v_dark = jnp.max(_windowed_min9(-d), axis=0)
    return jnp.maximum(v_bright, v_dark)


def nms3(score):
    """3x3 non-maximum suppression: keep pixels that are the strict max of
    their 8-neighborhood (ties broken toward top-left)."""
    neigh = []
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy == 0 and dx == 0:
                continue
            neigh.append(jnp.roll(score, shift=(-dy, -dx), axis=(0, 1)))
    nmax = jnp.max(jnp.stack(neigh, 0), axis=0)
    # tie-break: must strictly beat the raster-order-preceding neighbors so a
    # plateau yields exactly one winner
    prev = []
    for dy, dx in ((-1, -1), (-1, 0), (-1, 1), (0, -1)):
        prev.append(jnp.roll(score, shift=(-dy, -dx), axis=(0, 1)))
    pmax = jnp.max(jnp.stack(prev, 0), axis=0)
    return (score >= nmax) & (score > pmax)


def detect(img, threshold, border):
    """Full detection pass: scores + NMS + border/threshold mask.

    Returns (score, keep_mask), both [H, W].
    """
    s = fast_score(img)
    h, w = img.shape
    ys = jnp.arange(h)[:, None]
    xs = jnp.arange(w)[None, :]
    in_border = (
        (ys >= border) & (ys < h - border) & (xs >= border) & (xs < w - border)
    )
    keep = nms3(s) & (s > threshold) & in_border
    return s, keep
