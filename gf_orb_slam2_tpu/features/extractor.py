"""ORB pyramid feature extraction — the full front-end in one jitted program.

TPU-native replacement for ORBextractor (reference: src/ORBextractor.cc:982
CUDA operator() / :1112 CPU operator(), include/ORBextractor.h). The CUDA
path software-pipelines FAST/IC-angle/blur/rBRIEF kernels across pyramid
levels with streams (ORBextractor.cc:940-1063); here the whole pyramid is one
XLA program — the compiler overlaps and fuses everything, no manual streams.

Pipeline per level (all static shapes):
  resize → FAST score+NMS (ops/fast.py) → per-cell top-K + ranked top-N
  (ops/select.py, replaces DistributeOctTree) → IC-angle (ops/orb.py, dense
  moment convs) → Gaussian blur → rBRIEF (batched gather) → scale to level-0.

Outputs are fixed-capacity masked SoA arrays (SURVEY.md §7.1).
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gf_orb_slam2_tpu.config import ORBConfig
from gf_orb_slam2_tpu.ops import fast, orb, select


class Features(NamedTuple):
    """Per-frame keypoint set (SoA, fixed capacity N, masked by `valid`)."""

    uv: jnp.ndarray        # [N,2] float32 — (x, y) in level-0 pixel coords
    response: jnp.ndarray  # [N] float32 FAST V-score
    octave: jnp.ndarray    # [N] int32 pyramid level
    angle: jnp.ndarray     # [N] float32 radians
    desc: jnp.ndarray      # [N,8] uint32 — 256-bit rBRIEF
    valid: jnp.ndarray     # [N] bool

    @property
    def n(self):
        return jnp.sum(self.valid.astype(jnp.int32))


def level_sizes(h: int, w: int, n_levels: int, scale: float) -> Tuple[Tuple[int, int], ...]:
    out = []
    for lv in range(n_levels):
        f = scale ** lv
        out.append((max(32, int(round(h / f))), max(32, int(round(w / f)))))
    return tuple(out)


def features_per_level(n: int, n_levels: int, scale: float) -> Tuple[int, ...]:
    """Geometric distribution of the feature budget over levels
    (reference: ORBextractor ctor, src/ORBextractor.cc:~450)."""
    inv = 1.0 / scale
    base = n * (1 - inv) / (1 - inv ** n_levels)
    counts = [int(round(base * inv ** lv)) for lv in range(n_levels - 1)]
    counts.append(max(0, n - sum(counts)))
    return tuple(counts)


class ORBExtractor:
    """Stateless extractor: config in, jitted callable out.

    Unlike the reference's stateful class (pyramid buffers, CUDA streams),
    all state is in the XLA program; `__call__` is pure.
    """

    def __init__(self, cfg: ORBConfig, height: int, width: int):
        self.cfg = cfg
        self.height = height
        self.width = width
        self.sizes = level_sizes(height, width, cfg.n_levels, cfg.scale_factor)
        self.counts = features_per_level(cfg.n_features, cfg.n_levels, cfg.scale_factor)
        self.n_total = sum(self.counts)
        self.scales = tuple(cfg.scale_factor ** lv for lv in range(cfg.n_levels))
        self._jit = jax.jit(self._extract)

    def __call__(self, img) -> Features:
        """img: [H,W] uint8 or float32 grayscale → Features."""
        return self._jit(img)

    def _extract(self, img) -> Features:
        cfg = self.cfg
        img = img.astype(jnp.float32)
        border = cfg.edge_threshold - 3  # reference: EDGE_THRESHOLD-3 = 16

        uvs, resps, octs, angs, descs, valids = [], [], [], [], [], []
        level_img = img
        for lv in range(cfg.n_levels):
            h, w = self.sizes[lv]
            if lv > 0:
                level_img = jax.image.resize(level_img, (h, w), "linear")
            # detect at the permissive threshold; strong corners win by rank
            score, keep = fast.detect(level_img, float(cfg.min_th_fast), border)
            vals, ys, xs, rank = select.cell_topk(score, keep, cfg.cell_size, cfg.per_cell_k)
            n_l = self.counts[lv]
            if n_l == 0:
                continue
            ys_l, xs_l, sc_l, valid_l = select.ranked_topn(vals, ys, xs, rank, n_l)
            yx = jnp.stack([ys_l, xs_l], -1).astype(jnp.float32)
            ang_l = orb.ic_angles(level_img, yx)
            blurred = orb.gaussian_blur(level_img)
            desc_l = orb.brief_descriptors(blurred, yx, ang_l)
            s = self.scales[lv]
            uv_l = jnp.stack([xs_l.astype(jnp.float32) * s, ys_l.astype(jnp.float32) * s], -1)
            uvs.append(uv_l)
            resps.append(jnp.where(valid_l, sc_l, 0.0))
            octs.append(jnp.full((n_l,), lv, jnp.int32))
            angs.append(ang_l)
            descs.append(desc_l)
            valids.append(valid_l)

        return Features(
            uv=jnp.concatenate(uvs, 0),
            response=jnp.concatenate(resps, 0),
            octave=jnp.concatenate(octs, 0),
            angle=jnp.concatenate(angs, 0),
            desc=jnp.concatenate(descs, 0),
            valid=jnp.concatenate(valids, 0),
        )

    # ------------------------------------------------------------ utilities
    @functools.cached_property
    def sigma2(self) -> np.ndarray:
        """Per-octave measurement variance (scale^2l), reference
        ORBextractor mvLevelSigma2."""
        return np.asarray([s * s for s in self.scales], np.float32)

    @functools.cached_property
    def inv_sigma2(self) -> np.ndarray:
        return 1.0 / self.sigma2
