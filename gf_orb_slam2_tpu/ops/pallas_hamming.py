"""Pallas TPU kernel: tiled 256-bit Hamming distance matrix.

The hottest matching op (matching/hamming.py runs it several times per
frame over [1024..4096]×[1024] descriptor sets). The XLA path materializes
the [N,M,8] XOR tensor in HBM; this kernel tiles the computation through
VMEM — each grid cell XOR+popcounts a [TN,8]×[TM,8] block and reduces in
registers, so HBM traffic is just the descriptor reads + the [N,M] result.

Falls back to the XLA formulation off-TPU (CPU tests) and for shapes that
don't tile.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

TILE_N = 256
TILE_M = 256


def _kernel(a_ref, b_ref, out_ref):
    from jax.experimental import pallas as pl  # noqa: F401

    a = a_ref[:]  # [TN, 8] uint32
    b = b_ref[:]  # [TM, 8] uint32
    x = jnp.bitwise_xor(a[:, None, :], b[None, :, :])  # [TN, TM, 8]
    d = jnp.sum(jax.lax.population_count(x).astype(jnp.int32), axis=-1)
    out_ref[:] = d


@functools.lru_cache()
def _build(n: int, m: int, interpret: bool = False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    grid = (n // TILE_N, m // TILE_M)
    return pl.pallas_call(
        _kernel,
        interpret=interpret,
        out_shape=jax.ShapeDtypeStruct((n, m), jnp.int32),
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=[
                pl.BlockSpec((TILE_N, 8), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((TILE_M, 8), lambda i, j: (j, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((TILE_N, TILE_M), lambda i, j: (i, j),
                                   memory_space=pltpu.VMEM),
        ),
    )


def distance_matrix_pallas(da, db, interpret: bool = False):
    """[N,8] × [M,8] uint32 → [N,M] int32. TPU-tiled; XLA fallback."""
    n, m = da.shape[0], db.shape[0]
    on_tpu = jax.devices()[0].platform == "tpu"
    if (not on_tpu and not interpret) or n % TILE_N or m % TILE_M:
        x = jnp.bitwise_xor(da[:, None, :], db[None, :, :])
        return jnp.sum(jax.lax.population_count(x), axis=-1).astype(jnp.int32)
    return _build(n, m, interpret)(da, db)
