"""Full-f32 matmul helpers for small-matrix geometry/optimization code.

TPU default matmul precision is bf16 passes on the MXU — fine for the big
feature/matching kernels, but catastrophic for 3x3/4x4 pose math and normal
equations (observed: 0.045 m triangulation error vs 1e-3 at full precision).
All geometry and BA modules route their contractions through these helpers.
"""
import functools

import jax
import jax.numpy as jnp

HIGHEST = jax.lax.Precision.HIGHEST

einsum = functools.partial(jnp.einsum, precision=HIGHEST)
matmul = functools.partial(jnp.matmul, precision=HIGHEST)
