"""Pallas kernel correctness (interpret mode on CPU; compiled path on TPU)."""
import numpy as np
import jax.numpy as jnp

from gf_orb_slam2_tpu.matching.hamming import distance_matrix
from gf_orb_slam2_tpu.ops.pallas_hamming import distance_matrix_pallas


class TestPallasHamming:
    def test_matches_xla(self):
        rng = np.random.default_rng(0)
        a = jnp.asarray(rng.integers(0, 2**32, (256, 8), dtype=np.uint32))
        b = jnp.asarray(rng.integers(0, 2**32, (512, 8), dtype=np.uint32))
        d_pallas = distance_matrix_pallas(a, b, interpret=True)
        d_xla = distance_matrix(a, b)
        np.testing.assert_array_equal(np.asarray(d_pallas), np.asarray(d_xla))

    def test_fallback_on_ragged_shapes(self):
        rng = np.random.default_rng(1)
        a = jnp.asarray(rng.integers(0, 2**32, (100, 8), dtype=np.uint32))
        b = jnp.asarray(rng.integers(0, 2**32, (70, 8), dtype=np.uint32))
        d = distance_matrix_pallas(a, b)
        np.testing.assert_array_equal(np.asarray(d), np.asarray(distance_matrix(a, b)))
