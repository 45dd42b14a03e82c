"""Pallas kernel tests (interpret mode on CPU): exact agreement with the XLA
reference implementations."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from monocular_slam_tpu.ops import matching
from monocular_slam_tpu.ops.pallas import hamming


def rand_pm1(key, n):
    bits = jax.random.bernoulli(key, 0.5, (n, 256))
    return (bits.astype(jnp.int8) << 1) - jnp.int8(1)


class TestHammingKernel:
    def test_top2_matches_reference(self):
        a = rand_pm1(jax.random.PRNGKey(0), 300)
        b = rand_pm1(jax.random.PRNGKey(1), 700)
        bv = jnp.ones(700, bool).at[5].set(False)
        d1, d2, idx = hamming.hamming_top2(a, b, bv, interpret=True)

        D = np.asarray(matching.hamming_matrix(a, b)).astype(np.int64)
        D[:, ~np.asarray(bv)] = 1 << 20
        ref_idx = D.argmin(axis=1)
        ref_d1 = D.min(axis=1)
        D2 = D.copy()
        D2[np.arange(300), ref_idx] = 1 << 20
        ref_d2 = D2.min(axis=1)

        np.testing.assert_array_equal(np.asarray(d1), ref_d1)
        np.testing.assert_array_equal(np.asarray(d2), ref_d2)
        # argmin ties may differ only where distances tie
        same = np.asarray(idx) == ref_idx
        ties = ref_d1 == np.take_along_axis(D, np.asarray(idx)[:, None], 1)[:, 0]
        assert (same | ties).all()

    def test_match_pallas_equals_match(self):
        a = rand_pm1(jax.random.PRNGKey(2), 200)
        # make b related to a so matches are meaningful
        b = jnp.concatenate([a[:150], rand_pm1(jax.random.PRNGKey(3), 100)])
        av = jnp.ones(200, bool)
        bv = jnp.ones(250, bool)
        m_ref = matching.match(a, b, av, bv, ratio=0.8, cross_check=True)
        m_pal = hamming.match_pallas(a, b, av, bv, ratio=0.8, cross_check=True, interpret=True)
        np.testing.assert_array_equal(np.asarray(m_ref.ok), np.asarray(m_pal.ok))
        ok = np.asarray(m_ref.ok)
        np.testing.assert_array_equal(np.asarray(m_ref.idx)[ok], np.asarray(m_pal.idx)[ok])
        np.testing.assert_array_equal(np.asarray(m_ref.dist)[ok], np.asarray(m_pal.dist)[ok])

    def test_nondivisible_sizes(self):
        a = rand_pm1(jax.random.PRNGKey(4), 97)
        b = rand_pm1(jax.random.PRNGKey(5), 123)
        bv = jnp.ones(123, bool)
        d1, d2, idx = hamming.hamming_top2(a, b, bv, tile_n=64, tile_m=64, interpret=True)
        D = np.asarray(matching.hamming_matrix(a, b))
        np.testing.assert_array_equal(np.asarray(d1), D.min(axis=1))
        assert (np.asarray(idx) < 123).all()

    def test_all_invalid_b(self):
        a = rand_pm1(jax.random.PRNGKey(6), 32)
        b = rand_pm1(jax.random.PRNGKey(7), 64)
        bv = jnp.zeros(64, bool)
        d1, d2, idx = hamming.hamming_top2(a, b, bv, tile_n=32, tile_m=32, interpret=True)
        assert (np.asarray(d1) >= (1 << 20)).all()
