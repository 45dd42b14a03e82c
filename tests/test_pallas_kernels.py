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


class TestFastScoreKernel:
    """Fused FAST-9 score+NMS kernel vs the XLA path (ops/fast.py)."""

    def _image(self, key, h=96, w=160):
        # smooth background + sharp corners so FAST has real responses
        img = 40.0 * jax.random.uniform(key, (h, w))
        img = img.at[20:40, 30:50].add(120.0)
        img = img.at[60:63, 100:140].add(90.0)
        img = img.at[75, 20].add(150.0)
        return img

    def test_score_nms_matches_xla(self):
        from monocular_slam_tpu.ops import fast
        from monocular_slam_tpu.ops.pallas import fast_score

        img = self._image(jax.random.PRNGKey(7))
        ref = fast.nms3(fast.corner_score(img, 20.0))
        out = fast_score.corner_score_nms(img, 20.0, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
        assert float(ref.max()) > 20.0  # the scene actually has corners

    def test_detect_matches_xla(self):
        from monocular_slam_tpu.ops import fast
        from monocular_slam_tpu.ops.pallas import fast_score

        img = self._image(jax.random.PRNGKey(8))
        ref = fast.detect(img, 64, 20.0)
        out = fast_score.detect(img, 64, 20.0, interpret=True)
        np.testing.assert_array_equal(np.asarray(ref.valid), np.asarray(out.valid))
        v = np.asarray(ref.valid)
        np.testing.assert_allclose(
            np.asarray(ref.score)[v], np.asarray(out.score)[v], atol=1e-5
        )
        # positions agree as sets (top_k tie order may differ)
        ref_set = {tuple(p) for p in np.asarray(ref.yx)[v].astype(int)}
        out_set = {tuple(p) for p in np.asarray(out.yx)[v].astype(int)}
        assert ref_set == out_set

    def test_nonaligned_shape(self):
        from monocular_slam_tpu.ops import fast
        from monocular_slam_tpu.ops.pallas import fast_score

        img = self._image(jax.random.PRNGKey(9), h=101, w=173)
        ref = fast.nms3(fast.corner_score(img, 15.0))
        out = fast_score.corner_score_nms(img, 15.0, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
