"""Tests for the loop-closure stack: vocabulary/BoW scoring, Sim3 alignment
RANSAC, and Sim3 pose-graph optimization."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from monocular_slam_tpu.geometry import alignment, se3, sim3, so3
from monocular_slam_tpu.optim import pose_graph
from monocular_slam_tpu.retrieval import vocabulary as vocab


def random_desc(key, n):
    bits = jax.random.bernoulli(key, 0.5, (n, 256))
    return (bits.astype(jnp.int8) << 1) - jnp.int8(1)


def perturb_desc(key, desc, n_flips):
    idx = jax.random.randint(key, (desc.shape[0], n_flips), 0, 256)
    flips = jax.nn.one_hot(idx, 256, dtype=jnp.bool_).any(axis=1)
    return jnp.where(flips, -desc, desc)


class TestVocabulary:
    @pytest.fixture(scope="class")
    def voc(self):
        desc = random_desc(jax.random.PRNGKey(0), 2000)
        return vocab.train(np.asarray(desc), k=6, L=3, seed=1)

    def test_tree_shapes(self, voc):
        assert voc.n_words == 216
        assert [n.shape[0] for n in voc.nodes] == [6, 36, 216]
        assert voc.weights.shape == (216,)

    def test_transform_matches_numpy_reference(self, voc):
        desc = random_desc(jax.random.PRNGKey(2), 100)
        w_jax = np.asarray(
            vocab.transform_words(voc, desc, jnp.ones(100, bool))
        )
        w_np = vocab._transform_words_np(
            [np.asarray(n) for n in voc.nodes], voc.k, voc.L, np.asarray(desc)
        )
        np.testing.assert_array_equal(w_jax, w_np)

    def test_same_frame_scores_highest(self, voc):
        key = jax.random.PRNGKey(3)
        frames = [random_desc(jax.random.fold_in(key, i), 200) for i in range(6)]
        # query = noisy copy of frame 2
        query = perturb_desc(jax.random.PRNGKey(9), frames[2], 10)
        valid = jnp.ones(200, bool)
        db = jnp.stack([vocab.bow_vector(voc, f, valid) for f in frames])
        q = vocab.bow_vector(voc, query, valid)
        scores = np.asarray(vocab.score_against_database(q, db, "l1"))
        assert scores.argmax() == 2
        # clear margin over the best non-matching frame (uniform random
        # descriptors give a high similarity floor; real ORB clusters better)
        assert scores[2] > np.delete(scores, 2).max() + 0.1

    def test_scoring_schemes_all_run(self, voc):
        a = jnp.abs(jax.random.normal(jax.random.PRNGKey(4), (216,)))
        a = a / a.sum()
        b = jnp.abs(jax.random.normal(jax.random.PRNGKey(5), (216,)))
        b = b / b.sum()
        for name, fn in vocab.SCORING.items():
            v = float(fn(a, b))
            assert np.isfinite(v), name
        # identity scores
        assert float(vocab.score_l1(a, a)) == pytest.approx(1.0)
        assert float(vocab.score_l2(a, a)) == pytest.approx(1.0, abs=1e-6)
        assert float(vocab.score_kl(a, a)) == pytest.approx(0.0, abs=1e-9)

    def test_save_load_roundtrip(self, voc, tmp_path):
        p = str(tmp_path / "voc.npz")
        vocab.save(p, voc)
        voc2 = vocab.load(p)
        desc = random_desc(jax.random.PRNGKey(6), 50)
        np.testing.assert_array_equal(
            np.asarray(vocab.transform_words(voc, desc, jnp.ones(50, bool))),
            np.asarray(vocab.transform_words(voc2, desc, jnp.ones(50, bool))),
        )


class TestSim3Alignment:
    def test_horn_exact(self):
        key = jax.random.PRNGKey(7)
        X = jax.random.normal(key, (50, 3))
        S_true = sim3.pack(so3.exp(jnp.array([0.2, -0.4, 0.1])), jnp.array([1.0, -2.0, 0.5]), jnp.asarray(1.7))
        Y = sim3.apply(S_true, X)
        S = alignment.horn_sim3(X, Y)
        np.testing.assert_allclose(np.asarray(sim3.apply(S, X)), np.asarray(Y), atol=1e-9)
        R, t, s = sim3.unpack(S)
        assert float(s) == pytest.approx(1.7, abs=1e-9)

    def test_ransac_with_outliers(self):
        key = jax.random.PRNGKey(8)
        X = jax.random.normal(key, (100, 3)) * 2.0
        S_true = sim3.pack(so3.exp(jnp.array([0.1, 0.3, -0.2])), jnp.array([0.5, 0.2, -1.0]), jnp.asarray(0.8))
        Y = sim3.apply(S_true, X)
        Y = Y.at[:30].add(jax.random.normal(jax.random.PRNGKey(9), (30, 3)) * 3.0)
        res = alignment.ransac_sim3(
            jax.random.PRNGKey(10), X, Y, jnp.ones(100, bool), thresh=0.05
        )
        assert bool(res.ok)
        inl = np.asarray(res.inliers)
        assert inl[:30].mean() < 0.2 and inl[30:].mean() > 0.95
        np.testing.assert_allclose(
            np.asarray(sim3.apply(res.S, X[30:])), np.asarray(Y[30:]), atol=1e-6
        )

    def test_no_scale_mode(self):
        X = jax.random.normal(jax.random.PRNGKey(11), (20, 3))
        T = se3.exp(jnp.array([0.1, 0.2, -0.1, 1.0, 0.0, 0.5]))
        Y = se3.apply(T, X)
        S = alignment.horn_sim3(X, Y, with_scale=False)
        _, _, s = sim3.unpack(S)
        assert float(s) == 1.0
        np.testing.assert_allclose(np.asarray(sim3.apply(S, X)), np.asarray(Y), atol=1e-9)


class TestPoseGraph:
    def make_drifted_loop(self, n=30, drift=0.03):
        """Ground-truth circle of poses; estimates accumulate drift; loop edge
        ties last frame back to first."""
        gt = []
        for i in range(n):
            ang = 2 * np.pi * i / n
            R = so3.exp(jnp.array([0.0, ang, 0.0]))
            t = jnp.array([np.sin(ang) * 0.0 - 2.0 * np.sin(ang), 0.0, 2.0 - 2.0 * np.cos(ang)])
            gt.append(sim3.from_se3(se3.from_Rt(R, -R @ t)))
        gt = jnp.stack(gt)
        # drifted estimate: compose relative gt motions with small errors
        est = [gt[0]]
        key = jax.random.PRNGKey(12)
        for i in range(1, n):
            rel = sim3.compose(gt[i], sim3.inverse(gt[i - 1]))
            noise = sim3.exp(
                jnp.concatenate([drift * jax.random.normal(jax.random.fold_in(key, i), (6,)), jnp.asarray([0.01])])
            )
            est.append(sim3.compose(noise, sim3.compose(rel, est[i - 1])))
        return gt, jnp.stack(est)

    def test_residual_zero_for_consistent(self):
        gt, est = self.make_drifted_loop()
        meas = sim3.compose(gt[:-1], sim3.inverse(gt[1:]))
        r = pose_graph._res_batch(gt[:-1], gt[1:], meas)
        np.testing.assert_allclose(np.asarray(r), 0.0, atol=1e-7)

    def test_loop_closure_reduces_error(self):
        gt, est = self.make_drifted_loop()
        n = gt.shape[0]
        # loop edge: true relative transform between last and first
        loop_meas = sim3.compose(gt[n - 1], sim3.inverse(gt[0]))[None]
        g = pose_graph.sequential_graph(
            est,
            jnp.ones(n, bool),
            extra_i=[n - 1],
            extra_j=[0],
            extra_meas=loop_meas,
            loop_weight=20.0,
        )
        res = pose_graph.optimize(g, n_iters=25)
        assert float(res.chi2_history[-1]) < 0.2 * float(res.chi2_initial)
        # end-point error vs gt should shrink dramatically
        def endpoint_err(v):
            rel = sim3.compose(v[n - 1], sim3.inverse(v[0]))
            rel_gt = sim3.compose(gt[n - 1], sim3.inverse(gt[0]))
            return float(jnp.linalg.norm(sim3.log(sim3.compose(rel, sim3.inverse(rel_gt)))))

        assert endpoint_err(res.vertices) < 0.3 * endpoint_err(est)

    def test_fixed_vertex_pinned(self):
        gt, est = self.make_drifted_loop(n=10)
        g = pose_graph.sequential_graph(est, jnp.ones(10, bool))
        res = pose_graph.optimize(g, n_iters=5)
        np.testing.assert_allclose(
            np.asarray(res.vertices[0]), np.asarray(est[0]), atol=1e-12
        )
