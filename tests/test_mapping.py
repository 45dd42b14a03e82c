"""Mapping hygiene tests: culling, fuse, covisibility."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from monocular_slam_tpu.datasets import synthetic
from monocular_slam_tpu.slam import mapping
from monocular_slam_tpu.slam.config import FrontendConfig, SlamConfig
from monocular_slam_tpu.slam.session import SlamSession


@pytest.fixture(scope="module")
def tracked_session():
    seq = synthetic.feature_sequence(
        jax.random.PRNGKey(2), n_frames=12, n_world_points=500, n_features=250,
        pix_noise=0.3, drop_prob=0.05,
    )
    cfg = SlamConfig(max_frames=16, max_points=3000, frontend=FrontendConfig(n_features=250))
    sess = SlamSession(cfg, seed=4, run_ba=True)
    for i, f in enumerate(seq.frames):
        st = sess.add_frame_features(f, seq.k, seq.timestamps[i])
        assert st.tracked
    return sess, seq


class TestObservations:
    def test_counts_and_anchors(self, tracked_session):
        sess, _ = tracked_session
        counts = np.asarray(mapping.observation_counts(sess.state))
        anchors = np.asarray(mapping.point_anchors(sess.state))
        valid = np.asarray(sess.state.point_valid)
        assert (counts[valid] >= 1).all()
        # Anchors of valid points are real frames
        assert (anchors[valid] < sess._next).all()
        # invalid slots have zero observations
        assert (counts[~valid] == 0).all()

    def test_point_descriptors(self, tracked_session):
        sess, _ = tracked_session
        desc, has = mapping.point_descriptors(sess.state)
        valid = np.asarray(sess.state.point_valid)
        assert np.asarray(has)[valid].all()
        # rows with an observation are genuine +-1 descriptors (rows without
        # one gather from uningested zero-padded slots and are masked by has)
        assert set(np.unique(np.asarray(desc)[np.asarray(has)])) <= {-1, 1}


class TestCulling:
    def test_culls_weak_points(self, tracked_session):
        sess, _ = tracked_session
        st = sess.state
        # Fabricate a weak point: valid but with no observations.
        P = st.points.shape[0]
        # first FREE slot (n_points is the live count, not a cursor — slots
        # are recycled, so free slots can sit anywhere)
        weak_id = int(np.where(~np.asarray(st.point_valid))[0][0])
        st2 = st._replace(
            point_valid=st.point_valid.at[weak_id].set(True),
        )
        # give it a single old observation so it's "mature"
        fp = st2.feat_point.at[0, 0].set(weak_id)
        st2 = st2._replace(feat_point=fp)
        new_st, n = mapping.cull_points(st2, i=11, min_obs=2, grace=3)
        assert not bool(new_st.point_valid[weak_id])
        assert int(new_st.feat_point[0, 0]) == -1
        assert int(n) >= 1

    def test_strong_points_survive(self, tracked_session):
        sess, _ = tracked_session
        counts = np.asarray(mapping.observation_counts(sess.state))
        strong = np.asarray(sess.state.point_valid) & (counts >= 3)
        new_st, _ = mapping.cull_points(sess.state, i=11, min_obs=3, grace=3)
        assert np.asarray(new_st.point_valid)[strong].all()


class TestFuse:
    def test_associates_dropped_features(self, tracked_session):
        sess, _ = tracked_session
        st = sess.state
        i = 11
        # Artificially clear some associations on the last frame, then fuse
        # should re-adopt most of them.
        fp = st.feat_point[i]
        had = np.asarray(fp >= 0)
        st2 = st._replace(
            feat_point=st.feat_point.at[i].set(jnp.where(jnp.arange(fp.shape[0]) % 3 == 0, -1, fp))
        )
        cleared = had & (np.arange(len(had)) % 3 == 0)
        res = mapping.fuse(st2, i, radius_px=4.0, max_hamming=60)
        refp = np.asarray(res.state.feat_point[i])
        readopted = (refp[cleared] >= 0).mean() if cleared.any() else 1.0
        assert int(res.n_associated) > 0
        assert readopted > 0.6
        # adopted associations agree with the originals where both exist
        orig = np.asarray(fp)
        agree = refp[cleared] == orig[cleared]
        assert agree.mean() > 0.75

    def test_fuse_respects_radius(self, tracked_session):
        sess, _ = tracked_session
        res = mapping.fuse(sess.state, 11, radius_px=0.0)
        assert int(res.n_associated) == 0


class TestCovisibility:
    def test_matrix_properties(self, tracked_session):
        sess, _ = tracked_session
        C = np.asarray(mapping.covisibility(sess.state))
        n = sess._next
        assert (C == C.T).all()
        # consecutive frames share many points; distant pairs share fewer
        assert C[5, 6] > 20
        assert C[5, 5] >= C[5, 6]  # diagonal = own count

    def test_window_selector(self, tracked_session):
        sess, _ = tracked_session
        w = np.asarray(mapping.covisibility_window(sess.state, 11, min_shared=10))
        assert w[10] and w[9]  # neighbors covisible
        assert not w[15]  # never-ingested frame
