"""Long-trajectory slot recycling: the feature tier (descriptors/keypoints)
is a fixed pool of recycled slots while poses persist for every frame —
the capability the reference's unbounded `DataManager` vectors could never
express (`src/DataManager.h:25-35`; SURVEY.md §5.7)."""

import jax
import jax.numpy as jnp
import numpy as np

from monocular_slam_tpu.datasets import synthetic
from monocular_slam_tpu.eval import ate
from monocular_slam_tpu.slam import state as state_mod
from monocular_slam_tpu.slam.config import FrontendConfig, SlamConfig
from monocular_slam_tpu.slam.session import SlamSession


def small_cfg(max_frames=64, max_slots=None, n_feat=300):
    return SlamConfig(
        max_frames=max_frames,
        max_slots=max_slots,
        max_points=8000,
        frontend=FrontendConfig(n_features=n_feat),
    )


def make_seq(n_frames, n_feat=300, seed=0):
    return synthetic.feature_sequence(
        jax.random.PRNGKey(seed),
        n_frames=n_frames,
        n_world_points=1500,
        n_features=n_feat,
        pix_noise=0.3,
        drop_prob=0.05,
    )


class TestSlotRecycling:
    def test_eviction_keeps_poses_and_points(self):
        """Frames beyond the slot pool evict the oldest non-keyframes'
        FEATURES; their poses, validity and triangulated points survive."""
        n = 40
        cfg = small_cfg(max_frames=64, max_slots=16)
        seq = make_seq(n)
        sess = SlamSession(cfg, seed=1, run_ba=True)
        for i, f in enumerate(seq.frames):
            st = sess.add_frame_features(f, seq.k, seq.timestamps[i])
            assert st.tracked, f"lost tracking at {i}"

        state = sess.state
        slot_of = np.asarray(state.slot_of)
        frame_of = np.asarray(state.frame_of)
        # eviction actually happened: more frames than slots
        assert (slot_of[:n] >= 0).sum() <= 16
        assert (slot_of[:n] < 0).sum() >= n - 16
        # mapping consistency: resident frames' slots point back at them
        for f_id in range(n):
            s = slot_of[f_id]
            if s >= 0:
                assert frame_of[s] == f_id
        # every pose still valid and the trajectory is intact
        poses, valid, _ = sess.trajectory()
        assert valid.all()
        r = ate.ate(poses, np.asarray(seq.poses_gt))
        assert r.rmse < 2e-2, f"ATE {r.rmse}"
        # map survives eviction (points of evicted frames persist)
        assert sess.n_map_points > 200

    def test_recent_window_always_resident(self):
        """The tracker's match window must never be evicted."""
        n = 48
        cfg = small_cfg(max_frames=64, max_slots=20)
        seq = make_seq(n, seed=3)
        sess = SlamSession(cfg, seed=2, run_ba=True)
        for i, f in enumerate(seq.frames):
            sess.add_frame_features(f, seq.k, seq.timestamps[i])
            slot_of = np.asarray(sess.state.slot_of)
            lo = max(0, i - sess._protect_window + 1)
            assert (slot_of[lo : i + 1] >= 0).all(), f"window evicted at {i}"

    def test_identity_slots_when_unconfigured(self):
        """max_slots=None keeps the old one-slot-per-frame behavior."""
        cfg = small_cfg(max_frames=32, max_slots=None)
        seq = make_seq(12, seed=1)
        sess = SlamSession(cfg, seed=1, run_ba=True)
        for i, f in enumerate(seq.frames):
            sess.add_frame_features(f, seq.k, seq.timestamps[i])
        slot_of = np.asarray(sess.state.slot_of)[:12]
        np.testing.assert_array_equal(slot_of, np.arange(12))

    def test_capacity_error_when_window_unprotectable(self):
        """Fewer slots than the protected window raises, not corrupts."""
        cfg = small_cfg(max_frames=64, max_slots=4)
        seq = make_seq(24, seed=2)
        sess = SlamSession(cfg, seed=1, run_ba=True)
        try:
            for i, f in enumerate(seq.frames):
                sess.add_frame_features(f, seq.k, seq.timestamps[i])
        except ValueError as e:
            assert "slots" in str(e)
        else:
            raise AssertionError("expected slot-capacity ValueError")


def test_observation_edges_skip_evicted():
    """Edges derived from freed slots are masked; pt_idx never dangles."""
    cfg = small_cfg(max_frames=32, max_slots=8)
    seq = make_seq(20, seed=4)
    sess = SlamSession(cfg, seed=1, run_ba=True)
    for i, f in enumerate(seq.frames):
        sess.add_frame_features(f, seq.k, seq.timestamps[i])
    cam_idx, pt_idx, _, _, valid = state_mod.observation_edges(sess.state)
    v = np.asarray(valid)
    cams = np.asarray(cam_idx)[v]
    slot_of = np.asarray(sess.state.slot_of)
    # every valid edge belongs to a currently-resident frame
    assert (slot_of[cams] >= 0).all()
    pv = np.asarray(sess.state.point_valid)
    assert pv[np.asarray(pt_idx)[v]].all()


class TestRelocalization:
    def test_recovers_after_blackout(self):
        """Feed garbage frames (tracking must fail), then a real frame again:
        the session relocalizes against the BoW-nearest keyframe and
        resumes, writing pose AND associations (`tracker.relocalize`)."""
        from monocular_slam_tpu.retrieval import vocabulary as vocab_mod
        from monocular_slam_tpu.slam.loop_closer import LoopCloser

        n_feat = 300
        cfg = small_cfg(max_frames=64, n_feat=n_feat)
        seq = make_seq(30, n_feat=n_feat, seed=6)
        desc = np.concatenate(
            [np.asarray(f.desc_pm1)[np.asarray(f.valid)] for f in seq.frames[:8]]
        )
        from monocular_slam_tpu.retrieval import vocabulary
        voc = vocabulary.train(desc, k=8, L=3, seed=0)
        lc = LoopCloser(voc=voc, cfg=cfg)
        sess = SlamSession(cfg, seed=1, run_ba=True, loop_closer=lc)
        for i in range(20):
            st = sess.add_frame_features(seq.frames[i], seq.k, seq.timestamps[i])
            assert bool(st.tracked)

        # blackout: random descriptors, nothing matches
        garbage = seq.frames[0]._replace(
            desc_pm1=jnp.asarray(
                np.random.RandomState(9).choice(
                    np.array([-1, 1], np.int8), size=(n_feat, 256)
                )
            ),
        )
        n_fail = 0
        for j in range(4):
            st = sess.add_frame_features(garbage, seq.k, 100.0 + j)
            n_fail += not bool(st.tracked)
        assert n_fail >= 3, "garbage frames unexpectedly tracked"

        # a real view again: relocalization should fire within a few frames
        recovered = False
        for i in range(20, 26):
            st = sess.add_frame_features(seq.frames[i], seq.k, seq.timestamps[i])
            if bool(st.tracked):
                recovered = True
                break
        assert recovered, "relocalization never recovered tracking"
        # the relocalized frame carries map associations, not just a pose
        sl = int(sess.state.slot_of[st.frame])
        fp = np.asarray(sess.state.feat_point[sl])
        assert (fp >= 0).sum() >= sess.cfg.track.reloc_min_inliers
