"""Keyframe selection / frame culling / profiling tests."""

import jax
import numpy as np
import pytest

from monocular_slam_tpu.datasets import synthetic
from monocular_slam_tpu.slam import keyframes
from monocular_slam_tpu.slam.config import FrontendConfig, SlamConfig
from monocular_slam_tpu.slam.session import SlamSession
from monocular_slam_tpu.utils import profiling


@pytest.fixture(scope="module")
def sess():
    seq = synthetic.feature_sequence(
        jax.random.PRNGKey(5), n_frames=16, n_world_points=600, n_features=250,
        pix_noise=0.3, drop_prob=0.05, ang_step=0.08,
    )
    cfg = SlamConfig(max_frames=24, max_points=4000, frontend=FrontendConfig(n_features=250))
    s = SlamSession(cfg, seed=6, run_ba=True)
    for i, f in enumerate(seq.frames):
        assert s.add_frame_features(f, seq.k, seq.timestamps[i]).tracked
    return s


class TestKeyframes:
    def test_selection_properties(self, sess):
        flags = keyframes.select_keyframes(sess.state, sess._next, overlap_thresh=0.8, max_gap=6)
        assert flags[0]  # first valid frame is always a keyframe
        ids = np.where(flags)[0]
        assert len(ids) >= 2
        assert np.diff(ids).max() <= 6  # max_gap respected
        # not every frame is a keyframe under a moderate threshold
        assert flags[: sess._next].sum() < sess._next

    def test_overlap_monotone_gap(self, sess):
        o1 = float(keyframes.tracked_overlap(sess.state, 10, 9))
        o5 = float(keyframes.tracked_overlap(sess.state, 10, 3))
        assert o1 > o5  # nearer frames overlap more

    def test_cull_redundant(self, sess):
        flags = np.zeros(sess.state.poses.shape[0], bool)
        flags[: sess._next] = True  # everything a keyframe -> lots redundant
        culled = keyframes.cull_frames(sess.state, flags)
        assert culled[0]
        assert culled.sum() < flags.sum()


class TestProfiling:
    def test_ba_stats_and_log(self, sess):
        from monocular_slam_tpu.optim import ba
        from tests.test_ba import K, build_problem, make_scene

        poses, X, uv = make_scene(jax.random.PRNGKey(40), n_frames=3, n_points=40)
        prob = build_problem(poses, X, uv, 0.01, 0.02, jax.random.PRNGKey(41))
        res = ba.bundle_adjust(prob, n_iters=5)
        stats = profiling.ba_stats(res)
        assert len(stats) == 5
        log = profiling.format_ba_log(res, "test")
        assert "chi2_initial" in log and "iter   4" in log

    def test_stage_timer(self):
        import time

        t = profiling.StageTimer(sync=False)
        with t.stage("a"):
            time.sleep(0.01)
        with t.stage("a"):
            time.sleep(0.01)
        assert t.counts["a"] == 2
        assert 5 < t.ms_per_call("a") < 100
        assert "a" in t.report()


class TestLongSequenceBounded:
    """FrameCulling + map-point recycling bound map and essential-graph size
    on a long sequence, with tracking quality intact (the
    `LocalMapper::FrameCulling` capability, `src/LocalMapper.h:40`)."""

    def test_bounded_growth(self):
        from monocular_slam_tpu.eval import ate as ate_mod

        from monocular_slam_tpu.slam.config import MappingConfig

        n = 80
        # a LINGERING camera (tiny angular step) + forced keyframe cadence:
        # successive keyframes re-observe the same points, which is the
        # redundancy regime FrameCulling exists for
        seq = synthetic.feature_sequence(
            jax.random.PRNGKey(9), n_frames=n, n_world_points=500,
            n_features=128, pix_noise=0.3, drop_prob=0.05, ang_step=0.015,
        )
        cfg = SlamConfig(
            max_frames=96, max_points=1500,
            frontend=FrontendConfig(n_features=128),
            mapping=MappingConfig(keyframe_max_gap=4),
        )
        s = SlamSession(cfg, seed=2, run_ba=True)
        tracked = 0
        for i, f in enumerate(seq.frames):
            st = s.add_frame_features(f, seq.k, seq.timestamps[i])
            tracked += int(bool(st.tracked))
            if i and i % 10 == 0:
                s.cull_redundant_keyframes()
        assert tracked >= n - 5
        # map stays within capacity because culled slots are RECYCLED —
        # the monotone-cursor design would refuse allocations long before
        # frame 80 at ~100 fresh triangulations/frame against cap 1500
        assert s.n_map_points <= cfg.max_points
        live = int(np.asarray(s.state.point_valid).sum())
        assert live == s.n_map_points
        # keyframe (essential-graph) size is bounded by scene coverage, not
        # trajectory length: FrameCulling must have retired redundant ones
        flagged = sum(1 for t in s.stats if bool(t.is_keyframe))
        assert len(s._kf_culled) > 0, "FrameCulling never fired"
        assert len(s.keyframes) < flagged
        # quality intact
        poses, valid, _ = s.trajectory()
        gt = np.asarray(seq.poses_gt)[: len(valid)]
        r = ate_mod.ate(poses[valid], gt[valid])
        assert r.rmse < 0.02, f"ATE {r.rmse:.4f} m"
