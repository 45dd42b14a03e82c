"""End-to-end SLAM tests on synthetic sequences: bootstrap -> PnP tracking ->
triangulation -> local BA -> ATE. This is the minimum end-to-end slice
(SURVEY.md 7, build step 6) with exact ground truth."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from monocular_slam_tpu.datasets import synthetic
from monocular_slam_tpu.eval import ate
from monocular_slam_tpu.slam.config import SlamConfig, FrontendConfig, TrackConfig, BAConfig
from monocular_slam_tpu.slam.session import SlamSession


@pytest.fixture(scope="module")
def seq():
    return synthetic.feature_sequence(
        jax.random.PRNGKey(0), n_frames=20, n_world_points=600, n_features=300,
        pix_noise=0.3, drop_prob=0.08,
    )


def small_cfg(**kw):
    return SlamConfig(
        max_frames=32,
        max_points=4000,
        frontend=FrontendConfig(n_features=300),
        **kw,
    )


class TestEndToEnd:
    def test_tracks_whole_sequence(self, seq):
        sess = SlamSession(small_cfg(), seed=1, run_ba=True)
        for i, f in enumerate(seq.frames):
            st = sess.add_frame_features(f, seq.k, seq.timestamps[i])
            assert st.tracked, f"lost tracking at frame {i} ({st.n_inliers} inliers)"
        poses, valid, _ = sess.trajectory()
        assert valid.all()
        res = ate.ate(poses, np.asarray(seq.poses_gt))
        # Monocular with windowed local BA: sub-mm on a ~4 m arc
        assert res.rmse < 5e-3, f"ATE {res.rmse}"
        assert sess.n_map_points > 200
        # association quality: few duplicate points after warm-up
        new_late = [s.n_new_points for s in sess.stats[5:]]
        assert np.mean(new_late) < 20

    def test_no_ba_drifts_but_tracks_most(self, seq):
        """Without BA, monocular drift grows and tracking eventually starves —
        document the behavior (the reference without its Optimiser stage has
        the same failure mode)."""
        sess = SlamSession(small_cfg(), seed=1, run_ba=False)
        for i, f in enumerate(seq.frames):
            sess.add_frame_features(f, seq.k, seq.timestamps[i])
        poses, valid, _ = sess.trajectory()
        assert valid[:15].all()
        res = ate.ate(poses[valid], np.asarray(seq.poses_gt)[valid])
        assert res.rmse < 0.25

    def test_with_local_ba_improves(self, seq):
        sess_no = SlamSession(small_cfg(), seed=1, run_ba=False)
        sess_ba = SlamSession(small_cfg(), seed=1, run_ba=True)
        for i, f in enumerate(seq.frames):
            sess_no.add_frame_features(f, seq.k, seq.timestamps[i])
            st = sess_ba.add_frame_features(f, seq.k, seq.timestamps[i])
            assert st.tracked
        p_no, v_no, _ = sess_no.trajectory()
        p_ba, v_ba, _ = sess_ba.trajectory()
        gt = np.asarray(seq.poses_gt)
        r_no = ate.ate(p_no, gt, v_no)
        r_ba = ate.ate(p_ba, gt, v_ba)
        assert r_ba.rmse < r_no.rmse  # BA strictly improves on this sequence
        assert r_ba.rmse < 5e-3

    def test_map_consistency(self, seq):
        """feat_point associations must index valid points and reproject."""
        sess = SlamSession(small_cfg(), seed=1, run_ba=True)
        for i, f in enumerate(seq.frames):
            sess.add_frame_features(f, seq.k, seq.timestamps[i])
        st = sess.state
        fp = np.asarray(st.feat_point[: sess._next])
        pv = np.asarray(st.point_valid)
        used = fp[fp >= 0]
        assert used.max() < sess.cfg.max_points
        assert pv[used].all(), "feature points at invalid map slots"

    def test_deterministic(self, seq):
        a = SlamSession(small_cfg(), seed=7)
        b = SlamSession(small_cfg(), seed=7)
        for i, f in enumerate(seq.frames[:8]):
            a.add_frame_features(f, seq.k, seq.timestamps[i])
            b.add_frame_features(f, seq.k, seq.timestamps[i])
        np.testing.assert_array_equal(
            np.asarray(a.state.poses), np.asarray(b.state.poses)
        )

    def test_image_pipeline_smoke(self):
        """Full path through the real feature extractor on rendered images."""
        imgs, poses_gt, k = synthetic.textured_sequence(
            jax.random.PRNGKey(3), n_frames=6
        )
        cfg = SlamConfig(
            max_frames=8,
            max_points=2000,
            frontend=FrontendConfig(n_features=300, n_levels=2, fast_threshold=10.0),
        )
        sess = SlamSession(cfg, seed=2, run_ba=False)
        n_tracked = 0
        for i, im in enumerate(imgs):
            st = sess.add_frame(im, k, float(i))
            n_tracked += int(st.tracked)
        # Planar scene + small baseline: just require the pipeline to hold
        # tracking for most frames without crashing.
        assert n_tracked >= 4


class TestEvaluation:
    def test_umeyama_exact(self):
        rng = np.random.RandomState(0)
        src = rng.randn(50, 3)
        R, _ = np.linalg.qr(rng.randn(3, 3))
        if np.linalg.det(R) < 0:
            R[:, 2] *= -1
        s, t = 2.5, np.array([1.0, -2.0, 0.5])
        dst = s * src @ R.T + t
        s_e, R_e, t_e = ate.umeyama_sim3(src, dst)
        assert abs(s_e - s) < 1e-9
        np.testing.assert_allclose(R_e, R, atol=1e-9)
        np.testing.assert_allclose(t_e, t, atol=1e-9)

    def test_ate_zero_for_identical(self):
        from monocular_slam_tpu.datasets.synthetic import arc_trajectory

        poses = np.asarray(arc_trajectory(10))
        r = ate.ate(poses, poses)
        assert r.rmse < 1e-12


class TestAutoSteering:
    """Hysteresis logic of the adaptive BRIEF-steering mode (the default):
    binned while healthy, continuous on collapse, dwell against flapping."""

    def _mk(self):
        from monocular_slam_tpu.slam.config import FrontendConfig, SlamConfig
        from monocular_slam_tpu.slam.session import FrameStats, SlamSession

        cfg = SlamConfig(
            max_frames=16, max_points=500,
            frontend=FrontendConfig(n_features=100, steer_mode="auto"),
        )
        return SlamSession(cfg, seed=0, run_ba=False), FrameStats

    def _st(self, FrameStats, frame, tracked, n):
        st = FrameStats(frame=frame)
        st.tracked = tracked
        st.n_inliers = n
        return st

    def test_healthy_stays_binned(self):
        sess, FS = self._mk()
        for i in range(30):
            sess._update_steer_health(self._st(FS, i, True, 40))
        assert sess._steer == "binned"

    def test_failure_switches_immediately(self):
        sess, FS = self._mk()
        for i in range(5):
            sess._update_steer_health(self._st(FS, i, True, 40))
        sess._update_steer_health(self._st(FS, 5, False, 0))
        assert sess._steer == "continuous"

    def test_sharp_drop_switches(self):
        sess, FS = self._mk()
        for i in range(20):
            sess._update_steer_health(self._st(FS, i, True, 40))
        # cliff: 40 -> 10 inliers while still tracked
        sess._update_steer_health(self._st(FS, 20, True, 10))
        assert sess._steer == "continuous"

    def test_recovery_needs_dwell(self):
        sess, FS = self._mk()
        sess._update_steer_health(self._st(FS, 0, False, 0))
        assert sess._steer == "continuous"
        # healthy again, but the 50-frame dwell must pass before binned
        for i in range(1, 40):
            sess._update_steer_health(self._st(FS, i, True, 40))
        assert sess._steer == "continuous"
        for i in range(40, 80):
            sess._update_steer_health(self._st(FS, i, True, 40))
        assert sess._steer == "binned"

    def test_both_programs_exist_in_auto(self):
        sess, _ = self._mk()
        assert set(sess._programs) == {"binned", "continuous"}
