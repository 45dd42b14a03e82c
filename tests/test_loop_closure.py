"""Loop-closure tests: detection on a revisiting trajectory, Sim3 recovery,
and full closure correcting accumulated drift."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from monocular_slam_tpu.datasets import synthetic
from monocular_slam_tpu.eval import ate
from monocular_slam_tpu.retrieval import vocabulary as vocab
from monocular_slam_tpu.slam.config import FrontendConfig, SlamConfig
from monocular_slam_tpu.slam.loop_closer import LoopCloser, LoopClosureConfig
from monocular_slam_tpu.slam.session import SlamSession


N_FRAMES = 46  # 0.14 rad/frame -> full circle at ~45 frames


@pytest.fixture(scope="module")
def loop_seq():
    return synthetic.feature_sequence(
        jax.random.PRNGKey(1),
        n_frames=N_FRAMES,
        n_world_points=900,
        n_features=256,
        pix_noise=0.4,
        drop_prob=0.08,
        ang_step=0.14,
    )


@pytest.fixture(scope="module")
def voc(loop_seq):
    # train on the sequence's own descriptors (offline-vocabulary workflow)
    desc = np.concatenate(
        [np.asarray(f.desc_pm1)[np.asarray(f.valid)] for f in loop_seq.frames[:10]]
    )
    return vocab.train(desc, k=8, L=3, seed=0)


def make_session(loop_seq, voc, with_lc=True, **lc_kw):
    cfg = SlamConfig(
        max_frames=64, max_points=6000, frontend=FrontendConfig(n_features=256)
    )
    lc = None
    if with_lc:
        lc = LoopCloser(
            voc=voc,
            cfg=cfg,
            lc=LoopClosureConfig(
                min_gap=20, min_score=0.05, consistency=2, run_global_ba=True,
                **lc_kw,
            ),
        )
    return SlamSession(cfg, seed=3, run_ba=True, loop_closer=lc), lc


class TestLoopClosure:
    def test_detects_revisit(self, loop_seq, voc):
        sess, lc = make_session(loop_seq, voc)
        for i, f in enumerate(loop_seq.frames):
            st = sess.add_frame_features(f, loop_seq.k, loop_seq.timestamps[i])
        # The trajectory revisits its start near frame ~45; detection+closure
        # must have fired at least once in the final quarter.
        assert len(lc.closures) >= 1, "no loop closure fired"
        i, j = lc.closures[0]
        assert i - j >= 20  # closed against a genuinely old frame
        assert j <= 8  # one of the first keyframes (the DB is keyframe-only)

    def test_closure_improves_ate(self, loop_seq, voc):
        sess_lc, lc = make_session(loop_seq, voc)
        sess_no, _ = make_session(loop_seq, voc, with_lc=False)
        for i, f in enumerate(loop_seq.frames):
            sess_lc.add_frame_features(f, loop_seq.k, loop_seq.timestamps[i])
            sess_no.add_frame_features(f, loop_seq.k, loop_seq.timestamps[i])
        gt = np.asarray(loop_seq.poses_gt)
        p1, v1, _ = sess_lc.trajectory()
        p0, v0, _ = sess_no.trajectory()
        both = v1 & v0
        r_lc = ate.ate(p1[both], gt[both])
        r_no = ate.ate(p0[both], gt[both])
        assert len(lc.closures) >= 1
        # closure must not materially hurt. The r3 tracker barely drifts on
        # this sequence (~1.5 mm ATE without closure), so below a few mm the
        # relative comparison is numerical noise — hence the absolute floor.
        assert r_lc.rmse <= max(r_no.rmse * 1.2, 0.003)
        assert r_lc.rmse < 0.05

    def test_no_detection_on_disjoint_content(self, voc):
        """Frames with mutually disjoint random descriptors must never trigger
        detection. (The orbiting synthetic world genuinely re-observes the
        same landmarks at every gap, so silence can only be tested with
        disjoint places.)"""
        from monocular_slam_tpu.slam import state as state_mod

        cfg = SlamConfig(
            max_frames=64, max_points=1000, frontend=FrontendConfig(n_features=256)
        )
        lc = LoopCloser(
            voc=voc, cfg=cfg,
            lc=LoopClosureConfig(min_gap=10, min_score=0.05, consistency=2),
        )
        st = state_mod.empty_state(cfg)
        key = jax.random.PRNGKey(99)
        for i in range(30):
            bits = jax.random.bernoulli(jax.random.fold_in(key, i), 0.5, (256, 256))
            pm1 = (bits.astype(jnp.int8) << 1) - jnp.int8(1)
            st = st._replace(
                desc_pm1=st.desc_pm1.at[i].set(pm1),
                kp_valid=st.kp_valid.at[i].set(jnp.ones(256, bool)),
            )
            lc.add_frame(st, i)
            assert lc.detect(i) is None, f"false positive at frame {i}"
