"""SlamSession — host-side driver orchestrating the jitted SLAM stages.

The TPU analog of the reference's `main` loop + `ProcessingPipeline`
(`src/main.cpp:40-51`, `src/Pipeline.h:49-65`): stages run in order per
frame, each a pure jitted function over the on-device SlamState. Frame-count
branching (frame 0 / frame 1 / frame >= 2, `CameraPoseEstimator.cpp:517-527`)
lives here on the host; everything below is compiled once.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from monocular_slam_tpu.ops import features as features_mod
from monocular_slam_tpu.ops import orb
from monocular_slam_tpu.slam import local_ba, mapping, state as state_mod, tracker
from monocular_slam_tpu.slam.config import SlamConfig
from monocular_slam_tpu.slam.state import SlamState


@dataclass
class FrameStats:
    frame: int
    tracked: bool
    n_inliers: int
    n_new_points: int
    chi2_before: float = float("nan")
    chi2_after: float = float("nan")
    loop_closed: bool = False
    is_keyframe: bool = False
    n_fused: int = 0
    n_culled: int = 0


class SlamSession:
    """Feed frames (images or precomputed features), get trajectory + map.

    Usage:
        sess = SlamSession(cfg)
        for img, ts in frames:
            sess.add_frame(img, k=K, timestamp=ts)
        poses, valid = sess.trajectory()
    """

    def __init__(
        self,
        cfg: SlamConfig = SlamConfig(),
        seed: int = 0,
        run_ba: bool = True,
        loop_closer=None,
    ):
        self.cfg = cfg
        self.run_ba = run_ba
        self.loop_closer = loop_closer  # optional slam.loop_closer.LoopCloser
        self.state: SlamState = state_mod.empty_state(cfg)
        self.key = jax.random.PRNGKey(seed)
        self.stats: list[FrameStats] = []
        self._next = 0

        # jit the stages once (cfg is static through closure)
        self._extract = jax.jit(
            partial(
                features_mod.extract,
                n_features=cfg.frontend.n_features,
                n_levels=cfg.frontend.n_levels,
                fast_threshold=cfg.frontend.fast_threshold,
            )
        )
        self._bootstrap = jax.jit(lambda st, key: tracker.bootstrap(st, key, cfg))
        self._track = jax.jit(lambda st, i, key: tracker.track(st, i, key, cfg))
        self._local_ba = jax.jit(lambda st, i: local_ba.local_bundle_adjust(st, i, cfg))
        self._add_feats = jax.jit(state_mod.add_frame_features)

        # local-mapping hygiene (the LocalMapper stage, `src/LocalMapper.h:30-42`)
        m = cfg.mapping
        self._fuse = jax.jit(
            lambda st, i: mapping.fuse(
                st, i, radius_px=m.fuse_radius_px,
                max_hamming=m.fuse_max_hamming, image_wh=cfg.image_wh,
            )
        )
        self._cull = jax.jit(
            lambda st, i: mapping.cull_points(
                st, i, min_obs=m.cull_min_obs, grace=m.cull_grace
            )
        )
        self._overlap = jax.jit(mapping.frame_overlap)
        self.keyframes: list[int] = []  # Mapper.insertKeyFrame analog

    def _split(self):
        self.key, sub = jax.random.split(self.key)
        return sub

    def add_frame_features(
        self, feats: orb.Features, k, timestamp: float, dist=None
    ) -> FrameStats:
        """Ingest a frame from precomputed features (the fixture path — the
        reference's CSV snapshot trick, SURVEY.md 5.4). `dist` (radtan
        5-vector) undistorts keypoints before they enter the state — the
        correction the reference only half-applied (SURVEY.md 2.4)."""
        if dist is not None:
            import numpy as _np

            if _np.any(_np.asarray(dist) != 0):
                from monocular_slam_tpu.geometry import camera as _cam

                feats = feats._replace(
                    uv=_cam.undistort_pixels(
                        jnp.asarray(k), jnp.asarray(dist), feats.uv
                    )
                )
        i = self._next
        if i >= self.cfg.max_frames:
            raise ValueError(f"frame capacity {self.cfg.max_frames} exhausted")
        self._next += 1
        self.state = self._add_feats(
            self.state,
            i,
            feats.uv,
            feats.scale,
            feats.valid,
            feats.desc,
            feats.desc_pm1,
            jnp.asarray(k),
            timestamp,
        )
        st = FrameStats(frame=i, tracked=False, n_inliers=0, n_new_points=0)
        if i == 0:
            self.state = self.state._replace(
                pose_valid=self.state.pose_valid.at[0].set(True)
            )
            st.tracked = True
        elif i == 1:
            res = self._bootstrap(self.state, self._split())
            self.state = res.state
            st.tracked = bool(res.ok)
            st.n_inliers = int(res.n_inliers)
            st.n_new_points = int(res.n_points)
        else:
            res = self._track(self.state, i, self._split())
            self.state = res.state
            st.tracked = bool(res.ok)
            st.n_inliers = int(res.n_pnp_inliers)
            st.n_new_points = int(res.n_new_points)
            if self.run_ba and st.tracked:
                bares = self._local_ba(self.state, i)
                self.state = bares.state
                st.chi2_before = float(bares.chi2_initial)
                st.chi2_after = float(bares.chi2_final)
        # --- local-mapping hygiene (LocalMapper's declared duties) ----------
        m = self.cfg.mapping
        if m.enabled and st.tracked and i >= 2:
            if m.fuse_every and i % m.fuse_every == 0:
                fres = self._fuse(self.state, i)
                self.state = fres.state
                st.n_fused = int(fres.n_associated)
            if m.cull_every and i % m.cull_every == 0:
                self.state, n_culled = self._cull(self.state, i)
                st.n_culled = int(n_culled)
        # --- keyframe flag (Mapper.insertKeyFrame rule) ----------------------
        if st.tracked:
            if not self.keyframes:
                st.is_keyframe = True
            else:
                last = self.keyframes[-1]
                ov = float(self._overlap(self.state, i, last))
                st.is_keyframe = (
                    ov < m.keyframe_overlap or (i - last) >= m.keyframe_max_gap
                )
            if st.is_keyframe:
                self.keyframes.append(i)
        if self.loop_closer is not None and st.tracked and i >= 2:
            self.state, closed = self.loop_closer.run(self.state, i, self._split())
            st.loop_closed = closed
        self.stats.append(st)
        return st

    def add_frame(self, img, k, timestamp: float = 0.0, dist=None) -> FrameStats:
        """Ingest a grayscale image (H, W) [0, 255]."""
        feats = self._extract(jnp.asarray(img, dtype=jnp.float32))
        return self.add_frame_features(feats, k, timestamp, dist=dist)

    # --- outputs -----------------------------------------------------------
    def trajectory(self):
        """(poses (F, 3, 4), valid (F,), timestamps (F,)) as numpy, trimmed
        to ingested frames."""
        n = self._next
        return (
            np.asarray(self.state.poses[:n]),
            np.asarray(self.state.pose_valid[:n]),
            np.asarray(self.state.timestamps[:n]),
        )

    def map_points(self):
        """(P_used, 3) numpy array of valid map points."""
        pts = np.asarray(self.state.points)
        ok = np.asarray(self.state.point_valid)
        return pts[ok]

    @property
    def n_map_points(self) -> int:
        return int(self.state.n_points)
