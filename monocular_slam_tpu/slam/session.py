"""SlamSession — host-side driver orchestrating the jitted SLAM stages.

The TPU analog of the reference's `main` loop + `ProcessingPipeline`
(`src/main.cpp:40-51`, `src/Pipeline.h:49-65`). Frame-count branching
(frame 0 / bootstrap / tracked, `CameraPoseEstimator.cpp:517-527`) lives on
the host; once initialized, each frame is ONE compiled program
(`_session_step`: track -> local BA -> fuse -> cull -> keyframe rule) with
zero host round-trips — stage results come back as device scalars that are
only synced if someone reads them. The reference runs its stages as separate
virtual calls over shared memory (`Pipeline.h:57-64`); separate *dispatches*
here would each cost a host->device hop and a sync per `int()` (measured
3.2 fps vs the fused step's 50+, BENCH_r02).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import NamedTuple

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
    """Per-frame outcomes. After the fused step these hold DEVICE scalars;
    reading one (bool()/int()/float()) syncs, so don't in a hot loop."""

    frame: int
    tracked: object
    n_inliers: object
    n_new_points: object
    chi2_before: object = float("nan")
    chi2_after: object = float("nan")
    loop_closed: bool = False
    is_keyframe: object = False
    n_fused: object = 0
    n_culled: object = 0


class StepStats(NamedTuple):
    tracked: jnp.ndarray
    n_inliers: jnp.ndarray
    n_new_points: jnp.ndarray
    chi2_before: jnp.ndarray
    chi2_after: jnp.ndarray
    n_fused: jnp.ndarray
    n_culled: jnp.ndarray
    is_keyframe: jnp.ndarray
    last_kf: jnp.ndarray


def _session_step(
    state: SlamState, i, last_kf, key, cfg: SlamConfig, run_ba: bool
) -> tuple[SlamState, StepStats]:
    """One fused per-frame step for an initialized session: PnP track, the
    keyframe rule, then (conditionally, on-device) the mapping block —
    fuse -> windowed local BA -> cull. `lax.cond` skips the untaken work at
    runtime while keeping this a single compiled program.

    With `cfg.ba.keyframe_only` (default) the mapping block runs only when
    the frame is promoted to a keyframe — ORB-SLAM's LocalMapping cadence
    (tracking stays per-frame via the motion-only refinement inside
    `tracker.track`). Otherwise it follows the reference-shaped per-frame
    cadence (`src/Optimiser.cpp:6-18`) with fuse/cull on their own clocks."""
    tres = tracker.track(state, i, key, cfg)
    state = tres.state
    nan = jnp.asarray(jnp.nan, state.poses.dtype)
    m = cfg.mapping
    zero = jnp.asarray(0, jnp.int32)

    # keyframe rule (Mapper.insertKeyFrame, ORBSLAM.png): first tracked frame,
    # overlap with the last keyframe dropped, or max gap exceeded
    ov = mapping.frame_overlap(state, i, jnp.maximum(last_kf, 0))
    is_kf = tres.ok & (
        (last_kf < 0)
        | (ov < m.keyframe_overlap)
        | (i - last_kf >= m.keyframe_max_gap)
    )
    last_kf = jnp.where(is_kf, jnp.asarray(i, jnp.int32), last_kf)

    def _fuse(st):
        r = mapping.fuse(
            st, i, radius_px=m.fuse_radius_px,
            max_hamming=m.fuse_max_hamming, image_wh=cfg.image_wh,
        )
        return r.state, r.n_associated.astype(jnp.int32)

    def _cull(st):
        r = mapping.cull_points(
            st, i, min_obs=m.cull_min_obs, grace=m.cull_grace
        )
        return r[0], r[1].astype(jnp.int32)

    def _ba(st):
        r = local_ba.local_bundle_adjust(st, i, cfg)
        return r.state, r.chi2_initial, r.chi2_final

    if cfg.ba.keyframe_only:
        # keyframe-rate mapping block. Fuse/cull run ONLY on keyframe blocks
        # (ORB-SLAM's LocalMapping fuses and culls per inserted keyframe;
        # fusing on every block measured 0.37 -> 1.7 cm ATE on the rendered
        # benchmark — the 4 px merge radius wrongly unifies points when
        # applied at frame rate). Cadence-floor/warmup blocks solve alone.
        def _map_block(st):
            n_f = n_c = zero
            if m.enabled:
                st, n_f = jax.lax.cond(is_kf, _fuse, lambda s: (s, zero), st)
            if run_ba:
                st, c0, c1 = _ba(st)
            else:
                c0 = c1 = nan
            if m.enabled:
                st, n_c = jax.lax.cond(is_kf, _cull, lambda s: (s, zero), st)
            return st, c0, c1, n_f, n_c

        run_map = is_kf
        if cfg.ba.cadence_floor:
            run_map = run_map | (tres.ok & (i % cfg.ba.cadence_floor == 0))
        if cfg.ba.warmup_frames:
            run_map = run_map | (tres.ok & (i < cfg.ba.warmup_frames))
        state, chi2_0, chi2_1, n_fused, n_culled = jax.lax.cond(
            run_map,
            _map_block,
            lambda st: (st, nan, nan, zero, zero),
            state,
        )
    else:
        if run_ba:
            state, chi2_0, chi2_1 = jax.lax.cond(
                tres.ok, _ba, lambda st: (st, nan, nan), state
            )
        else:
            chi2_0 = chi2_1 = nan
        n_fused = n_culled = zero
        if m.enabled and m.fuse_every:
            state, n_fused = jax.lax.cond(
                tres.ok & (i % m.fuse_every == 0),
                _fuse, lambda st: (st, zero), state,
            )
        if m.enabled and m.cull_every:
            state, n_culled = jax.lax.cond(
                tres.ok & (i % m.cull_every == 0),
                _cull, lambda st: (st, zero), state,
            )

    return state, StepStats(
        tracked=tres.ok,
        n_inliers=tres.n_pnp_inliers,
        n_new_points=tres.n_new_points,
        chi2_before=chi2_0,
        chi2_after=chi2_1,
        n_fused=n_fused,
        n_culled=n_culled,
        is_keyframe=is_kf,
        last_kf=last_kf,
    )


def _image_session_step(
    state: SlamState, img, i, slot, last_kf, key, k, dist, cfg: SlamConfig,
    run_ba: bool,
) -> tuple[SlamState, StepStats]:
    """ONE program for a tracked image frame: ORB extraction -> keypoint
    undistortion -> state ingest -> `_session_step`. Fusing extraction into
    the step saves two dispatch round trips per frame over the tunneled
    device and lets XLA schedule the (now ~0.05 ms) extractor into the step's
    pipeline bubbles."""
    from monocular_slam_tpu.geometry import camera as cam

    feats = features_mod.extract(
        img.astype(jnp.float32),
        n_features=cfg.frontend.n_features,
        n_levels=cfg.frontend.n_levels,
        fast_threshold=cfg.frontend.fast_threshold,
        steer_mode=cfg.frontend.steer_mode,
    )
    # radtan undistortion is exactly identity at zero coefficients, so the
    # no-distortion datasets ride the same program
    uv = cam.undistort_pixels(k, dist, feats.uv)
    state = state_mod.add_frame_features(
        state, i, slot, uv, feats.scale, feats.valid, feats.desc,
        feats.desc_pm1, k,
    )
    return _session_step(state, i, last_kf, key, cfg, run_ba)


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
        self.timestamps: list[float] = []  # host-side (f32 can't hold epochs)
        self._next = 0

        # jit the stages once (cfg is static through closure)
        self._extract = jax.jit(
            partial(
                features_mod.extract,
                n_features=cfg.frontend.n_features,
                n_levels=cfg.frontend.n_levels,
                fast_threshold=cfg.frontend.fast_threshold,
                steer_mode=cfg.frontend.steer_mode,
            )
        )
        self._bootstrap = jax.jit(
            lambda st, f0, f1, key: tracker.bootstrap(st, key, cfg, f0, f1)
        )
        self._initialized = False
        self._init_ref = 0  # bootstrap reference frame (slides on failure)
        # NOTE deliberately no donate_argnums here: donating the state
        # pytree through these programs measured ZERO steady-state gain
        # (27-28 ms step either way) but blew the bootstrap program's XLA
        # compile up 20x (9.6 s -> 214 s on v5e — the donation aliasing
        # analysis interacts pathologically with the big tree_map(where)
        # failure-restore outputs), dominating cold-session warmup
        self._step = jax.jit(
            lambda st, i, last_kf, key: _session_step(
                st, i, last_kf, key, cfg, run_ba
            )
        )
        self._img_step = jax.jit(
            lambda st, img, i, slot, last_kf, key, k, dist: _image_session_step(
                st, img, i, slot, last_kf, key, k, dist, cfg, run_ba
            )
        )
        self._img_step_buf = jax.jit(
            lambda st, buf, j, i, slot, last_kf, key, k, dist: _image_session_step(
                st, buf[j], i, slot, last_kf, key, k, dist, cfg, run_ba
            )
        )
        self._add_feats = jax.jit(state_mod.add_frame_features)
        self._reloc = jax.jit(
            lambda st, i, cand, key: tracker.relocalize(st, i, cand, key, cfg)
        )
        self._fail_streak = 0
        self._dev_consts: dict = {}  # host bytes -> device array (k, dist)
        self._last_kf = jnp.asarray(-1, jnp.int32)  # device keyframe anchor
        self._kf_culled: set[int] = set()  # FrameCulling victims
        self._keyframes: list[int] = []  # incrementally folded from stats
        self._kf_scanned = 0  # stats entries already folded (each flag syncs once)
        # feature-tier slot allocator (host mirror of state.frame_of):
        # slots are handed out in order, then recycled keyframe-aware
        S = state_mod.n_slots(cfg)
        self._slot_frame: list[int] = [-1] * S  # slot -> frame id
        self._free_slots: list[int] = list(range(S - 1, -1, -1))
        # frames younger than this many steps are never evicted: the
        # tracker's back-traverse match window must stay resident (the BA
        # window needs no protection — its covisibility ranking already
        # restricts itself to slot-resident frames)
        self._protect_window = cfg.track.back_traverse + 2

    def _split(self):
        self.key, sub = jax.random.split(self.key)
        return sub

    def prewarm(self, image: bool = False, n_threads: int = 4) -> float:
        """Compile the session's per-frame programs ahead of the first frame,
        in PARALLEL threads (XLA releases the GIL while the backend — here a
        remote compile service — works, and the programs are independent, so
        wall time is the max, not the sum). Results land in the persistent
        compilation cache. Returns seconds spent."""
        import time
        from concurrent.futures import ThreadPoolExecutor

        t0 = time.perf_counter()
        cfg = self.cfg
        st = self.state
        key = jax.random.PRNGKey(0)
        N = cfg.frontend.n_features
        dtype = st.kp_uv.dtype

        def c_extract():
            if image:
                img = jnp.zeros((cfg.image_wh[1], cfg.image_wh[0]), jnp.float32)
                self._extract.lower(img).compile()

        def c_img_step():
            if image:
                img = jnp.zeros((cfg.image_wh[1], cfg.image_wh[0]), jnp.float32)
                self._img_step.lower(
                    st, img, 2, 2, jnp.asarray(0, jnp.int32), key,
                    jnp.zeros(4, dtype), jnp.zeros(5, dtype),
                ).compile()

        def c_add():
            self._add_feats.lower(
                st, 0, 0, jnp.zeros((N, 2), dtype), jnp.ones(N, dtype),
                jnp.zeros(N, bool), jnp.zeros((N, 8), jnp.uint32),
                jnp.zeros((N, 256), jnp.int8), jnp.zeros(4, dtype),
            ).compile()

        def c_boot():
            self._bootstrap.lower(st, 0, 1, key).compile()

        def c_step():
            self._step.lower(st, 2, jnp.asarray(0, jnp.int32), key).compile()

        with ThreadPoolExecutor(n_threads) as ex:
            futs = [
                ex.submit(f)
                for f in (c_extract, c_img_step, c_add, c_boot, c_step)
            ]
            for f in futs:
                f.result()
        return time.perf_counter() - t0

    def _acquire_slot(self, i: int) -> int:
        """Free slot for frame i, evicting keyframe-aware when exhausted:
        the oldest non-keyframe's features go first (they were only needed
        for the tracker's recent-frame window), then the oldest keyframe
        outside the protected window. Evicted frames keep their pose,
        validity, and triangulated map points — only descriptors/keypoints
        and their observation back-pointers are dropped, so feature memory
        scales with scene coverage (keyframes surviving FrameCulling) rather
        than trajectory length (SURVEY.md §5.7; the reference's DataManager
        keeps everything forever, `src/DataManager.h:25-35`)."""
        if self._free_slots:
            slot = self._free_slots.pop()
            self._slot_frame[slot] = i
            return slot
        protect_after = i - self._protect_window
        kfs = set(self.keyframes)
        resident = sorted(
            (f, slo) for slo, f in enumerate(self._slot_frame) if f >= 0
        )
        victim = None
        for f, slo in resident:
            if f >= protect_after:
                break
            if f not in kfs:
                victim = slo
                break
        if victim is None:
            for f, slo in resident:
                if f >= protect_after:
                    break
                victim = slo  # oldest keyframe — slots truly exhausted
                break
        if victim is None:
            raise ValueError(
                "all feature slots are held by the active window; raise "
                "cfg.max_slots"
            )
        self._slot_frame[victim] = i
        return victim

    def add_frame_features(
        self, feats: orb.Features, k, timestamp: float, dist=None
    ) -> FrameStats:
        """Ingest a frame from precomputed features (the fixture path — the
        reference's CSV snapshot trick, SURVEY.md 5.4). `dist` (radtan
        5-vector) undistorts keypoints before they enter the state — the
        correction the reference only half-applied (SURVEY.md 2.4)."""
        if dist is not None:
            if np.any(np.asarray(dist) != 0):
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
        self.timestamps.append(float(timestamp))
        slot = self._acquire_slot(i)
        self.state = self._add_feats(
            self.state,
            i,
            slot,
            feats.uv,
            feats.scale,
            feats.valid,
            feats.desc,
            feats.desc_pm1,
            jnp.asarray(k),
        )
        st = FrameStats(frame=i, tracked=False, n_inliers=0, n_new_points=0)
        if i == 0:
            st.tracked = True  # reference frame; pose_valid set by bootstrap
        elif not self._initialized:
            # Deferred two-view initialization: retry against the reference
            # frame until the map is well-conditioned (the reference runs its
            # `initialPoseEstimation` exactly once on frames (0, 1) and lives
            # with whatever it gets, `src/main.cpp:48-51`).
            res = self._bootstrap(self.state, self._init_ref, i, self._split())
            self.state = res.state
            st.tracked = bool(res.ok)
            st.n_inliers = int(res.n_inliers)
            st.n_new_points = int(res.n_points)
            if st.tracked:
                self._initialized = True
                st.is_keyframe = True
                self._last_kf = jnp.asarray(i, jnp.int32)
                if self.loop_closer is not None:
                    # the map's first anchor must be queryable for closure
                    self.loop_closer.add_frame(self.state, i)
            elif i - self._init_ref >= self.cfg.init.max_defer:
                self._init_ref = i - 1
        else:
            # ONE fused program per frame; stats stay on device (lazy)
            self.state, s = self._step(
                self.state, i, self._last_kf, self._split()
            )
            self._fold_step_stats(st, s)
        self._run_loop_closer(st, i)
        self.stats.append(st)
        return st

    def _fold_step_stats(self, st: FrameStats, s: StepStats) -> None:
        self._last_kf = s.last_kf
        st.tracked = s.tracked
        st.n_inliers = s.n_inliers
        st.n_new_points = s.n_new_points
        st.chi2_before = s.chi2_before
        st.chi2_after = s.chi2_after
        st.n_fused = s.n_fused
        st.n_culled = s.n_culled
        st.is_keyframe = s.is_keyframe

    def _run_loop_closer(self, st: FrameStats, i: int) -> None:
        if self.loop_closer is None or not self._initialized or i < 2:
            return
        if bool(st.tracked):  # syncs — loop closure is host-driven anyway
            self._fail_streak = 0
            if bool(st.is_keyframe):
                self.cull_redundant_keyframes()
            self.state, closed = self.loop_closer.run(
                self.state,
                i,
                self._split(),
                is_keyframe=bool(st.is_keyframe),
                keyframes=self.keyframes,
            )
            st.loop_closed = closed
        else:
            # Relocalization (ORB-SLAM Tracking::Relocalization): after a
            # run of failures, PnP against the BoW-nearest keyframes. Only
            # active with a loop closer attached — its database supplies the
            # candidates, and this path already syncs per frame.
            self._fail_streak += 1
            if self._fail_streak >= self.cfg.track.reloc_after:
                self._try_relocalize(st, i)

    def _try_relocalize(self, st: FrameStats, i: int) -> None:
        lc = self.loop_closer
        sl = int(self.state.slot_of[i])
        if sl < 0 or not lc._inserted:
            return
        q = lc._bow(self.state.desc_pm1[sl], self.state.kp_valid[sl])
        n_valid = max(lc._inserted) + 1
        scores = np.asarray(
            lc._score(q, lc._db, jnp.asarray(n_valid, jnp.int32))
        )
        slot_of = np.asarray(self.state.slot_of)
        pose_valid = np.asarray(self.state.pose_valid)
        cands = [
            f for f in sorted(
                (f for f in lc._inserted if f < i),
                key=lambda f: -scores[f],
            )
            if slot_of[f] >= 0 and pose_valid[f]
        ][: self.cfg.track.reloc_candidates]
        for cand in cands:
            res = self._reloc(self.state, i, cand, self._split())
            if bool(res.ok):
                self.state = res.state
                st.tracked = True
                st.n_inliers = int(res.n_inliers)
                self._fail_streak = 0
                return

    def _dev_const(self, arr, dtype) -> jnp.ndarray:
        """Device copy of a small host constant (k, dist), cached by value —
        per-frame `jnp.asarray`/`device_put` of even a 4-float array measured
        ~17 ms when interleaved with a queued compute chain on the tunneled
        TPU backend (RPC serialization), so constants transfer ONCE."""
        if isinstance(arr, jnp.ndarray):
            return arr.astype(dtype)
        key = (np.asarray(arr, np.float64).tobytes(), str(dtype))
        hit = self._dev_consts.get(key)
        if hit is None:
            hit = jax.device_put(jnp.asarray(arr, dtype))
            self._dev_consts[key] = hit
        return hit

    def _ingest_image_step(self, step_args, i, timestamp) -> FrameStats:
        self._next += 1
        self.timestamps.append(float(timestamp))
        self.state, s = step_args()
        st = FrameStats(frame=i, tracked=False, n_inliers=0, n_new_points=0)
        self._fold_step_stats(st, s)
        self._run_loop_closer(st, i)
        self.stats.append(st)
        return st

    def add_frame(self, img, k, timestamp: float = 0.0, dist=None) -> FrameStats:
        """Ingest a grayscale image (H, W) [0, 255].

        Initialized sessions run ONE fused program per image frame
        (`_image_session_step`); until then extraction runs standalone and
        the frame takes the feature path."""
        if self._initialized and self._next >= 2:
            i = self._next
            if i >= self.cfg.max_frames:
                raise ValueError(
                    f"frame capacity {self.cfg.max_frames} exhausted"
                )
            dtype = self.state.kp_uv.dtype
            dist_arr = self._dev_const(
                np.zeros(5) if dist is None else dist, dtype
            )
            img_dev = (
                img if isinstance(img, jnp.ndarray) else jax.device_put(img)
            )
            slot = self._acquire_slot(i)
            return self._ingest_image_step(
                lambda: self._img_step(
                    self.state, img_dev, i, slot, self._last_kf,
                    self._split(), self._dev_const(k, dtype), dist_arr,
                ),
                i, timestamp,
            )
        feats = self._extract(jnp.asarray(img, dtype=jnp.float32))
        return self.add_frame_features(feats, k, timestamp, dist=dist)

    def add_frame_from_buffer(
        self, buffer, idx: int, k, timestamp: float = 0.0, dist=None
    ) -> FrameStats:
        """Ingest frame `idx` of a DEVICE-RESIDENT (N, H, W) image buffer.

        The TPU-native analog of the reference's FrameLoader preload
        (`src/main.cpp:35-37` loads every frame into RAM before the per-frame
        loop): frames live in HBM, the per-frame loop does ZERO host->device
        transfers (a per-frame 1.2 MB transfer measured 15-50 ms when
        interleaved with the compute chain on the tunneled backend). The
        slice happens inside the fused step program."""
        if self._initialized and self._next >= 2:
            i = self._next
            if i >= self.cfg.max_frames:
                raise ValueError(
                    f"frame capacity {self.cfg.max_frames} exhausted"
                )
            dtype = self.state.kp_uv.dtype
            dist_arr = self._dev_const(
                np.zeros(5) if dist is None else dist, dtype
            )
            slot = self._acquire_slot(i)
            return self._ingest_image_step(
                lambda: self._img_step_buf(
                    self.state, buffer, idx, i, slot, self._last_kf,
                    self._split(), self._dev_const(k, dtype), dist_arr,
                ),
                i, timestamp,
            )
        feats = self._extract(buffer[idx].astype(jnp.float32))
        return self.add_frame_features(feats, k, timestamp, dist=dist)

    def cull_redundant_keyframes(self) -> list[int]:
        """Unflag keyframes whose observed points are redundantly covered by
        other frames — `LocalMapper::FrameCulling` (`src/LocalMapper.h:40`,
        declared, never implemented; `Mapper.localKeyframeCulling` in
        ORBSLAM.png). Culled keyframes leave the loop-closure candidate set
        and the essential graph, bounding both by scene coverage rather than
        trajectory length. Returns the newly culled ids."""
        from monocular_slam_tpu.slam import keyframes as kf_mod

        m = self.cfg.mapping
        kfs = self.keyframes
        if len(kfs) <= m.kf_keep_recent + 1:
            return []
        flags = np.zeros(self.cfg.max_frames, bool)
        flags[kfs] = True
        new_flags = kf_mod.cull_frames(
            self.state, flags,
            redundancy=m.kf_cull_redundancy,
            min_other_obs=m.kf_cull_min_other_obs,
        )
        new_flags[kfs[-m.kf_keep_recent :]] = True  # still gathering obs
        culled = [f for f in kfs if not new_flags[f]]
        self._kf_culled.update(culled)
        if self.loop_closer is not None:
            self.loop_closer._inserted = [
                f for f in self.loop_closer._inserted
                if f not in self._kf_culled
            ]
        return culled

    # --- outputs -----------------------------------------------------------
    @property
    def keyframes(self) -> list[int]:
        """Live keyframe indices (excludes FrameCulling victims).

        Folded incrementally: each frame's device flag is synced at most ONCE
        over the session's lifetime (a full rescan per access was O(F^2)
        host-device syncs once a loop closer reads this every frame)."""
        while self._kf_scanned < len(self.stats):
            s = self.stats[self._kf_scanned]
            if bool(s.is_keyframe):
                self._keyframes.append(s.frame)
            self._kf_scanned += 1
        return [f for f in self._keyframes if f not in self._kf_culled]

    def trajectory(self):
        """(poses (F, 3, 4), valid (F,), timestamps (F,)) as numpy, trimmed
        to ingested frames."""
        n = self._next
        return (
            np.asarray(self.state.poses[:n]),
            np.asarray(self.state.pose_valid[:n]),
            np.asarray(self.timestamps, dtype=np.float64),
        )

    def map_points(self):
        """(P_used, 3) numpy array of valid map points."""
        pts = np.asarray(self.state.points)
        ok = np.asarray(self.state.point_valid)
        return pts[ok]

    @property
    def n_map_points(self) -> int:
        return int(self.state.n_points)
