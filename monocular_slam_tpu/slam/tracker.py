"""Tracker: two-view bootstrap + PnP tracking with projection association.

Replaces `CameraPoseEstimator` (`src/CameraPoseEstimator.cpp`):
  frame 0  -> identity reference pose            (:228-230, 519-521)
  frame 1+ -> two-view bootstrap, retried until
              it produces a well-conditioned map (initialPoseEstimation,
              :264-376 — the reference runs it once and hopes)
  tracked  -> PnP against the map seeded by a 5-frame back-traverse match
              window (pnpPoseEstimation, :384-515) PLUS motion-model
              projection association and a track-local-map refine — the
              ORB-SLAM steps the reference declared (`SearchInNeighbors`,
              `src/LocalMapper.h:36`) but never implemented
plus new-point triangulation after each tracked frame (:487-512).

Each step is ONE jitted pure function SlamState -> SlamState with static
shapes; the reference's per-frame branching (:517-527) becomes separate
compiled programs selected by the host driver.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from monocular_slam_tpu.geometry import camera as cam
from monocular_slam_tpu.geometry import epipolar, pnp, se3, triangulate
from monocular_slam_tpu.ops import matching
from monocular_slam_tpu.optim import pose_ba, window_ba
from monocular_slam_tpu.slam import state as state_mod
from monocular_slam_tpu.slam.config import SlamConfig
from monocular_slam_tpu.slam.state import SlamState


class BootstrapResult(NamedTuple):
    state: SlamState
    ok: jnp.ndarray  # bool
    n_inliers: jnp.ndarray
    n_points: jnp.ndarray


def bootstrap(
    state: SlamState, key: jax.Array, cfg: SlamConfig, f0=0, f1=1
) -> BootstrapResult:
    """Two-view initialization between frames f0 and f1 (static or traced).

    match -> RANSAC F -> E -> cheirality pose -> triangulate -> two-view BA
    refine -> register map points observed in both frames (the reference's
    frame-1 path, `initialPoseEstimation`, `src/CameraPoseEstimator.cpp:
    264-376`). The BA polish is the gold-standard step the algebraic
    F/E chain lacks: at small baselines its ~0.5 deg rotation bias projects
    into correlated landmark-depth errors that poison every later PnP
    (measured: bootstrap rot error 0.31 deg -> 0.1 deg with refinement).
    """
    s0 = state_mod.slot_index(state, f0)
    s1 = state_mod.slot_index(state, f1)
    m = matching.match(
        state.desc_pm1[s0],
        state.desc_pm1[s1],
        state.kp_valid[s0],
        state.kp_valid[s1],
        ratio=cfg.frontend.match_ratio_init,
        max_dist=cfg.frontend.max_hamming,
    )
    uv0 = state.kp_uv[s0]
    uv1 = state.kp_uv[s1][m.idx]  # matched positions in f1, aligned to f0 rows

    res = epipolar.ransac_fundamental(
        key, uv0, uv1, m.ok, n_iters=cfg.init.ransac_iters, thresh=cfg.init.sampson_px
    )
    E = epipolar.essential_from_fundamental(res.F, state.k[f0], state.k[f1])
    tv = epipolar.pose_from_essential(
        E, state.k[f0], state.k[f1], uv0, uv1, res.inliers
    )
    T0 = state.poses[f0]
    T1 = se3.compose(tv.T_21, T0)  # chain onto the reference pose (:355-356)
    # tv.points are in f0's camera frame; lift to world.
    X_world = se3.apply(se3.inverse(T0), tv.points)
    want = tv.good

    # --- two-view BA refinement on the candidate structure ------------------
    N = uv0.shape[0]
    f1_slot = (
        jnp.full(N, N, jnp.int32)
        .at[jnp.where(want, m.idx, N)]
        .set(jnp.arange(N, dtype=jnp.int32), mode="drop")
    )
    prob = window_ba.build(
        poses=jnp.stack([T0, T1]),
        points=X_world,
        k=jnp.stack([state.k[f0], state.k[f1]]),
        pt_slot=jnp.stack(
            [jnp.arange(N, dtype=jnp.int32), jnp.minimum(f1_slot, N - 1)]
        ),
        uv=jnp.stack([uv0, state.kp_uv[s1]]),
        info=jnp.stack(
            [1.0 / state.kp_scale[s0], 1.0 / state.kp_scale[s1]]
        ).astype(state.kp_uv.dtype),
        valid=jnp.stack(
            [want & state.kp_valid[s0], (f1_slot < N) & state.kp_valid[s1]]
        ),
        fixed=jnp.array([True, False]),
    )
    bres = window_ba.bundle_adjust(
        prob, n_iters=cfg.init.refine_iters, delta=cfg.ba.huber_full
    )
    T1 = bres.poses[1]
    X_world = bres.points

    # --- re-gate on the refined geometry ------------------------------------
    Xc0 = se3.apply(T0, X_world)
    Xc1 = se3.apply(T1, X_world)
    e0 = jnp.linalg.norm(cam.project(state.k[f0], Xc0) - uv0, axis=-1)
    e1 = jnp.linalg.norm(cam.project(state.k[f1], Xc1) - uv1, axis=-1)
    par = triangulate.parallax_cosine(T0, T1, X_world)
    want = (
        want
        & (Xc0[:, 2] > cfg.track.min_depth)
        & (Xc1[:, 2] > cfg.track.min_depth)
        & (e0 < cfg.init.refine_px_thresh)
        & (e1 < cfg.init.refine_px_thresh)
        & (par < cfg.init.max_cos_parallax)
    )
    # acceptance needs enough points whose depth is actually observable
    strong = want & (par < cfg.init.strong_cos_parallax)
    n_strong = jnp.sum(strong.astype(jnp.int32))

    new_state, slot_ids = state_mod.allocate_points(state, X_world, want)
    # Register observations in both frames (registerNewMapPoint adds the
    # point to both observers, `src/CameraPoseEstimator.cpp:367-373`).
    feat_point = new_state.feat_point
    fp0 = jnp.where(slot_ids >= 0, slot_ids, feat_point[s0])
    feat_point = feat_point.at[s0].set(fp0)
    fp1 = feat_point[s1]
    # Route non-registered rows out of bounds: m.idx rows without a new point
    # are garbage indices and must not overwrite real registrations.
    N1 = fp1.shape[0]
    idx_write = jnp.where(slot_ids >= 0, m.idx, jnp.int32(N1))
    fp1 = fp1.at[idx_write].set(slot_ids, mode="drop")
    feat_point = feat_point.at[s1].set(fp1)

    ok = (
        (res.num_inliers >= cfg.init.min_inliers)
        & (tv.n_good >= cfg.init.min_inliers)
        & (n_strong >= cfg.init.min_strong_parallax)
    )
    new_state = new_state._replace(
        poses=new_state.poses.at[f1].set(T1),
        pose_valid=new_state.pose_valid.at[f0].set(ok).at[f1].set(ok),
        feat_point=feat_point,
    )
    # On failure keep the old state untouched (validationCheck-style skip);
    # the session retries against a later frame.
    final = jax.tree_util.tree_map(
        lambda new, old: jnp.where(ok, new, old), new_state, state
    )
    return BootstrapResult(final, ok, res.num_inliers, jnp.sum(slot_ids >= 0))


class TrackResult(NamedTuple):
    state: SlamState
    ok: jnp.ndarray
    n_pnp_inliers: jnp.ndarray
    n_new_points: jnp.ndarray


class RelocResult(NamedTuple):
    state: SlamState
    ok: jnp.ndarray
    n_inliers: jnp.ndarray


def relocalize(
    state: SlamState, i, cand, key: jax.Array, cfg: SlamConfig
) -> RelocResult:
    """Re-acquire a lost frame i against a HOST-CHOSEN candidate keyframe
    (BoW-selected): descriptor match -> the candidate's map associations ->
    PnP RANSAC -> motion-only refine. ORB-SLAM's `Tracking::Relocalization`;
    the reference has no recovery at all — a frame that fails its
    validationCheck is simply skipped forever (`src/Pipeline.h:57-61`).

    Only the pose is written (no triangulation — the next regular `track`
    rebuilds associations from this anchor). `i`, `cand` are traced ints."""
    si = state_mod.slot_index(state, i)
    sc = state_mod.slot_index(state, cand)
    cand_ok = (state.slot_of[cand] >= 0) & state.pose_valid[cand]
    m = matching.match(
        state.desc_pm1[si],
        state.desc_pm1[sc],
        state.kp_valid[si],
        state.kp_valid[sc] & cand_ok,
        ratio=cfg.frontend.match_ratio_init,
        max_dist=cfg.frontend.max_hamming,
    )
    pid = state.feat_point[sc][m.idx]
    has = m.ok & (pid >= 0) & state.point_valid[jnp.maximum(pid, 0)]
    X = state.points[jnp.maximum(pid, 0)]
    pres = pnp.solve_pnp_ransac(
        key,
        X,
        state.kp_uv[si],
        state.k[i],
        has & state.kp_valid[si],
        n_iters=cfg.track.pnp_iters,
        px_thresh=cfg.track.pnp_px_thresh,
        min_inliers=cfg.track.reloc_min_inliers,
    )
    rres = pose_ba.refine_pose(
        pres.T, X, state.kp_uv[si], state.k[i],
        (pres.inliers & has).astype(state.kp_uv.dtype), n_rounds=3,
        solver="gn",
    )
    n = jnp.maximum(pres.n_inliers, rres.n_inliers)
    ok = (n >= cfg.track.reloc_min_inliers) & cand_ok
    use_ref = rres.n_inliers >= pres.n_inliers
    T = jnp.where(use_ref, rres.T, pres.T)
    # Write the inlier ASSOCIATIONS too, not just the pose: the next frame's
    # window matching finds the map THROUGH this frame's feat_point — a
    # pose-only relocalization leaves the window starved and tracking fails
    # again immediately (measured: recover/fail alternation every 3 frames).
    inl = jnp.where(use_ref, rres.inliers, pres.inliers) & has
    fp_i = jnp.where(inl, pid, state.feat_point[si])
    new_state = state._replace(
        poses=state.poses.at[i].set(T),
        pose_valid=state.pose_valid.at[i].set(True),
        feat_point=state.feat_point.at[si].set(fp_i),
    )
    final = jax.tree_util.tree_map(
        lambda new, old: jnp.where(ok, new, old), new_state, state
    )
    return RelocResult(final, ok, n)


def _window_frames(state: SlamState, i, cfg: SlamConfig):
    """(B,) indices of the B most recent TRACKED frames before i (desc).

    The reference back-traverses i-1..i-5 blindly (`numBackTraverse=5`,
    `CameraPoseEstimator.cpp:390,405`); anchoring on tracked frames instead
    means a run of failed frames cannot permanently blind the tracker — it
    keeps re-matching against the last mapped views (relocalization).
    Returns (js_safe, js_ok)."""
    B = cfg.track.back_traverse
    F = state.poses.shape[0]
    idx = jnp.arange(F, dtype=jnp.int32)
    score = jnp.where(
        state.pose_valid & (state.slot_of >= 0) & (idx < i), idx, -1
    )
    js, _ = jax.lax.top_k(score, B)  # most recent tracked first
    js = js.astype(jnp.int32)
    return jnp.maximum(js, 0), js >= 0


def _window_matches(state: SlamState, i, cfg: SlamConfig):
    """Match frame i against its back-traverse window (the last B tracked
    frames).

    Returns per-window-slot Matches stacked: idx (B, N), ok (B, N)."""
    js_safe, js_ok = _window_frames(state, i, cfg)
    si = state_mod.slot_index(state, i)

    def match_one(j, j_ok):
        sj = state_mod.slot_index(state, j)
        return matching.match(
            state.desc_pm1[si],
            state.desc_pm1[sj],
            state.kp_valid[si],
            state.kp_valid[sj] & j_ok & state.pose_valid[j],
            ratio=cfg.frontend.match_ratio_track,
            max_dist=cfg.frontend.max_hamming,
        )

    m = jax.vmap(match_one)(js_safe, js_ok)
    return js_safe, js_ok, m


def _local_map_slab(state: SlamState, i, cfg: SlamConfig):
    """Compact the map points observed by the back-traverse window PLUS the
    most covisible older resident frames into a fixed (L,) slab with a
    representative descriptor per point.

    The covisible extension is ORB-SLAM's actual TrackLocalMap semantics
    (the local map spans covisibility-connected KEYFRAMES, not a fixed
    recency window): when the trajectory revisits mapped territory, the
    projection association re-adopts the ORIGINAL map points, anchoring the
    pose to old structure instead of the drifted recent clones — drift
    correction without an explicit loop closure.

    Returns (slab_pid (L,), usable (L,) bool, desc_l (L, 256) int8)."""
    tcfg = cfg.track
    B = tcfg.back_traverse
    N = state.feat_point.shape[1]
    P = state.points.shape[0]
    L = min(tcfg.local_map_cap, P)

    js_safe, js_ok = _window_frames(state, i, cfg)
    C = tcfg.local_map_covis
    if C:
        # covisibility row of the most recent tracked frame: count each
        # resident frame's overlap with its live map points, then take the
        # top-C older frames OUTSIDE the recency window.
        F = state.poses.shape[0]
        ref_slot = state_mod.slot_index(state, js_safe[0])
        pid_ref = state.feat_point[ref_slot]
        active = jnp.zeros(P + 1, bool).at[
            jnp.where(
                (pid_ref >= 0) & state.kp_valid[ref_slot], pid_ref, P
            )
        ].set(True).at[P].set(False)
        pid_all = state.feat_point  # (S, N)
        hit = (
            active[jnp.maximum(pid_all, 0)]
            & (pid_all >= 0)
            & state.kp_valid
            & state.point_valid[jnp.maximum(pid_all, 0)]
        )
        cnt_slot = jnp.sum(hit.astype(jnp.int32), axis=1)  # (S,)
        idxF = jnp.arange(F, dtype=jnp.int32)
        in_window = jnp.any(idxF[None, :] == js_safe[:, None], axis=0)
        cnt_f = jnp.where(
            (state.slot_of >= 0)
            & state.pose_valid
            & (idxF < i)
            & ~in_window,
            cnt_slot[jnp.maximum(state.slot_of, 0)],
            -1,
        )
        cscore, jc = jax.lax.top_k(cnt_f, C)
        jc_ok = cscore > 0
        js_safe = jnp.concatenate([js_safe, jnp.maximum(jc, 0)])
        js_ok = jnp.concatenate([js_ok, jc_ok])
        B = B + C
    sjs = state_mod.slot_index(state, js_safe)  # (B,) slots (resident by
    # construction: only slot-resident frames score/qualify)

    pid_win = state.feat_point[sjs]  # (B, N)
    win_valid = (
        (pid_win >= 0)
        & state.kp_valid[sjs]
        & js_ok[:, None]
        & state.point_valid[jnp.maximum(pid_win, 0)]
    )
    pid_seg = jnp.where(win_valid, pid_win, P).reshape(-1)  # (B*N,)
    active = jnp.zeros(P, bool).at[pid_seg].set(True, mode="drop")
    rank = jnp.cumsum(active.astype(jnp.int32)) - 1
    n_active = jnp.sum(active.astype(jnp.int32))
    slab_of = jnp.where(active & (rank < L), rank, L)
    slab_pid = (
        jnp.full(L + 1, 0, jnp.int32)
        .at[slab_of]
        .set(jnp.arange(P, dtype=jnp.int32), mode="drop")[:L]
    )
    slab_used = jnp.arange(L) < jnp.minimum(n_active, L)

    # representative descriptor: the point's observation in the most recent
    # window frame, found with one segment-min over the window observations
    BIG = jnp.int32(B * N)
    flat = jnp.arange(B * N, dtype=jnp.int32)
    obs_first = jax.ops.segment_min(
        jnp.where(win_valid.reshape(-1), flat, BIG), pid_seg, num_segments=P + 1
    )[:P]
    slab_first = obs_first[slab_pid]  # (L,)
    has_desc = slab_first < BIG
    sf = jnp.minimum(slab_first, BIG - 1)
    desc_l = state.desc_pm1[sjs[sf // N], sf % N]  # (L, 256)
    return slab_pid, slab_used & has_desc, desc_l


def _project_associate(
    state: SlamState, i, T, fp_i, slab_pid, usable, desc_l, radius_px, cfg
):
    """Project the slab points under pose T and adopt, for each still-free
    feature of frame i, the best descriptor match within `radius_px`.

    The projection-guided association of ORB-SLAM's TrackLocalMap /
    `SearchInNeighbors` (declared `src/LocalMapper.h:36`, unimplemented).
    Returns (fp_i', adopt (N,) bool)."""
    tcfg = cfg.track
    Xl = state.points[slab_pid]
    Xc = se3.apply(T, Xl)
    uv_l = cam.project(state.k[i], Xc)
    W, H = cfg.image_wh
    vis = usable & (Xc[:, 2] > tcfg.min_depth) & cam.in_image(uv_l, W, H)
    si = state_mod.slot_index(state, i)
    free = state.kp_valid[si] & (fp_i < 0)
    d2 = jnp.sum((state.kp_uv[si][:, None, :] - uv_l[None, :, :]) ** 2, axis=-1)
    near = (d2 <= radius_px * radius_px) & vis[None, :] & free[:, None]  # (N, L)
    dots = jnp.matmul(
        state.desc_pm1[si].astype(jnp.int8),
        desc_l.astype(jnp.int8).T,
        preferred_element_type=jnp.int32,
    )
    ham = (256 - dots) >> 1
    BIGI = jnp.int32(1 << 20)
    gated = jnp.where(near & (ham <= tcfg.local_max_hamming), ham, BIGI)
    best = jnp.argmin(gated, axis=1)
    best_d = jnp.take_along_axis(gated, best[:, None], axis=1)[:, 0]
    adopt = best_d < BIGI
    return jnp.where(adopt, slab_pid[best], fp_i), adopt


def _predict_pose(state: SlamState, i):
    """Constant-velocity pose prediction (ORB-SLAM's motion model). Falls
    back to the last valid pose when the previous two frames aren't both
    tracked."""
    F = state.poses.shape[0]
    iprev = jnp.maximum(i - 1, 0)
    ipp = jnp.maximum(i - 2, 0)
    ok_vel = state.pose_valid[iprev] & state.pose_valid[ipp] & (i >= 2)
    delta = se3.compose(state.poses[iprev], se3.inverse(state.poses[ipp]))
    eye = se3.identity(dtype=state.poses.dtype)
    delta = jnp.where(ok_vel, delta, eye)
    # most recent valid pose as the anchor
    idx = jnp.arange(F, dtype=jnp.int32)
    jlast = jnp.argmax(jnp.where(state.pose_valid & (idx < i), idx, -1))
    anchor = state.poses[jlast]
    base = jnp.where(state.pose_valid[iprev], state.poses[iprev], anchor)
    return se3.compose(delta, base)


def track(
    state: SlamState, i, key: jax.Array, cfg: SlamConfig
) -> TrackResult:
    """PnP tracking of frame i (traced int) + new-point triangulation.

    The reference's `pnpPoseEstimation` (`src/CameraPoseEstimator.cpp:384-515`)
    collects 3D-2D pairs from the 5-frame match window and PnP-RANSACs the
    pose. Here the seed set is additionally populated by projecting the
    window-local map under a constant-velocity pose prediction (association
    by matching alone starves PnP once the map outgrows the match window),
    and the winning pose is re-refined motion-only on the full set before
    new points are triangulated.
    """
    N = state.feat_point.shape[1]
    dtype = state.kp_uv.dtype
    si = state_mod.slot_index(state, i)
    js_safe, js_ok, m = _window_matches(state, i, cfg)  # (B,), (B, N)
    sjs = state_mod.slot_index(state, js_safe)

    # --- 3D-2D association: nearest previous frame wins (w = 0 first) ---
    pid_w = jnp.take_along_axis(
        state.feat_point[sjs], m.idx, axis=1
    )  # (B, N): map point of the matched prev feature
    cand = m.ok & (pid_w >= 0)  # (B, N)
    w_sel = jnp.argmax(cand, axis=0)  # first window slot with a candidate
    has = jnp.any(cand, axis=0)  # (N,)
    pid = jnp.take_along_axis(pid_w, w_sel[None], axis=0)[0]  # (N,)
    pid = jnp.where(has, pid, -1)

    # --- motion-model projection association (TrackWithMotionModel) ---------
    use_lm = cfg.track.track_local_map
    T_pred = _predict_pose(state, i)
    if use_lm:
        slab_pid, usable, desc_l = _local_map_slab(state, i, cfg)
        pid, _ = _project_associate(
            state, i, T_pred, pid, slab_pid, usable, desc_l,
            cfg.track.predict_radius_px, cfg,
        )

    # --- PnP on associated pairs (constant-velocity prediction rides the
    # hypothesis pool; LO rounds deflake the minimal-sample draw) ---
    Xmap = state.points[jnp.maximum(pid, 0)]
    k_pnp, k_rest = jax.random.split(key)
    pres = pnp.solve_pnp_ransac(
        k_pnp,
        Xmap,
        state.kp_uv[si],
        state.k[i],
        (pid >= 0) & state.kp_valid[si],
        n_iters=cfg.track.pnp_iters,
        px_thresh=cfg.track.pnp_px_thresh,
        min_inliers=cfg.track.pnp_min_inliers,
        T_init=T_pred,
    )
    T_i = pres.T

    # Associate inlier features with their map points
    # (`associateFeatureWithMapPoint`, `src/CameraPoseEstimator.cpp:218-233`).
    fp_i = jnp.where(pres.inliers & (pid >= 0), pid, state.feat_point[si])
    n_inliers = pres.n_inliers

    # --- track-local-map second pass: tighter radius on the PnP pose, then
    # motion-only re-refine on the enlarged association set ------------------
    if use_lm:
        fp_i, adopt = _project_associate(
            state, i, T_i, fp_i, slab_pid, usable, desc_l,
            cfg.track.local_radius_px, cfg,
        )
        assoc = (fp_i >= 0) & state.kp_valid[si]
        Xa = state.points[jnp.maximum(fp_i, 0)]
        rres = pose_ba.refine_pose(
            T_i, Xa, state.kp_uv[si], state.k[i], assoc.astype(dtype),
            n_rounds=3, solver="gn",
        )
        use = rres.n_inliers >= pres.n_inliers
        T_i = jnp.where(use, rres.T, T_i)
        # drop adopted associations the refined pose rejects (chi2 outliers)
        fp_i = jnp.where(adopt & use & ~rres.inliers, -1, fp_i)
        n_inliers = jnp.where(use, rres.n_inliers, pres.n_inliers)
    # accept on the FINAL inlier count: the track-local-map refine routinely
    # rescues frames whose match-seeded PnP alone falls under the gate
    ok = n_inliers >= cfg.track.pnp_min_inliers

    # --- new-point triangulation from no-map-point match pairs (:487-512) ---
    fresh = m.ok & (pid_w < 0) & (fp_i[None, :] < 0)  # (B, N)
    # Partner choice: the FARTHEST window frame with a fresh pair, not the
    # nearest — the 5-frames-back baseline cuts triangulated depth noise ~5x
    # vs the adjacent frame (depth sigma ~ z^2/(f*b)).
    Bwin = fresh.shape[0]
    w_new = Bwin - 1 - jnp.argmax(fresh[::-1], axis=0)
    has_new = jnp.any(fresh, axis=0)
    j_new = js_safe[w_new]  # (N,) partner frame
    prev_feat = jnp.take_along_axis(m.idx, w_new[None], axis=0)[0]  # (N,)
    uv_prev = state.kp_uv[sjs[w_new], prev_feat]  # (N, 2)
    T_prev = state.poses[j_new]  # (N, 3, 4)
    k_prev = state.k[j_new]

    X_new = triangulate.triangulate_dlt(
        triangulate.projection_matrix(k_prev, T_prev),
        triangulate.projection_matrix(state.k[i], T_i),
        uv_prev[:, None],
        state.kp_uv[si][:, None],
    )[:, 0]

    Xc_prev = se3.apply(T_prev, X_new)  # (N, 3) in each partner camera
    Xc_cur = se3.apply(T_i, X_new)
    z_prev, z_cur = Xc_prev[:, 2], Xc_cur[:, 2]
    e_prev = jnp.linalg.norm(cam.project(k_prev, Xc_prev) - uv_prev, axis=-1)
    e_cur = jnp.linalg.norm(cam.project(state.k[i], Xc_cur) - state.kp_uv[si], axis=-1)
    # parallax gate: depth is unobservable below ~1 deg of ray separation and
    # such points poison later PnP with correlated depth error
    c_prev = se3.camera_center(T_prev)  # (N, 3)
    c_cur = se3.camera_center(T_i)  # (3,)
    r1 = X_new - c_prev
    r2 = X_new - c_cur[None, :]
    cospar = jnp.sum(r1 * r2, axis=-1) / jnp.maximum(
        jnp.linalg.norm(r1, axis=-1) * jnp.linalg.norm(r2, axis=-1), 1e-12
    )
    want = (
        has_new
        & ok
        & state.kp_valid[si]
        & (z_prev > cfg.track.min_depth)
        & (z_cur > cfg.track.min_depth)
        & (z_prev < cfg.track.max_depth)
        & (z_cur < cfg.track.max_depth)
        & (e_cur < cfg.track.triangulate_px_thresh)
        & (e_prev < cfg.track.triangulate_px_thresh)
        & (cospar < cfg.track.triangulate_max_cos_parallax)
    )
    new_state, slot_ids = state_mod.allocate_points(state, X_new, want)

    # Register the new points in both observers. Non-allocated rows scatter
    # out of bounds (drop) so duplicate (frame, feat) targets can't clobber
    # a real registration.
    fp_i = jnp.where(slot_ids >= 0, slot_ids, fp_i)
    feat_point = new_state.feat_point
    Scap = feat_point.shape[0]
    s_new = sjs[w_new]  # partner frames' slots (resident by construction)
    j_write = jnp.where(slot_ids >= 0, s_new, jnp.int32(Scap))
    feat_point = feat_point.at[j_write, prev_feat].set(slot_ids, mode="drop")
    feat_point = feat_point.at[si].set(fp_i)

    new_state = new_state._replace(
        poses=new_state.poses.at[i].set(T_i),
        pose_valid=new_state.pose_valid.at[i].set(ok),
        feat_point=feat_point,
    )
    # Failed PnP: keep old state except mark pose invalid (frame skipped,
    # like a failed validationCheck, `src/Pipeline.h:57-61`).
    final = jax.tree_util.tree_map(
        lambda new, old: jnp.where(ok, new, old), new_state, state
    )
    return TrackResult(final, ok, n_inliers, jnp.sum(slot_ids >= 0))
