"""Tracker: two-view bootstrap + PnP tracking with back-traverse association.

Replaces `CameraPoseEstimator` (`src/CameraPoseEstimator.cpp`):
  frame 0  -> identity reference pose            (:228-230, 519-521)
  frame 1  -> two-view bootstrap                 (initialPoseEstimation, :264-376)
  frame >=2 -> PnP against the map with a 5-frame
              back-traverse match window         (pnpPoseEstimation, :384-515)
plus new-point triangulation after each tracked frame (:487-512).

Each step is ONE jitted pure function SlamState -> SlamState with static
shapes; the reference's per-frame branching (:517-527) becomes three separate
compiled programs selected by the host driver.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from monocular_slam_tpu.geometry import epipolar, pnp, se3, triangulate
from monocular_slam_tpu.ops import matching
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
    """Two-view initialization between frames f0 and f1 (static ints).

    match -> RANSAC F -> E -> cheirality pose -> triangulate -> register map
    points observed in both frames (the reference's frame-1 path,
    `initialPoseEstimation`, `src/CameraPoseEstimator.cpp:264-376`).
    """
    m = matching.match(
        state.desc_pm1[f0],
        state.desc_pm1[f1],
        state.kp_valid[f0],
        state.kp_valid[f1],
        ratio=cfg.frontend.match_ratio_init,
        max_dist=cfg.frontend.max_hamming,
    )
    uv0 = state.kp_uv[f0]
    uv1 = state.kp_uv[f1][m.idx]  # matched positions in f1, aligned to f0 slots

    res = epipolar.ransac_fundamental(
        key, uv0, uv1, m.ok, n_iters=cfg.init.ransac_iters, thresh=cfg.init.sampson_px
    )
    E = epipolar.essential_from_fundamental(res.F, state.k[f0], state.k[f1])
    tv = epipolar.pose_from_essential(
        E, state.k[f0], state.k[f1], uv0, uv1, res.inliers
    )
    # Gate new points: cheirality + parallax (reject unstable far points).
    T0 = state.poses[f0]
    T1 = se3.compose(tv.T_21, T0)  # chain onto the reference pose (:355-356)
    # tv.points are in f0's camera frame; lift to world.
    X_world = se3.apply(se3.inverse(T0), tv.points)
    par = triangulate.parallax_cosine(T0, T1, X_world)
    want = tv.good & (par < cfg.init.max_cos_parallax)

    new_state, slot_ids = state_mod.allocate_points(state, X_world, want)
    # Register observations in both frames (registerNewMapPoint adds the
    # point to both observers, `src/CameraPoseEstimator.cpp:367-373`).
    feat_point = new_state.feat_point
    feat_point = feat_point.at[f0].set(
        jnp.where(slot_ids >= 0, slot_ids, feat_point[f0])
    )
    fp1 = feat_point[f1]
    # Route non-registered rows out of bounds: m.idx rows without a new point
    # are garbage indices and must not overwrite real registrations.
    N1 = fp1.shape[0]
    idx_write = jnp.where(slot_ids >= 0, m.idx, jnp.int32(N1))
    fp1 = fp1.at[idx_write].set(slot_ids, mode="drop")
    feat_point = feat_point.at[f1].set(fp1)

    ok = (res.num_inliers >= cfg.init.min_inliers) & (tv.n_good >= cfg.init.min_inliers)
    new_state = new_state._replace(
        poses=new_state.poses.at[f1].set(T1),
        pose_valid=new_state.pose_valid.at[f0].set(True).at[f1].set(ok),
        feat_point=feat_point,
    )
    # On failure keep the old state untouched (validationCheck-style skip).
    final = jax.tree_util.tree_map(
        lambda new, old: jnp.where(ok, new, old),
        new_state,
        state._replace(pose_valid=state.pose_valid.at[f0].set(True)),
    )
    return BootstrapResult(final, ok, res.num_inliers, jnp.sum(slot_ids >= 0))


class TrackResult(NamedTuple):
    state: SlamState
    ok: jnp.ndarray
    n_pnp_inliers: jnp.ndarray
    n_new_points: jnp.ndarray


def _window_matches(state: SlamState, i, cfg: SlamConfig):
    """Match frame i against its back-traverse window (i-1 .. i-B).

    Returns per-window-slot Matches stacked: idx (B, N), ok (B, N)."""
    B = cfg.track.back_traverse
    js = i - 1 - jnp.arange(B, dtype=jnp.int32)  # (B,)
    js_ok = js >= 0
    js_safe = jnp.maximum(js, 0)

    def match_one(j, j_ok):
        return matching.match(
            state.desc_pm1[i],
            state.desc_pm1[j],
            state.kp_valid[i],
            state.kp_valid[j] & j_ok & state.pose_valid[j],
            ratio=cfg.frontend.match_ratio_track,
            max_dist=cfg.frontend.max_hamming,
        )

    m = jax.vmap(match_one)(js_safe, js_ok)
    return js_safe, js_ok, m


def track(
    state: SlamState, i, key: jax.Array, cfg: SlamConfig
) -> TrackResult:
    """PnP tracking of frame i (traced int >= 2) + new-point triangulation.

    The reference's `pnpPoseEstimation` (`src/CameraPoseEstimator.cpp:384-515`):
    collect 3D-2D pairs from the 5-frame window, PnP-RANSAC the pose, then
    triangulate brand-new points from match pairs that have no map point.
    """
    N = state.feat_point.shape[1]
    js_safe, js_ok, m = _window_matches(state, i, cfg)  # (B,), (B, N)

    # --- 3D-2D association: nearest previous frame wins (w = 0 first) ---
    pid_w = jnp.take_along_axis(
        state.feat_point[js_safe], m.idx, axis=1
    )  # (B, N): map point of the matched prev feature
    cand = m.ok & (pid_w >= 0)  # (B, N)
    w_sel = jnp.argmax(cand, axis=0)  # first window slot with a candidate
    has = jnp.any(cand, axis=0)  # (N,)
    pid = jnp.take_along_axis(pid_w, w_sel[None], axis=0)[0]  # (N,)
    pid = jnp.where(has, pid, -1)

    # --- PnP on associated pairs ---
    Xmap = state.points[jnp.maximum(pid, 0)]
    k_pnp, k_rest = jax.random.split(key)
    pres = pnp.solve_pnp_ransac(
        k_pnp,
        Xmap,
        state.kp_uv[i],
        state.k[i],
        has & state.kp_valid[i],
        n_iters=cfg.track.pnp_iters,
        px_thresh=cfg.track.pnp_px_thresh,
        min_inliers=cfg.track.pnp_min_inliers,
    )
    T_i = pres.T

    # Associate inlier features with their map points
    # (`associateFeatureWithMapPoint`, `src/CameraPoseEstimator.cpp:218-233`).
    fp_i = jnp.where(pres.inliers & (pid >= 0), pid, state.feat_point[i])

    # --- new-point triangulation from no-map-point match pairs (:487-512) ---
    fresh = m.ok & (pid_w < 0) & (fp_i[None, :] < 0)  # (B, N)
    w_new = jnp.argmax(fresh, axis=0)
    has_new = jnp.any(fresh, axis=0)
    j_new = js_safe[w_new]  # (N,) partner frame
    prev_feat = jnp.take_along_axis(m.idx, w_new[None], axis=0)[0]  # (N,)
    uv_prev = state.kp_uv[j_new, prev_feat]  # (N, 2)
    T_prev = state.poses[j_new]  # (N, 3, 4)
    k_prev = state.k[j_new]

    X_new = triangulate.triangulate_dlt(
        triangulate.projection_matrix(k_prev, T_prev),
        triangulate.projection_matrix(state.k[i], T_i),
        uv_prev[:, None],
        state.kp_uv[i][:, None],
    )[:, 0]
    from monocular_slam_tpu.geometry import camera as cam

    Xc_prev = se3.apply(T_prev, X_new)  # (N, 3) in each partner camera
    Xc_cur = se3.apply(T_i, X_new)
    z_prev, z_cur = Xc_prev[:, 2], Xc_cur[:, 2]
    e_prev = jnp.linalg.norm(cam.project(k_prev, Xc_prev) - uv_prev, axis=-1)
    e_cur = jnp.linalg.norm(cam.project(state.k[i], Xc_cur) - state.kp_uv[i], axis=-1)
    want = (
        has_new
        & pres.ok
        & state.kp_valid[i]
        & (z_prev > cfg.track.min_depth)
        & (z_cur > cfg.track.min_depth)
        & (z_prev < cfg.track.max_depth)
        & (z_cur < cfg.track.max_depth)
        & (e_cur < cfg.track.triangulate_px_thresh)
        & (e_prev < cfg.track.triangulate_px_thresh)
    )
    new_state, slot_ids = state_mod.allocate_points(state, X_new, want)

    # Register the new points in both observers. Non-allocated rows scatter
    # out of bounds (drop) so duplicate (frame, feat) targets can't clobber
    # a real registration.
    fp_i = jnp.where(slot_ids >= 0, slot_ids, fp_i)
    feat_point = new_state.feat_point
    Fcap = feat_point.shape[0]
    j_write = jnp.where(slot_ids >= 0, j_new, jnp.int32(Fcap))
    feat_point = feat_point.at[j_write, prev_feat].set(slot_ids, mode="drop")
    feat_point = feat_point.at[i].set(fp_i)

    new_state = new_state._replace(
        poses=new_state.poses.at[i].set(T_i),
        pose_valid=new_state.pose_valid.at[i].set(pres.ok),
        feat_point=feat_point,
    )
    # Failed PnP: keep old state except mark pose invalid (frame skipped,
    # like a failed validationCheck, `src/Pipeline.h:57-61`).
    final = jax.tree_util.tree_map(
        lambda new, old: jnp.where(pres.ok, new, old), new_state, state
    )
    return TrackResult(final, pres.ok, pres.n_inliers, jnp.sum(slot_ids >= 0))
