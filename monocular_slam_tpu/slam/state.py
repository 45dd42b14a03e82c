"""SlamState — the immutable, fixed-capacity world state.

Replaces the reference's mutable `DataManager` "CAS" (`src/DataManager.h:23-36`,
pattern documented at `src/Frame.h:3-9`) with a single pytree of mask-padded
arrays. Every pipeline stage is a pure function state' = f(state, ...), jitted
once for the whole run.

Key representation choice: the reference keeps a per-map-point observation map
`MapPoint::observerToIndex` (frameIdx -> featureIdx, `src/MapPoint.h:27`) AND
a per-feature back-pointer `Features::mapPointsIndices` (`src/Frame.h:30`).
Only the back-pointer `feat_point` is stored here — the observation list is
its inverse and every consumer (BA edge building, covisibility counting)
derives it with one flatten, so the two can never disagree.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from monocular_slam_tpu.slam.config import SlamConfig


class SlamState(NamedTuple):
    # --- frames (capacity F) ---
    poses: jnp.ndarray  # (F, 3, 4) world->camera Rt (`Frame::Rt`)
    pose_valid: jnp.ndarray  # (F,) bool — pose has been estimated
    k: jnp.ndarray  # (F, 4) per-frame intrinsics (`Frame::K`)
    # --- features per frame (capacity F x N) ---
    kp_uv: jnp.ndarray  # (F, N, 2) float32 — undistorted pixels
    kp_scale: jnp.ndarray  # (F, N) pyramid scale (`Features::scales`)
    kp_valid: jnp.ndarray  # (F, N) bool
    desc: jnp.ndarray  # (F, N, 8) uint32 packed ORB
    desc_pm1: jnp.ndarray  # (F, N, 256) int8 for MXU matching
    feat_point: jnp.ndarray  # (F, N) int32 — map point id or -1
    # --- map points (capacity P) ---
    points: jnp.ndarray  # (P, 3) world positions
    point_valid: jnp.ndarray  # (P,) bool
    n_points: jnp.ndarray  # scalar int32 — live (valid) map-point count
    n_frames: jnp.ndarray  # scalar int32 — frames ingested so far


def empty_state(cfg: SlamConfig, dtype=jnp.float32) -> SlamState:
    F, N, P = cfg.max_frames, cfg.frontend.n_features, cfg.max_points
    return SlamState(
        poses=jnp.tile(
            jnp.concatenate([jnp.eye(3, dtype=dtype), jnp.zeros((3, 1), dtype)], axis=1),
            (F, 1, 1),
        ),
        pose_valid=jnp.zeros(F, bool),
        k=jnp.zeros((F, 4), dtype),
        kp_uv=jnp.zeros((F, N, 2), dtype),
        kp_scale=jnp.ones((F, N), dtype),
        kp_valid=jnp.zeros((F, N), bool),
        desc=jnp.zeros((F, N, 8), jnp.uint32),
        desc_pm1=jnp.zeros((F, N, 256), jnp.int8),
        feat_point=jnp.full((F, N), -1, jnp.int32),
        points=jnp.zeros((P, 3), dtype),
        point_valid=jnp.zeros(P, bool),
        n_points=jnp.asarray(0, jnp.int32),
        n_frames=jnp.asarray(0, jnp.int32),
    )


def add_frame_features(
    state: SlamState,
    frame_idx,
    uv,
    scale,
    valid,
    desc,
    desc_pm1,
    k,
) -> SlamState:
    """Write one frame's extracted features into its slot (the
    `FeatureExtractor::process` write, `src/FeatureExtractor.cpp:13-31`).
    Timestamps stay host-side in the session: device f32 cannot hold TUM
    epoch stamps (~1.3e9 s) to the 0.02 s association tolerance."""
    dtype = state.kp_uv.dtype
    return state._replace(
        kp_uv=state.kp_uv.at[frame_idx].set(uv.astype(dtype)),
        kp_scale=state.kp_scale.at[frame_idx].set(scale.astype(dtype)),
        kp_valid=state.kp_valid.at[frame_idx].set(valid),
        desc=state.desc.at[frame_idx].set(desc),
        desc_pm1=state.desc_pm1.at[frame_idx].set(desc_pm1),
        feat_point=state.feat_point.at[frame_idx].set(
            jnp.full(state.feat_point.shape[1], -1, jnp.int32)
        ),
        k=state.k.at[frame_idx].set(jnp.asarray(k, dtype)),
        n_frames=jnp.maximum(state.n_frames, jnp.asarray(frame_idx + 1, jnp.int32)),
    )


def observation_edges(state: SlamState):
    """Flatten feat_point into BA edge arrays (fixed capacity F*N).

    Returns (cam_idx (E,), pt_idx (E,), uv (E, 2), info (E,), valid (E,)).
    This derives what the reference builds by iterating MapPoint observation
    maps in `src/Util.cpp:87-169`.
    """
    F, N = state.feat_point.shape
    cam_idx = jnp.repeat(jnp.arange(F, dtype=jnp.int32), N)
    pt_idx = state.feat_point.reshape(-1)
    uv = state.kp_uv.reshape(F * N, 2)
    # information 1/scale — the reference's I_2/scale (`src/Util.cpp:141-153`)
    info = (1.0 / state.kp_scale.reshape(-1)).astype(state.kp_uv.dtype)
    valid = (
        (pt_idx >= 0)
        & state.kp_valid.reshape(-1)
        & state.pose_valid[cam_idx]
    )
    return cam_idx, jnp.maximum(pt_idx, 0), uv, info, valid


def allocate_points(
    state: SlamState, new_xyz: jnp.ndarray, want: jnp.ndarray
):
    """Allocate up to sum(want) new map points from a fixed-size candidate
    buffer into FREE slots (never-used or culled — slots are recycled, so a
    long run only exhausts capacity when the *live* map outgrows P).
    Returns (state', slot_ids (M,) int32) where slot_ids[i] is the allocated
    id or -1 if not allocated (capacity full or not wanted).

    Replaces `CameraPoseEstimator::registerNewMapPoint`
    (`src/CameraPoseEstimator.cpp:235-243`) + the slot reuse the reference
    gets for free from `std::vector` deletion (`src/DataManager.h:29-35`,
    `MapPoint.cpp:8-28`), as two cumsum rankings and one scatter. Safe
    because `mapping.cull_points` clears every dangling `feat_point`
    back-pointer when it frees a slot — nothing can alias a recycled id.
    """
    P = state.points.shape[0]
    M = want.shape[0]
    rank = jnp.cumsum(want.astype(jnp.int32)) - 1  # rank among wanted
    # rank free slots; slot_of_rank[r] = index of the (r+1)-th free slot
    free = ~state.point_valid
    frank = jnp.cumsum(free.astype(jnp.int32)) - 1  # (P,)
    slot_of_rank = (
        jnp.full(M + 1, P, jnp.int32)
        .at[jnp.where(free & (frank < M), frank, M)]
        .set(jnp.arange(P, dtype=jnp.int32), mode="drop")[:M]
    )
    slots = slot_of_rank[jnp.clip(rank, 0, M - 1)]
    ok = want & (slots < P)
    # Non-allocated candidates scatter out-of-bounds with drop semantics so
    # duplicate-index write ordering can never clobber a real allocation.
    slots_safe = jnp.where(ok, slots, P)
    points = state.points.at[slots_safe].set(new_xyz.astype(state.points.dtype), mode="drop")
    point_valid = state.point_valid.at[slots_safe].set(True, mode="drop")
    state = state._replace(
        points=points,
        point_valid=point_valid,
        n_points=jnp.sum(point_valid.astype(jnp.int32)),
    )
    return state, jnp.where(ok, slots, -1)
