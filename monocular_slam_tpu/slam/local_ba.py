"""Windowed local bundle adjustment over the SlamState.

The reference's `Optimiser` stage re-runs FULL global BA after every frame
(`src/Optimiser.cpp:6-18`) — O(T^2) over a trajectory (SURVEY.md 5.7). Here
the per-frame refinement is a sliding window: the last `window` frames are
free, the `window` frames before them participate with FIXED poses (so map
points shared with older frames stay consistent), and all map points observed
by the window are free. Fixed-capacity problem: 2*window camera slots,
2*window*N edge slots, full point capacity (padded blocks are masked).

Global BA (`optim.ba.global_bundle_adjust`) remains available for loop
closure and final refinement.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from monocular_slam_tpu.optim import ba
from monocular_slam_tpu.slam.config import SlamConfig
from monocular_slam_tpu.slam.state import SlamState


class LocalBAResult(NamedTuple):
    state: SlamState
    chi2_initial: jnp.ndarray
    chi2_final: jnp.ndarray


def local_bundle_adjust(
    state: SlamState, i, cfg: SlamConfig
) -> LocalBAResult:
    """Adjust poses of frames (i-window, i] and their map points; frames
    (i-2*window, i-window] are fixed anchors. `i` is a traced int."""
    W = cfg.ba.window
    N = state.feat_point.shape[1]
    F2 = 2 * W

    # Window slots w = 0..2W-1 map to global frames i - (2W-1) + w.
    base = i - (F2 - 1)
    g_idx = base + jnp.arange(F2, dtype=jnp.int32)  # (2W,)
    g_ok = g_idx >= 0
    g_safe = jnp.maximum(g_idx, 0)

    poses_w = state.poses[g_safe]  # (2W, 3, 4)
    k_w = state.k[g_safe]
    valid_frame = g_ok & state.pose_valid[g_safe]
    fixed = (jnp.arange(F2, dtype=jnp.int32) < W) | ~valid_frame  # anchors + padding fixed

    # Edges: all feature slots of the window frames.
    cam_idx = jnp.repeat(jnp.arange(F2, dtype=jnp.int32), N)
    pt_idx = state.feat_point[g_safe].reshape(-1)
    uv = state.kp_uv[g_safe].reshape(F2 * N, 2)
    info = (1.0 / state.kp_scale[g_safe].reshape(-1)).astype(uv.dtype)
    valid = (
        (pt_idx >= 0)
        & state.kp_valid[g_safe].reshape(-1)
        & valid_frame[cam_idx]
    )

    # --- compact the active points into a small slab -----------------------
    # The window observes at most 2W*N points, but the global point capacity
    # P can be 10-100x larger; running BA over full capacity makes the Schur
    # cross-term matmul and the Hpl scatter scale with P instead of with the
    # active set (measured 3x whole-frame slowdown at P=20k). Build a rank
    # table: active point -> slot in a fixed P_BA slab.
    P = state.points.shape[0]
    # Slab capacity: worst case is F2*N distinct points, but windows re-observe
    # the same landmarks heavily; overflow edges are dropped for this call
    # (those points simply skip one refinement).
    P_BA = min(P, F2 * N, cfg.ba.local_max_points)
    pt_safe = jnp.maximum(pt_idx, 0)
    active = jnp.zeros(P, bool).at[jnp.where(valid, pt_safe, P)].set(True, mode="drop")
    rank = jnp.cumsum(active.astype(jnp.int32)) - 1  # (P,) slab slot per point
    n_active = jnp.sum(active.astype(jnp.int32))
    overflow = rank >= P_BA  # pathological: more active points than slab
    slab_of = jnp.where(active & ~overflow, rank, P_BA)  # P_BA = dump slot
    # inverse map: slab slot -> global point id (for write-back)
    inv = jnp.full(P_BA + 1, 0, jnp.int32).at[slab_of].set(
        jnp.arange(P, dtype=jnp.int32), mode="drop"
    )
    points_slab = state.points[inv[:P_BA]]
    pt_local = slab_of[pt_safe]  # (E,) edge -> slab slot (P_BA if overflow)
    valid = valid & (pt_local < P_BA)
    pt_local = jnp.minimum(pt_local, P_BA - 1)

    prob = ba.BAProblem(
        poses=poses_w,
        points=points_slab,
        k=k_w,
        cam_idx=cam_idx,
        pt_idx=pt_local,
        uv=uv,
        info=info,
        valid=valid,
        fixed=fixed,
    )
    res = ba.bundle_adjust(prob, n_iters=cfg.ba.local_iters, delta=cfg.ba.huber_full)

    # Write back free-frame poses and the slab points. Early in the run
    # g_safe contains clamped duplicates of frame 0; route non-free slots out
    # of bounds (drop) so duplicate writes can't clobber a real update.
    free = ~fixed
    F = state.poses.shape[0]
    write_idx = jnp.where(free, g_safe, jnp.int32(F))
    poses = state.poses.at[write_idx].set(res.poses, mode="drop")
    slab_used = jnp.arange(P_BA) < n_active
    pts_write_idx = jnp.where(slab_used, inv[:P_BA], jnp.int32(P))
    points = state.points.at[pts_write_idx].set(res.points, mode="drop")
    new_state = state._replace(poses=poses, points=points)
    return LocalBAResult(new_state, res.chi2_initial, res.chi2_history[-1])
