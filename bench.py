"""Benchmark: frames/sec of the full tracking + windowed-local-BA step on the
current default JAX device (real TPU under the driver).

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N, ...}

Baseline note: the C++ reference publishes no numbers (BASELINE.md) and its
2013-era dependency stack (OpenCV 2.4 nonfree, PCL, boost) cannot be built in
this image, so the denominator is a documented estimate: ~10 fps for
single-threaded C++ ORB tracking with per-frame pose refinement on a modern
x86 core (its per-frame global BA mode is far slower, O(T^2) over the run —
SURVEY.md 5.7). vs_baseline = fps / 10.
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp

REFERENCE_FPS_ESTIMATE = 10.0


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    from monocular_slam_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    from monocular_slam_tpu.datasets import synthetic
    from monocular_slam_tpu.slam import local_ba, tracker
    from monocular_slam_tpu.slam.config import FrontendConfig, SlamConfig
    from monocular_slam_tpu.slam.session import SlamSession

    dev = jax.devices()[0]
    log("device:", dev)

    # Reference-scale workload: 1000 features/frame, 5-frame back-traverse,
    # 8-frame local BA window (reference processes 100 frames @ ~1000 ORB
    # features, `src/main.cpp:35`, OpenCV ORB defaults).
    n_feat = 1000
    cfg = SlamConfig(
        max_frames=64, max_points=20000, frontend=FrontendConfig(n_features=n_feat)
    )
    seq = synthetic.feature_sequence(
        jax.random.PRNGKey(0),
        n_frames=40,
        n_world_points=2500,
        n_features=n_feat,
        pix_noise=0.3,
        drop_prob=0.08,
    )
    sess = SlamSession(cfg, seed=1, run_ba=True)
    t0 = time.perf_counter()
    tracked = 0
    for i, f in enumerate(seq.frames):
        st = sess.add_frame_features(f, seq.k, seq.timestamps[i])
        tracked += int(st.tracked)
    log(f"warmup+compile: {time.perf_counter() - t0:.1f}s, tracked {tracked}/40")

    # Steady-state: one fused frame step (track + local BA), timed over
    # repeated calls with a single final block (avoids per-call host sync).
    @jax.jit
    def frame_step(state, i, key):
        tres = tracker.track(state, i, key, cfg)
        bres = local_ba.local_bundle_adjust(tres.state, i, cfg)
        return bres.state

    state = sess.state
    key = jax.random.PRNGKey(7)
    i = jnp.asarray(39, jnp.int32)
    # compile
    out = frame_step(state, i, key)
    jax.block_until_ready(out.poses)

    n_rep = 30
    t0 = time.perf_counter()
    cur = state
    for r in range(n_rep):
        cur = frame_step(cur, i, jax.random.fold_in(key, r))
    jax.block_until_ready(cur.poses)
    dt = (time.perf_counter() - t0) / n_rep
    fps = 1.0 / dt

    # ATE sanity on the warmup run
    import numpy as np

    from monocular_slam_tpu.eval import ate

    poses, valid, _ = sess.trajectory()
    r = ate.ate(poses[valid], np.asarray(seq.poses_gt)[valid])
    log(f"per-frame {dt * 1e3:.1f} ms -> {fps:.1f} fps; ATE {r.rmse * 1e3:.2f} mm")

    print(
        json.dumps(
            {
                "metric": "frames/sec (tracking+local BA, 1000 feat/frame)",
                "value": round(fps, 2),
                "unit": "fps",
                "vs_baseline": round(fps / REFERENCE_FPS_ESTIMATE, 2),
                "ate_mm": round(r.rmse * 1e3, 3),
                "tracked": f"{int(valid.sum())}/{len(valid)}",
                "device": str(dev),
            }
        )
    )


if __name__ == "__main__":
    main()
