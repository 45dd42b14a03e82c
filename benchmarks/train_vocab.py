"""Train and evaluate the bundled vocabulary (VERDICT r03 #6).

DBoW2's shipped ORB vocabulary is k=10, L=5 (1e5 words,
`TemplatedVocabulary.h:55-57`); the r03 bundle was k=10, L=3 (1e3 words) —
two orders less discriminative. This trains k=10, L=4 (1e4 words) on a
diverse multi-scene rendered corpus, evaluates place-recognition
precision/recall on DISJOINT scenes against the old shape, and replaces
`retrieval/default_vocab.npz`.

    python benchmarks/train_vocab.py [--train-scenes 6] [--eval-scenes 4]

Writes benchmarks/vocab_eval_<platform>.json and (with --save) the bundle.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--train-scenes", type=int, default=6)
    ap.add_argument("--frames-per-scene", type=int, default=24)
    ap.add_argument("--eval-scenes", type=int, default=4)
    ap.add_argument("--save", action="store_true")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from monocular_slam_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    from functools import partial

    from monocular_slam_tpu.datasets import render
    from monocular_slam_tpu.ops import features as features_mod
    from monocular_slam_tpu.retrieval import vocabulary as vocab_mod

    dev = jax.devices()[0]
    print("device:", dev, file=sys.stderr)
    wh = (640, 480)
    extract = jax.jit(partial(features_mod.extract, n_features=1000))

    def scene_descs(key, n_frames, ang_step=0.12):
        imgs, poses, k = render.render_sequence(
            key, n_frames=n_frames, wh=wh, ang_step=ang_step
        )
        out = []
        for im in imgs:
            f = extract(jnp.asarray(im, jnp.float32))
            out.append(np.asarray(f.desc_pm1)[np.asarray(f.valid)])
        return out

    # --- training corpus: diverse scenes (distinct texture keys) ------------
    t0 = time.perf_counter()
    train_descs = []
    for s in range(args.train_scenes):
        ds = scene_descs(jax.random.PRNGKey(100 + s), args.frames_per_scene)
        train_descs.extend(ds)
        print(f"  scene {s}: {sum(len(d) for d in ds)} descriptors",
              file=sys.stderr)
    corpus = np.concatenate(train_descs)
    print(f"corpus: {len(corpus)} descriptors "
          f"({time.perf_counter() - t0:.0f}s)", file=sys.stderr)

    results = {}
    vocs = {}
    for name, (k, L) in {"1k (r03 shape)": (10, 3), "10k": (10, 4)}.items():
        t0 = time.perf_counter()
        voc = vocab_mod.train(corpus, k=k, L=L, seed=0)
        vocs[name] = voc
        print(f"trained {name}: {voc.n_words} words in "
              f"{time.perf_counter() - t0:.0f}s", file=sys.stderr)

    # --- evaluation: disjoint scenes, revisit retrieval ---------------------
    # DB = frames 0..n/2 of each eval scene; queries = frames n/2..n, whose
    # ground-truth match is the SAME scene's frame at (i - n/2) (the orbit's
    # ang_step makes query q revisit db frame q - n/2 exactly after a full
    # circle: we use a 2-revolution orbit).
    n_eval = 52  # 2 revolutions at 0.2419 rad/frame (26 frames/rev)
    ang = 2 * np.pi / 26
    eval_feats = []
    for s in range(args.eval_scenes):
        imgs, poses, k = render.render_sequence(
            jax.random.PRNGKey(900 + s), n_frames=n_eval, wh=wh, ang_step=ang
        )
        fr = []
        for im in imgs:
            f = extract(jnp.asarray(im, jnp.float32))
            fr.append((np.asarray(f.desc_pm1), np.asarray(f.valid)))
        eval_feats.append(fr)
        print(f"  eval scene {s} rendered", file=sys.stderr)

    half = n_eval // 2
    for name, voc in vocs.items():
        bow = jax.jit(lambda d, v, _voc=voc: vocab_mod.bow_vector(_voc, d, v))
        # database: first revolution of every scene
        db, db_ids = [], []
        for s, fr in enumerate(eval_feats):
            for i in range(half):
                db.append(np.asarray(bow(jnp.asarray(fr[i][0]), jnp.asarray(fr[i][1]))))
                db_ids.append((s, i))
        db = np.stack(db)
        hits = total = 0
        margins = []
        correct_scores, floor_scores = [], []
        for s, fr in enumerate(eval_feats):
            for q in range(half, n_eval):
                qv = np.asarray(bow(jnp.asarray(fr[q][0]), jnp.asarray(fr[q][1])))
                scores = 1.0 - 0.5 * np.abs(db - qv[None]).sum(axis=1)  # L1
                best = int(scores.argmax())
                bs, bi = db_ids[best]
                want = q - half  # same-scene frame one revolution earlier
                ok = (bs == s) and (abs(bi - want) <= 2 or abs(bi - want) >= 24)
                hits += ok
                total += 1
                floor = float(np.median(scores))
                margins.append(float(scores[best]) - floor)
                (correct_scores if ok else floor_scores).append(float(scores[best]))
        results[name] = {
            "words": int(voc.n_words),
            "top1_recall": round(hits / total, 4),
            "median_margin": round(float(np.median(margins)), 4),
            "n_queries": total,
        }
        print(name, results[name], file=sys.stderr)

    out = {
        "device": str(dev),
        "train_descriptors": int(len(corpus)),
        "train_scenes": args.train_scenes,
        "eval_scenes": args.eval_scenes,
        "protocol": (
            "DB = first revolution of each DISJOINT eval scene; query = "
            "second revolution; top-1 correct iff same scene and within 2 "
            "frames of the revisited view. margin = best minus median score "
            "(what the detector's consistency gate sees)."
        ),
        "results": results,
    }
    print(json.dumps(out))
    path = f"benchmarks/vocab_eval_{dev.platform}.json"
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", path, file=sys.stderr)

    if args.save:
        dst = os.path.join(
            os.path.dirname(os.path.abspath(vocab_mod.__file__)),
            "default_vocab.npz",
        )
        vocab_mod.save(dst, vocs["10k"])
        print("saved bundle:", dst, file=sys.stderr)


if __name__ == "__main__":
    main()
