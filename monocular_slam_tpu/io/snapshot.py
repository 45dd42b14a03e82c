"""SlamState snapshot save/restore (npz).

First-class checkpoint/resume — the reference's de-facto serialization was a
custom CSV format (`Util::loadFrames`/`loadMapPoints`, `src/Util.cpp:384-612`)
used both as fixtures for the g2o golden test and as an interchange format
with ORB-SLAM exports. Snapshots here serve the same two roles: golden-file
BA regression fixtures (SURVEY.md 4) and session checkpointing.
"""

from __future__ import annotations

import numpy as np

from monocular_slam_tpu.slam.state import SlamState

_FIELDS = SlamState._fields


def save_state(path: str, state: SlamState) -> None:
    np.savez_compressed(path, **{f: np.asarray(getattr(state, f)) for f in _FIELDS})


def load_state(path: str) -> SlamState:
    import jax.numpy as jnp

    data = np.load(path)
    return SlamState(**{f: jnp.asarray(data[f]) for f in _FIELDS})


def save_ba_problem(path: str, prob) -> None:
    """Serialize a BAProblem (golden-fixture format for optim tests)."""
    np.savez_compressed(path, **{f: np.asarray(getattr(prob, f)) for f in prob._fields})


def load_ba_problem(path: str):
    import jax.numpy as jnp

    from monocular_slam_tpu.optim.ba import BAProblem

    data = np.load(path)
    return BAProblem(**{f: jnp.asarray(data[f]) for f in BAProblem._fields})
