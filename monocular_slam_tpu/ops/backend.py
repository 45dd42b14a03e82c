"""Trace-time backend detection for kernel-path selection.

Pallas kernels (fused FAST score+NMS, Hamming top-2 matcher) are the default
compute path on TPU; CPU (tests, virtual-device meshes) uses the pure-XLA
formulations, which are bit-compatible (equality-tested in
tests/test_pallas_kernels.py)."""

from __future__ import annotations

import jax


def is_tpu() -> bool:
    """True when the default backend is a TPU (incl. the 'axon' remote TPU
    platform used by this container's tunnel)."""
    try:
        return jax.default_backend() not in ("cpu", "gpu")
    except Exception:
        return False
