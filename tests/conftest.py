"""Test configuration: force CPU with 8 virtual devices so multi-chip sharding
paths are exercised without TPU hardware, and enable x64 for numerical oracles.

The container's sitecustomize registers a remote-TPU ("axon") PJRT plugin in
every interpreter and forces ``jax_platforms="axon,cpu"`` via jax.config —
plain env vars are NOT enough to keep tests off the (slow, tunneled) TPU.
We override the jax config again here, before any backend is initialized.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

assert jax.devices()[0].platform == "cpu", "tests must run on CPU"
assert jax.device_count() == 8, "expected 8 virtual CPU devices for sharding tests"

from monocular_slam_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()
