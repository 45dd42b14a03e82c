"""Shared utilities: precision policy, profiling, snapshots."""

from monocular_slam_tpu.utils.precision import HIGHEST, einsum_hp, matmul_hp  # noqa: F401
