"""Benchmark scripts (runnable standalone; importable for their analytic models)."""
