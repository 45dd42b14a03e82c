"""Batched front-end compute ops: feature extraction, matching, multi-view solvers."""
