"""Levenberg-Marquardt optimization engine: pose-only / local / global BA, pose graph."""
