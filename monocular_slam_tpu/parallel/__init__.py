"""Multi-device distribution: mesh construction and sharded bundle adjustment."""
