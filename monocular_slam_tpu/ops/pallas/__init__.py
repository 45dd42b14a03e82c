"""Hand-written Pallas TPU kernels for the hot front-end ops."""
