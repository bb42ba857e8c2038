"""Pallas TPU kernels for the hot render ops."""
