"""Pallas TPU kernels for hot compute paths."""
