"""Pallas TPU kernels for the hot compute paths (attention, mel frontend)."""
