"""Pallas TPU kernels: fused Q8_0 dequant+matmul, flash attention."""
