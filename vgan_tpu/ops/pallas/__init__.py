"""Fused Pallas TPU kernels (block-tiled MMD Gram with custom VJP)."""
