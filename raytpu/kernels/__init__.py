"""Pallas TPU kernels — the hot path.

The reference's L0 HLSL kernel layer (SURVEY.md §1) rebuilt as Mosaic
-compiled TPU kernels: raygen + intersection + scatter + bounce loop fused
into one megakernel over (8, 128) pixel tiles (raytpu/kernels/megakernel.py).
"""
