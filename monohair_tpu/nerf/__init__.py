"""Coarse geometry: hash-grid NeRF (instant-ngp replacement) — multiresolution
hash encoding, fused MLP, volume rendering, marching-tetrahedra mesh export,
and the NGP/NeRF/MVS pose plumbing."""
