"""monohair_tpu — a TPU-native (JAX/XLA/Pallas) framework for strand-level 3D hair
reconstruction from monocular video, with the capabilities of MonoHair (CVPR 2024).

The framework re-designs the reference's four-stage CUDA/OpenGL/PyTorch pipeline
(prepare_data -> PMVO -> infer_inner -> HairGrow) as one JAX program:

- ``monohair_tpu.camera``    — batched pinhole/NDC camera math (pure, jittable)
- ``monohair_tpu.coords``    — the NeRF/NGP/MVS/voxel coordinate conventions, centralized
- ``monohair_tpu.io``        — .hair / .mat / camera-JSON / OBJ artifact I/O
- ``monohair_tpu.ops``       — TPU compute kernels (Gabor bank, rasterizer, grid sample, ...)
- ``monohair_tpu.pmvo``      — patch-based multi-view orientation optimization
- ``monohair_tpu.strands``   — strand tracing / connection / smoothing
- ``monohair_tpu.models``    — Flax neural nets (UNet + view-fusion ViT, hash-grid NeRF, SMPL-X)
- ``monohair_tpu.mvs``       — interior occupancy/orientation inference + training
- ``monohair_tpu.pipeline``  — the four stage orchestrators + one-command runner
- ``monohair_tpu.parallel``  — device-mesh sharding helpers

Artifact formats (cam_params.json, Occ3D.mat/Ori3D.mat, raw.npy, *.hair) match the
reference so outputs are directly comparable.
"""

__version__ = "0.1.0"
