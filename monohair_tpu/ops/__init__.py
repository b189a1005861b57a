"""TPU compute kernels: Gabor orientation bank, z-buffer rasterization, bilinear
grid sampling, voxelization, 3D pooling, strand smoothing."""
