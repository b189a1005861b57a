"""Flax neural networks: pixel-aligned UNet backbone, view-fusion ViT,
occupancy/orientation implicit heads, hash-grid NeRF, SMPL-X body model."""

from .unet import UNetSimple  # noqa: F401
from .vit import OccViT  # noqa: F401
from .pifu import OccAttn, OriAttn, positional_encoding  # noqa: F401
