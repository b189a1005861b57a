"""Hair segmentation and matting (MODNet/CDGNet/face-parsing equivalents)."""
