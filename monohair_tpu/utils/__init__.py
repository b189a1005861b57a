"""Quality metrics and evaluation helpers."""

from .metrics import OccMetric, direction_cosine_error, psnr, ssim  # noqa: F401
