"""PMVO — Patch-based Multi-View Optimization of the 3D hair orientation field.

TPU-native re-design of the reference PMVO.py: per-view Python loops become a
stacked view axis, the 10-candidate base-view loop becomes a `lax.scan`, the
point axis is chunked/sharded, and all image lookups are batched gathers.
"""

from .solver import PMVOMaps, pmvo_forward, pmvo_refine_loss, filter_points  # noqa: F401
from .driver import optimize_points, refine_and_voxelize  # noqa: F401
