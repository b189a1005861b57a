"""Interior inference (DeepMVSHair equivalent): occupancy + orientation
implicit nets evaluated over dense query grids, plus the training loop the
reference omits."""

from .eval import MVSInputs, deep_mvs_eval, eval_points  # noqa: F401
