"""Training loop for the occupancy/orientation nets.

The reference ships datasets and checkpoints but NOT the trainer (SURVEY.md
§2.4 #27: "Training scripts themselves are not in the repo"). This module fills
the gap: optax Adam over batched point samples, BatchNorm statistics tracked in
`batch_stats`, the occ head trained with cross-entropy and the ori head with
sign-agnostic L1 — the losses declared inside the models (pifu_attn.py:216,331).

Multi-chip: the point batch axis shards over a 1-D mesh (data parallel); the
images/features and parameters replicate. Gradients reduce automatically via
pjit on the sharded loss mean.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models.pifu import OccAttn, OriAttn, mvs_projection


class TrainState(NamedTuple):
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray


def create_state(model, rng, num_views: int, image_size: Tuple[int, int],
                 in_feat: int = 4, lr: float = 1e-4,
                 optimizer: Optional[optax.GradientTransformation] = None
                 ) -> Tuple[TrainState, optax.GradientTransformation]:
    H, W = image_size
    imgs = jnp.zeros((num_views, H, W, in_feat))
    pts = jnp.zeros((8, 3))
    pts_view = jnp.zeros((num_views, 8, 3))
    coord = jnp.zeros((num_views, 8, 2))
    variables = model.init(rng, imgs, pts, pts_view, coord, train=True)
    tx = optimizer or optax.adam(lr)
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    return TrainState(params, stats, tx.init(params), jnp.zeros((), jnp.int32)), tx


def make_train_step(model, tx, is_occ: bool):
    """Returns jittable step(state, imgs, w2c, ndc, pts, targets) -> (state, loss).

    pts are world-space query points; targets are int labels (occ) or unit
    directions (ori).
    """

    def loss_fn(params, batch_stats, imgs, w2c, ndc, pts, targets):
        coord, cam = mvs_projection(w2c, ndc, pts)
        variables = {"params": params, "batch_stats": batch_stats}
        out, mutated = model.apply(
            variables, imgs, pts, cam, coord, train=True,
            mutable=["batch_stats"])
        if is_occ:
            loss = OccAttn.loss(out, targets)
        else:
            out = out / jnp.maximum(jnp.linalg.norm(out, axis=-1, keepdims=True), 1e-12)
            loss = OriAttn.loss(out, targets)
        return loss, mutated["batch_stats"]

    @jax.jit
    def step(state: TrainState, imgs, w2c, ndc, pts, targets):
        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, state.batch_stats, imgs, w2c, ndc, pts, targets)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, new_stats, opt_state, state.step + 1), loss

    return step


def make_eval_step(model, is_occ: bool):
    """Jitted inference step(state, imgs, w2c, ndc, pts, targets) ->
    (loss, outputs) with frozen batch stats (the val columns of the
    reference's stats_{occ,ori}.txt curves)."""

    @jax.jit
    def step(state: TrainState, imgs, w2c, ndc, pts, targets):
        coord, cam = mvs_projection(w2c, ndc, pts)
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        out = model.apply(variables, imgs, pts, cam, coord, train=False)
        if is_occ:
            loss = OccAttn.loss(out, targets)
        else:
            out = out / jnp.maximum(jnp.linalg.norm(out, axis=-1, keepdims=True),
                                    1e-12)
            loss = OriAttn.loss(out, targets)
        return loss, out

    return step


def occ_metrics(logits: jnp.ndarray, labels: jnp.ndarray) -> Dict[str, float]:
    """Precision/recall like OccMetric (Utils/Utils.py:336-363)."""
    pred = np.asarray(logits[:, 1] > logits[:, 0])
    gt = np.asarray(labels) > 0
    tp = float(np.sum(pred & gt))
    precision = tp / max(float(pred.sum()), 1e-6)
    recall = tp / max(float(gt.sum()), 1e-6)
    return {"precision": precision, "recall": recall}
