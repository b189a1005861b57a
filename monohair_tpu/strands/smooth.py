"""Batched strand Laplacian smoothing.

The reference smooths one strand at a time by building a sparse (2n, n) system
and calling scipy spsolve per strand per axis (Utils/Utils.py:1148-1198
`smnooth_strand`) — hundreds of thousands of tiny host solves. The normal
equations are (lam^2 * L^T L + pos^2 * I) x = pos^2 * x0 with L the path-graph
Laplacian, an SPD pentadiagonal system with condition <= 1 + 16*lam^2/pos^2,
so a fixed-iteration conjugate gradient converges to machine precision in a few
dozen iterations. Here all strands solve *simultaneously* as (S, N, 3) padded
arrays with per-strand length masks — one fused XLA program.
"""

from __future__ import annotations

from functools import partial
from typing import List

import jax
import jax.numpy as jnp
import numpy as np


def _path_laplacian(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """(S, N, 3) batched L x for the path graph restricted to valid points.

    Row 0: x0 - x1; row n-1: x_{n-1} - x_{n-2}; interior: 2xi - x_{i-1} - x_{i+1}
    (matches the matrix built at Utils/Utils.py:1158-1172). `mask` is (S, N).
    """
    m = mask[..., None]
    xm = x * m
    left = jnp.concatenate([jnp.zeros_like(xm[:, :1]), xm[:, :-1]], 1)
    right = jnp.concatenate([xm[:, 1:], jnp.zeros_like(xm[:, :1])], 1)
    has_left = jnp.concatenate([jnp.zeros_like(mask[:, :1]), mask[:, :-1]], 1)[..., None]
    has_right = jnp.concatenate([mask[:, 1:], jnp.zeros_like(mask[:, :1])], 1)[..., None]
    deg = has_left + has_right
    return (deg * xm - left * has_left - right * has_right) * m


@partial(jax.jit, static_argnames=("iters",))
def smooth_strands_padded(points: jnp.ndarray, lengths: jnp.ndarray,
                          lap_constraint: float = 2.0, pos_constraint: float = 1.0,
                          iters: int = 48) -> jnp.ndarray:
    """Smooth (S, N, 3) padded strands; entries beyond `lengths` pass through.

    Solves (lam^2 L^2 + p^2 I) x = p^2 x0 by CG (L is symmetric: L^T L = L^2).
    """
    S, N, _ = points.shape
    mask = (jnp.arange(N)[None, :] < lengths[:, None]).astype(points.dtype)
    lam2 = lap_constraint * lap_constraint
    p2 = pos_constraint * pos_constraint

    def A(x):
        return lam2 * _path_laplacian(_path_laplacian(x, mask), mask) + p2 * x * mask[..., None]

    b = p2 * points * mask[..., None]
    x = points * mask[..., None]
    r = b - A(x)
    p = r

    def dot(a, c):
        return jnp.sum(a * c, axis=(1, 2), keepdims=True)

    def body(_, carry):
        x, r, p, rs = carry
        Ap = A(p)
        denom = jnp.maximum(dot(p, Ap), 1e-20)
        alpha = rs / denom
        x = x + alpha * p
        r = r - alpha * Ap
        rs_new = dot(r, r)
        beta = rs_new / jnp.maximum(rs, 1e-20)
        return x, r, r + beta * p, rs_new

    x, _, _, _ = jax.lax.fori_loop(0, iters, body, (x, r, p, dot(r, r)))
    return jnp.where(mask[..., None] > 0, x, points)


def smooth_strand_list(strands: List[np.ndarray], lap_constraint: float = 2.0,
                       pos_constraint: float = 1.0, fix_tips: bool = False,
                       bucket: int = 64) -> List[np.ndarray]:
    """Smooth a host list of variable-length strands.

    Strands are padded to length buckets (multiples of `bucket`) so only a few
    program shapes compile. Mirror of smooth_strands (Utils/Utils.py:1191-1198).
    """
    if not strands:
        return strands
    lens = np.array([s.shape[0] for s in strands])
    order = np.argsort(lens)
    out: List[np.ndarray] = [None] * len(strands)
    # group by padded bucket size
    padded_sizes = np.maximum(((lens + bucket - 1) // bucket) * bucket, bucket)
    for size in np.unique(padded_sizes):
        idx = np.nonzero(padded_sizes == size)[0]
        batch = np.zeros((len(idx), size, 3), np.float32)
        for j, i in enumerate(idx):
            batch[j, :lens[i]] = strands[i]
        sm = np.asarray(smooth_strands_padded(jnp.asarray(batch),
                                              jnp.asarray(lens[idx]),
                                              lap_constraint, pos_constraint))
        for j, i in enumerate(idx):
            s = sm[j, :lens[i]].copy()
            if fix_tips and lens[i] > 2:
                s[0] = strands[i][0]
                s[-1] = strands[i][-1]
            out[i] = s
    del order
    return out
