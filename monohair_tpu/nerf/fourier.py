"""Fourier-feature MLP field — the gather-free, MXU-bound coarse-geometry
NeRF.

Why this exists: BOTH instant-ngp's hash encode and our dense-grid encode
(dense_grid.py) are per-sample table lookups, and XLA TPU gathers/scatters
run at a fixed ~120M rows/s regardless of layout (measured; CLAUDE.md). At
the pipeline's 262k samples/step that caps ANY grid field near ~15 steps/s —
and the encode's backward scatter-add is exactly the kernel family implicated
in the axon worker faults (platform_limits.py). This field removes the table
entirely: a random Fourier feature map (Tancik et al., "Fourier Features Let
Networks Learn High Frequency Functions", NeurIPS 2020 — fixed Gaussian
B matrix) followed by a wide MLP. Every op is a matmul or elementwise — the
step is MXU/VPU-bound, ~100 GFLOP at 262k samples, so the v5e turns it into
milliseconds where the grid encode took ~150 ms of latency-bound rows.

Convergence: vanilla-NeRF-slow in general, but the pipeline only needs
COARSE geometry (a 256^3 density export for marching cubes + 16 clean view
renders — reference run.py:181,272-305 trains 35k steps for this). The
per-step speedup (>20x) buys far more steps/second than the grid's better
per-step convergence buys steps — measured PSNR-vs-wallclock wins
(tools/validate_nerf.py --field fourier).

Same API as NGPField/DenseGridField (density/__call__), so train/render/
export paths are shared. Replaces: instant-ngp testbed (reference
run.py:24-26,91,184-206) together with nerf/train.py.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .ngp import sh_encoding_deg4


class FourierField(nn.Module):
    """Random-Fourier-feature MLP with the NGPField head layout.

    num_features Gaussian frequencies at scale `freq_scale` (in cycles over
    the unit cube — 16 reaches ~voxel-64 detail, plenty for a head's coarse
    mesh); trunk `depth` x `hidden` with one skip, then the shared
    sigma/color heads (sigma 1+geo_feat; color on SH(dir) ++ geo_feat).
    """
    num_features: int = 128
    freq_scale: float = 16.0
    hidden: int = 128
    depth: int = 4
    geo_feat: int = 15
    # density sparsity prior weight, read by train_nerf: Fourier features are
    # a GLOBAL basis, so photometric-only training leaks density into
    # never-observed space (cube corners no ray traverses) — measured surface
    # precision 0.27 -> 0.02 between 1k and 8k steps while PSNR rose to 35 dB.
    # A mean(1-exp(-0.05 sigma)) penalty at 4096 uniform points/step is the
    # only gradient there and pushes fog to zero; grid fields update locally
    # and don't need it.
    sparsity_weight: float = 1e-3

    def setup(self):
        # fixed (non-trained) Gaussian frequency matrix, like the paper;
        # a deterministic key so checkpoints are portable
        b = jax.random.normal(jax.random.PRNGKey(11), (3, self.num_features))
        self.B = jnp.asarray(b * self.freq_scale, jnp.float32)
        self.trunk = [nn.Dense(self.hidden) for _ in range(self.depth)]
        self.skip = nn.Dense(self.hidden, use_bias=False)
        self.sigma_head = nn.Dense(1 + self.geo_feat)
        self.rgb1 = nn.Dense(self.hidden // 2)
        self.rgb2 = nn.Dense(3)

    def flops_per_sample(self) -> float:
        """Analytic forward FLOPs per point sample (both heads) — used by
        bench.py's roofline accounting (backward ~= 2x forward)."""
        enc = 2 * self.num_features
        f = 2 * 3 * self.num_features                    # feature matmul
        f += 2 * enc * self.hidden                       # trunk[0]
        f += 2 * (self.depth - 1) * self.hidden ** 2     # trunk[1:]
        f += 2 * enc * self.hidden                       # skip
        f += 2 * self.hidden * (1 + self.geo_feat)       # sigma head
        f += 2 * (16 + self.geo_feat) * (self.hidden // 2)  # rgb1 (SH deg4)
        f += 2 * (self.hidden // 2) * 3                  # rgb2
        return float(f)

    def _features(self, points01: jnp.ndarray) -> jnp.ndarray:
        # points01 in [0,1]^3 -> (N, 2*num_features) in bf16-friendly range
        ang = (2.0 * jnp.pi) * (points01 @ self.B)
        return jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], -1)

    def density(self, points01: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        enc = self._features(points01)
        h = nn.relu(self.trunk[0](enc))
        for i, layer in enumerate(self.trunk[1:]):
            h = nn.relu(layer(h))
            if i == 0 and self.depth > 2:     # one skip keeps gradients alive
                h = h + self.skip(enc)
        h = self.sigma_head(h)
        sigma = jnp.exp(jnp.clip(h[:, 0], -15.0, 12.0))
        return sigma, h[:, 1:]

    def __call__(self, points01: jnp.ndarray, dirs: jnp.ndarray
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        sigma, feat = self.density(points01)
        d = sh_encoding_deg4(dirs)
        h = nn.relu(self.rgb1(jnp.concatenate([d, feat], -1)))
        rgb = nn.sigmoid(self.rgb2(h))
        return sigma, rgb
