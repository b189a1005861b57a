"""Albedo texture PCA + spherical-harmonic shading for the bust-fit
image/albedo losses.

The reference evaluates DELTA's FLAMETex — a PCA over a 512x512 UV albedo map —
and renders it with SRenderY under 9-coefficient SH lighting
(multiview_optimization.py:391, 594-614; loss use at :691-694). A UV-space
texture needs per-pixel UV rasterization; the TPU-native equivalent keeps the
same optimization surface (n_tex PCA coefficients -> albedo, 9x3 SH -> shading)
but parameterizes albedo *per vertex*, which soft_raster interpolates
barycentrically. The PCA asset is loadable from an npz (mean (V,3),
basis (V,3,T)); absent the licensed asset a neutral gray mean is used so the
optimization path stays exercised end-to-end.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp
import numpy as np


class FlameTex(NamedTuple):
    mean: jnp.ndarray    # (V, 3) linear albedo
    basis: jnp.ndarray   # (V, 3, T)

    @property
    def n_tex(self) -> int:
        return self.basis.shape[-1]


def load_flame_tex(path: Optional[str], num_verts: int, n_tex: int = 50
                   ) -> FlameTex:
    if path is not None:
        d = np.load(path)
        return FlameTex(jnp.asarray(d["mean"], jnp.float32),
                        jnp.asarray(d["basis"], jnp.float32)[..., :n_tex])
    return FlameTex(jnp.full((num_verts, 3), 0.5, jnp.float32),
                    jnp.zeros((num_verts, 3, n_tex), jnp.float32))


def albedo_from_tex(tex_model: FlameTex, tex: jnp.ndarray) -> jnp.ndarray:
    """tex (T,) PCA coefficients -> (V, 3) per-vertex albedo, clipped to [0,1]
    (FLAMETex forward semantics: mean + basis @ params)."""
    a = tex_model.mean + jnp.einsum("vct,t->vc", tex_model.basis, tex)
    return jnp.clip(a, 0.0, 1.0)


# SRenderY's SH constant factors (DELTA decalib/utils/renderer add_SHlight),
# band-0/1/2 real SH under the common graphics normalization.
_SH_CONST = np.array([
    1.0 / np.sqrt(4 * np.pi),
    (2 * np.pi / 3) * np.sqrt(3 / (4 * np.pi)),
    (2 * np.pi / 3) * np.sqrt(3 / (4 * np.pi)),
    (2 * np.pi / 3) * np.sqrt(3 / (4 * np.pi)),
    (np.pi / 4) * 3 * np.sqrt(5 / (12 * np.pi)),
    (np.pi / 4) * 3 * np.sqrt(5 / (12 * np.pi)),
    (np.pi / 4) * 3 * np.sqrt(5 / (12 * np.pi)),
    (np.pi / 4) * 1.5 * np.sqrt(5 / (12 * np.pi)),
    (np.pi / 4) * 0.5 * np.sqrt(5 / (4 * np.pi)),
], dtype=np.float32)


def sh_shading(normals: jnp.ndarray, sh_coeff: jnp.ndarray) -> jnp.ndarray:
    """9-term SH irradiance per vertex. normals (V, 3), sh_coeff (9, 3) ->
    (V, 3) shading (the SRenderY basis ordering: 1, x, y, z, xy, xz, yz,
    x^2-y^2, 3z^2-1)."""
    x, y, z = normals[:, 0], normals[:, 1], normals[:, 2]
    one = jnp.ones_like(x)
    sh = jnp.stack([one, x, y, z, x * y, x * z, y * z,
                    x ** 2 - y ** 2, 3 * z ** 2 - 1], -1)   # (V, 9)
    sh = sh * jnp.asarray(_SH_CONST)
    return jnp.einsum("vn,nc->vc", sh, sh_coeff)


def shaded_vertex_colors(albedo: jnp.ndarray, normals: jnp.ndarray,
                         sh_coeff: jnp.ndarray) -> jnp.ndarray:
    """albedo (V,3) x SH shading -> (V, 3) linear colors (SRenderY
    images = albedo_images * shading_images)."""
    return albedo * sh_shading(normals, sh_coeff)
