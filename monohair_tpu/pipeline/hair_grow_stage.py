"""Stage 4 — strand generation (reference HairGrow.py main :876-976)."""

from __future__ import annotations

import os
import time
from typing import List

import numpy as np

from ..config import Config
from ..constants import BUST_TO_ORIGIN, VOXEL_MIN, VOXEL_SIZE
from ..coords import voxel_to_world, world_to_voxel
from ..io.hair_io import load_hair, save_hair, strands_from_flat
from ..io.mat_io import load_occ_mat, load_ori_mat
from ..io.mesh_io import load_obj, sample_mesh_surface
from ..strands.connect import connect_all_segments, connect_to_scalp
from ..strands.smooth import smooth_strand_list
from ..strands.trace import generate_guide_and_segments


def _voxel_strands_to_world(strands: List[np.ndarray]) -> List[np.ndarray]:
    return [np.asarray(voxel_to_world(s)) - BUST_TO_ORIGIN for s in strands]


def _world_strands_to_voxel(strands: List[np.ndarray]) -> List[np.ndarray]:
    return [np.asarray(world_to_voxel(s + BUST_TO_ORIGIN)) for s in strands]


def run_hair_grow(args: Config) -> None:
    t0 = time.monotonic()
    root = args.data.root
    save_path = os.path.join(args.output_path,
                             "full" if args.PMVO.infer_inner else "refine")
    want_diffusion = bool(args.get("scalp_diffusion"))
    have_diffusion = os.path.exists(os.path.join(save_path, "Occ3D_diffusion.mat"))
    suffix = "_diffusion" if (want_diffusion and have_diffusion) else ""
    occ = load_occ_mat(os.path.join(save_path, f"Occ3D{suffix}.mat"))
    ori_world = load_ori_mat(os.path.join(save_path, f"Ori3D{suffix}.mat"))
    ori_voxel = ori_world * np.array([1, -1, -1], np.float32)  # HairGrow.py:55-56

    # 60k scalp seeds in voxel space (HairGrow.py:880-900)
    scalp_v, scalp_f = load_obj(os.path.join(root, args.data.scalp_path))
    sp, sn = sample_mesh_surface(scalp_v, scalp_f, 60000,
                                 np.random.default_rng(args.get("seed", 0) or 0))
    sp = sp + BUST_TO_ORIGIN
    sp_vox = np.asarray(world_to_voxel(sp.astype(np.float32)))
    sn = sn / np.maximum(np.linalg.norm(sn, axis=-1, keepdims=True), 1e-12)
    sn_vox = (sn * np.array([1, -1, -1])).astype(np.float32)

    if want_diffusion and not have_diffusion:
        # extend the field from the scalp through empty shells
        # (diffusion_scalp, PMVO_utils.py:467-593), persist like the reference
        # (HairGrow.py:859-871 reads the _diffusion suffix)
        import jax.numpy as jnp
        from ..io.mat_io import save_occ_ori_mat
        from ..strands.scalp_diffusion import diffuse_scalp
        new_ori_v, new_occ = diffuse_scalp(jnp.asarray(occ), jnp.asarray(ori_voxel),
                                           jnp.asarray(sp_vox), jnp.asarray(sn_vox))
        occ = np.asarray(new_occ)
        ori_voxel = np.asarray(new_ori_v)
        save_occ_ori_mat(save_path, occ,
                         ori_voxel * np.array([1, -1, -1], np.float32),
                         suffix="_diffusion")

    hg = args.HairGenerate
    if hg.generate_segments:
        strands, num_root = generate_guide_and_segments(
            occ, ori_voxel, sp_vox, sn_vox, hg.grow_threshold)
        world = _voxel_strands_to_world(strands)
        save_hair(os.path.join(save_path, "scalp_segment.hair"), world)
        smooth = smooth_strand_list(world, 4.0, 2.0)
        save_hair(os.path.join(save_path, "scalp_segment_smooth.hair"), smooth)
        np.save(os.path.join(save_path, "num_root.npy"), np.array(num_root))
    else:
        num_root = int(np.load(os.path.join(save_path, "num_root.npy")))

    if hg.connect_segments:
        segments, points = load_hair(os.path.join(save_path, "scalp_segment.hair"))
        strands = strands_from_flat(segments, points)
        # free segments connect in bust-origin world frame (HairGrow.py:925-936)
        free = [s + BUST_TO_ORIGIN for s in strands[num_root:]]
        connected = connect_all_segments(
            free, occ, ori_voxel, hg.connect_threshold, hg.connect_dot_threshold,
            VOXEL_MIN, VOXEL_SIZE)
        new_strands = list(strands[:num_root]) + [s - BUST_TO_ORIGIN for s in connected]
        new_strands = smooth_strand_list(new_strands, 4.0, 2.0)
        save_hair(os.path.join(save_path, "strands.hair"), new_strands)

    if hg.connect_scalp:
        segments, points = load_hair(os.path.join(save_path, "strands.hair"))
        strands = _world_strands_to_voxel(strands_from_flat(segments, points))
        attached = connect_to_scalp(strands, num_root, occ, ori_voxel,
                                    out_ratio_threshold=hg.out_ratio)
        world = _voxel_strands_to_world([np.asarray(s) for s in attached])
        world = smooth_strand_list(world, 4.0, 2.0)
        save_hair(os.path.join(save_path, "connected_strands.hair"), world)
    print(f"[hair_grow] done in {time.monotonic() - t0:.1f}s")
