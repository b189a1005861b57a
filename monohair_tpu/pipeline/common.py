"""Shared stage plumbing: config resolution, map/camera/bust loading."""

from __future__ import annotations

import os
from typing import List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ..config import Config, parse_arguments, save_options_file, set_options
from ..constants import BUST_TO_ORIGIN
from ..io.cameras_io import load_cam_params, subsample_views
from ..io.image_io import (load_depth_maps, load_masks,
                           load_orientation_and_confidence)
from ..io.mesh_io import load_obj
from ..pmvo.solver import PMVOMaps


def resolve_config(argv: List[str]) -> Config:
    """CLI -> resolved config with the reference's path conventions
    (PMVO.py:767-800 config_parser)."""
    opt_cmd = parse_arguments(argv)
    # strict: a typo'd CLI key raises instead of being silently accepted
    # (the reference prompts interactively, options.py:86-93 — batch jobs
    # can't answer prompts, so failing fast is the non-interactive analogue)
    args = set_options(opt_cmd, allow_new=False)
    args["output_path"] = os.path.join(args.data.root, args.data.case,
                                       args.get("output_root", "output"),
                                       str(args.get("name", "run")))
    os.makedirs(args["output_path"], exist_ok=True)
    save_options_file(args)
    args.data["root"] = os.path.join(args.data.root, args.data.case)
    return args


def load_pmvo_maps(args: Config) -> Tuple[PMVOMaps, List[str]]:
    """Stack per-view depth/ori/conf/mask into a PMVOMaps (PMVO.py:823-834)."""
    root = args.data.root
    cam_path = os.path.join(root, args.image_camera_path)
    names, cams = load_cam_params(cam_path)
    names, cams = subsample_views(names, cams, os.path.join(root, "capture_images"))
    ori, conf = load_orientation_and_confidence(
        names, os.path.join(root, args.data.Ori2D_path),
        os.path.join(root, args.data.Conf_path))
    depth = load_depth_maps(names, os.path.join(root, args.data.depth_path))
    mask = load_masks(names, os.path.join(root, args.data.mask_path))
    maps = PMVOMaps(cams, jnp.asarray(depth), jnp.asarray(ori),
                    jnp.asarray(conf), jnp.asarray(mask))
    return maps, names


def load_bust_and_scalp(args: Config) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Bust vertices and scalp vertices shifted to origin (PMVO.py:811-820).
    Returns (bust_vertices, scalp_vertices, bust_faces)."""
    root = args.data.root
    bust_v, bust_f = load_obj(os.path.join(root, args.data.bust_path))
    bust_v = bust_v + BUST_TO_ORIGIN
    scalp_v, _ = load_obj(os.path.join(root, "ours/scalp_tsfm.obj"))
    scalp_v = scalp_v + BUST_TO_ORIGIN
    return bust_v, scalp_v, bust_f
