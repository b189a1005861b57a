"""Artifact I/O: .hair strand binaries, Occ3D/Ori3D .mat volumes, camera JSON,
OBJ meshes, and the per-view image maps (orientation / confidence / depth / mask).

Formats are byte-compatible with the reference so any stage of either framework
can consume the other's outputs.
"""

from .hair_io import load_hair, save_hair, strands_from_flat, flat_from_strands  # noqa: F401
from .mat_io import load_occ_mat, load_ori_mat, save_occ_ori_mat  # noqa: F401
from .cameras_io import load_cam_params, save_cam_params, subsample_views  # noqa: F401
from .mesh_io import load_obj, save_obj, sample_mesh_surface  # noqa: F401
