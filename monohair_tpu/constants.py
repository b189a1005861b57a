"""Central constants for the MonoHair coordinate conventions.

The reference scatters these literals across >=6 files (e.g. Render_utils.py:312,
EvalDataset.py:15-17, Utils/Utils.py:1097, PMVO.py:695-700, HairGrow.py:22-36).
Here they live in exactly one place, with the axis conventions documented.

Coordinate frames
-----------------
world (MVS)   : the frame of cam_params.json poses and all meshes after adding
                BUST_TO_ORIGIN. y is "up" for the head; strands grow mostly -y.
voxel         : grid-index space of the Occ/Ori volumes. The world->voxel map
                *negates y and z* then offsets/scales:
                    v = ((x, -y, -z) - VOXEL_MIN) / VOXEL_SIZE
                (reference: PMVO_utils.py:386-421, HairGrow.py:22-36)
camera        : OpenGL-style; z is negative in front of the camera. Normalized
                depth stored in depth maps is (-z_cam)/2, scaled by 255 on disk.
"""

import numpy as np

# Translation applied to every mesh/point artifact to move the fitted bust to the
# origin (reference: configs/reconstruct/base.yaml `bust_to_origin`).
BUST_TO_ORIGIN = np.array([0.006, -1.644, 0.010], dtype=np.float32)

# Axis-aligned bounding box of the reconstruction volume, in *voxel frame* (after
# the y/z negation). reference: PMVO.py:699, EvalDataset.py:15-16.
VOXEL_MIN = np.array([-0.32, -0.32, -0.24], dtype=np.float32)
VOXEL_MAX = np.array([0.32, 0.32, 0.24], dtype=np.float32)

# Coarse voxel size (MVS sampling) and the fine grid used for Occ3D/Ori3D.
VSIZE_COARSE = 0.005                      # reference: base.yaml `vsize`
VOXEL_SIZE = 0.005 / 2                    # reference: PMVO.py:700
GRID_RESOLUTION = np.array([256, 256, 192], dtype=np.int32)   # PMVO.py:695

# OpenGL projection near/far planes baked into the NDC projection matrix
# (reference: Camera_utils.py:20-27).
Z_NEAR = 0.1
Z_FAR = 100.0

# Depth maps store depth_norm = (-z_cam) / DEPTH_RANGE, scaled by 255 on disk
# (reference: Render_utils.py GLSL `depth_range = 2.0f`, PMVO.py:121,311-313).
DEPTH_RANGE = 2.0
DEPTH_SCALE = 255.0

# Number of depth candidates per point in the PMVO line search
# (reference: PMVO.py:263 `num_sample = 90`).
PMVO_NUM_DEPTH_SAMPLES = 90

# Gabor orientation bank size (reference: GaborFilter.py:23 `numKernels = 180`).
GABOR_NUM_ORIENTATIONS = 180
