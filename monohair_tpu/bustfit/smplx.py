"""SMPL-X style linear-blend-skinning body model in JAX.

The reference fits a SMPL-X head/bust through DELTA's torch stack
(multiview_optimization.py:13-20, 343-517). Here the LBS forward is pure
einsum — an ideal XLA/TPU workload — loading the standard SMPL-X .npz asset
when available (the asset itself is an external download, fetch_data.sh).

Formulation (standard SMPL/SMPL-X):
    v_shaped = template + shapedirs . betas + exprdirs . expression
    joints   = J_regressor @ v_shaped
    v_posed  = v_shaped + posedirs . (R(theta) - I)
    verts    = LBS(v_posed, joint transforms, skinning weights)
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class SMPLXModel(NamedTuple):
    v_template: jnp.ndarray     # (V, 3)
    shapedirs: jnp.ndarray      # (V, 3, S)
    posedirs: jnp.ndarray       # (P*9, V*3)  (pose-feature major)
    J_regressor: jnp.ndarray    # (J, V)
    parents: np.ndarray         # (J,) kinematic tree (static)
    lbs_weights: jnp.ndarray    # (V, J)
    faces: np.ndarray           # (F, 3) (static)

    @property
    def num_joints(self) -> int:
        return self.J_regressor.shape[0]

    @property
    def num_betas(self) -> int:
        return self.shapedirs.shape[-1]


def load_smplx_npz(path: str, num_betas: int = 10) -> SMPLXModel:
    """Load the official SMPL-X npz layout."""
    d = np.load(path, allow_pickle=True)
    shapedirs = np.asarray(d["shapedirs"], np.float32)[..., :num_betas]
    posedirs = np.asarray(d["posedirs"], np.float32)
    P = posedirs.shape[-1]
    posedirs = posedirs.reshape(-1, P).T  # (P, V*3)
    return SMPLXModel(
        v_template=jnp.asarray(d["v_template"], jnp.float32),
        shapedirs=jnp.asarray(shapedirs),
        posedirs=jnp.asarray(posedirs.astype(np.float32)),
        J_regressor=jnp.asarray(d["J_regressor"], jnp.float32),
        parents=np.asarray(d["kintree_table"])[0].astype(np.int64),
        lbs_weights=jnp.asarray(d["weights"], jnp.float32),
        faces=np.asarray(d["f"], np.int64),
    )


def rodrigues(rot_vecs: jnp.ndarray) -> jnp.ndarray:
    """(J, 3) axis-angle -> (J, 3, 3) rotation matrices."""
    angle = jnp.linalg.norm(rot_vecs + 1e-12, axis=-1, keepdims=True)
    axis = rot_vecs / angle
    cos = jnp.cos(angle)[..., None]
    sin = jnp.sin(angle)[..., None]
    x, y, z = axis[:, 0], axis[:, 1], axis[:, 2]
    zeros = jnp.zeros_like(x)
    K = jnp.stack([zeros, -z, y, z, zeros, -x, -y, x, zeros], -1).reshape(-1, 3, 3)
    eye = jnp.eye(3)[None]
    return cos * eye + sin * K + (1 - cos) * jnp.einsum("ji,jk->jik", axis, axis)


def lbs_forward(model: SMPLXModel, betas: jnp.ndarray, pose: jnp.ndarray,
                expression: Optional[jnp.ndarray] = None,
                global_transl: Optional[jnp.ndarray] = None
                ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """betas (S,), pose (J, 3) axis-angle -> (vertices (V, 3), joints (J, 3))."""
    v_shaped = model.v_template + jnp.einsum("vcs,s->vc", model.shapedirs, betas)
    if expression is not None:
        # SMPL-X packs expression dirs after shape dirs; callers concatenate
        pass
    joints = jnp.einsum("jv,vc->jc", model.J_regressor, v_shaped,
                        precision="highest")
    rots = rodrigues(pose)                                   # (J, 3, 3)
    pose_feat = (rots[1:] - jnp.eye(3)[None]).reshape(-1)     # ((J-1)*9,)
    n_feat = model.posedirs.shape[0]
    v_posed = v_shaped + (pose_feat[:n_feat] @ model.posedirs).reshape(-1, 3)

    # kinematic chain: world transforms per joint
    J = model.num_joints
    rel = joints - jnp.where(model.parents[:, None] >= 0, joints[model.parents], 0.0)
    transforms = [None] * J
    for j in range(J):  # tree is tiny and static -> unrolled
        T = jnp.eye(4).at[:3, :3].set(rots[j]).at[:3, 3].set(rel[j])
        transforms[j] = T if model.parents[j] < 0 else transforms[model.parents[j]] @ T
    A = jnp.stack(transforms)                                 # (J, 4, 4)
    # remove the rest-pose joint locations
    joints_h = jnp.concatenate([joints, jnp.zeros((J, 1))], -1)
    corr = jnp.einsum("jab,jb->ja", A, joints_h)
    A = A.at[:, :3, 3].add(-corr[:, :3])

    W = model.lbs_weights                                     # (V, J)
    T = jnp.einsum("vj,jab->vab", W, A, precision="highest")
    verts = jnp.einsum("vab,vb->va", T[:, :3, :3], v_posed) + T[:, :3, 3]
    posed_joints = jnp.einsum("jv,vc->jc", model.J_regressor, verts,
                              precision="highest")
    if global_transl is not None:
        verts = verts + global_transl
        posed_joints = posed_joints + global_transl
    return verts, posed_joints


def random_test_model(rng: np.random.Generator, num_verts: int = 64,
                      num_joints: int = 4, num_betas: int = 5) -> SMPLXModel:
    """A tiny synthetic model for unit tests (no external assets); vertices
    centered at the origin so ring-camera fixtures see the whole model."""
    verts = ((rng.random((num_verts, 3)) - 0.5) * 0.4).astype(np.float32)
    parents = np.array([-1] + [j // 2 for j in range(num_joints - 1)])
    Jr = rng.random((num_joints, num_verts)).astype(np.float32)
    Jr /= Jr.sum(-1, keepdims=True)
    W = rng.random((num_verts, num_joints)).astype(np.float32)
    W /= W.sum(-1, keepdims=True)
    return SMPLXModel(
        v_template=jnp.asarray(verts),
        shapedirs=jnp.asarray(rng.normal(size=(num_verts, 3, num_betas))
                              .astype(np.float32) * 0.01),
        posedirs=jnp.asarray(rng.normal(size=((num_joints - 1) * 9, num_verts * 3))
                             .astype(np.float32) * 0.001),
        J_regressor=jnp.asarray(Jr),
        parents=parents,
        lbs_weights=jnp.asarray(W),
        faces=np.zeros((0, 3), np.int64),
    )
