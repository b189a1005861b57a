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
    # (V, 3, E) expression basis; None = no expression space. (The default is
    # None, not an empty jnp array: building a jax array at import time would
    # initialize the device platform before CLIs/conftest can pin CPU.)
    expr_dirs: Optional[jnp.ndarray] = None

    @property
    def num_joints(self) -> int:
        return self.J_regressor.shape[0]

    @property
    def num_betas(self) -> int:
        return self.shapedirs.shape[-1]

    @property
    def num_expr(self) -> int:
        return 0 if self.expr_dirs is None else self.expr_dirs.shape[-1]


def load_smplx_npz(path: str, num_betas: int = 10, num_expr: int = 10
                   ) -> SMPLXModel:
    """Load the official SMPL-X npz layout. SMPL-X packs expression dirs after
    the 300 shape components of `shapedirs` (smplx.body_models convention, used
    by DELTA's SMPLX at multiview_optimization.py:505-517)."""
    d = np.load(path, allow_pickle=True)
    all_dirs = np.asarray(d["shapedirs"], np.float32)
    shapedirs = all_dirs[..., :num_betas]
    if all_dirs.shape[-1] > 300 and num_expr > 0:
        expr_dirs = jnp.asarray(all_dirs[..., 300:300 + num_expr])
    else:  # older layouts without packed expression space
        expr_dirs = None
    posedirs = np.asarray(d["posedirs"], np.float32)
    P = posedirs.shape[-1]
    n_verts3 = posedirs.shape[0] * posedirs.shape[1]
    posedirs = posedirs.reshape(n_verts3, P).T  # (P, V*3)
    return SMPLXModel(
        v_template=jnp.asarray(d["v_template"], jnp.float32),
        shapedirs=jnp.asarray(shapedirs),
        posedirs=jnp.asarray(posedirs.astype(np.float32)),
        J_regressor=jnp.asarray(d["J_regressor"], jnp.float32),
        parents=np.asarray(d["kintree_table"])[0].astype(np.int64),
        lbs_weights=jnp.asarray(d["weights"], jnp.float32),
        faces=np.asarray(d["f"], np.int64),
        expr_dirs=expr_dirs,
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
    if expression is not None and model.num_expr > 0:
        v_shaped = v_shaped + jnp.einsum("vce,e->vc", model.expr_dirs,
                                         expression[:model.num_expr])
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
                      num_joints: int = 4, num_betas: int = 5,
                      num_expr: int = 0) -> SMPLXModel:
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
        expr_dirs=(jnp.asarray(rng.normal(size=(num_verts, 3, num_expr))
                               .astype(np.float32) * 0.01)
                   if num_expr else None),
    )


def sphere_head_model(subdiv: int = 12, radius: float = 0.12) -> SMPLXModel:
    """A deterministic triangulated sphere 'head' (UV sphere) with one joint —
    the synthetic-head fixture for full-loss fit tests (no licensed assets)."""
    th = np.linspace(0, np.pi, subdiv + 1)[1:-1]
    ph = np.linspace(0, 2 * np.pi, 2 * subdiv, endpoint=False)
    T, P = np.meshgrid(th, ph, indexing="ij")
    ring = np.stack([np.sin(T) * np.cos(P), np.cos(T), np.sin(T) * np.sin(P)],
                    -1).reshape(-1, 3)
    verts = np.concatenate([[[0, 1, 0]], ring, [[0, -1, 0]]], 0) * radius
    nph = len(ph)
    faces = []
    for j in range(nph):  # caps (wound so normals point outward)
        faces.append([0, 1 + (j + 1) % nph, 1 + j])
        base = 1 + (len(th) - 1) * nph
        faces.append([len(verts) - 1, base + j, base + (j + 1) % nph])
    for i in range(len(th) - 1):
        for j in range(nph):
            a = 1 + i * nph + j
            b = 1 + i * nph + (j + 1) % nph
            c = a + nph
            d = b + nph
            faces += [[a, b, c], [b, d, c]]
    V = len(verts)
    return SMPLXModel(
        v_template=jnp.asarray(verts, jnp.float32),
        shapedirs=jnp.zeros((V, 3, 2)),
        posedirs=jnp.zeros((0, V * 3)),
        J_regressor=jnp.full((1, V), 1.0 / V),
        parents=np.array([-1]),
        lbs_weights=jnp.ones((V, 1)),
        faces=np.asarray(faces, np.int64),
    )
