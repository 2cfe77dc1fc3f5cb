"""SMPL model container and loaders.

The SMPL body model is a fixed-topology mesh of ``N_VERTS`` = 6890 vertices
driven by ``N_JOINTS`` = 24 joints, with linear shape blend shapes (10 betas)
and pose blend shapes (207 = 23*9 rotation-residual features).

Behavioral reference: ``/root/reference/lib/run_nerf_helpers.py:141-150``
(``SMPL_to_tensor``) loads a pickled dict with keys ``v_template, shapedirs,
J_regressor, kintree_table, f, weights, posedirs``.  Here the model is an
immutable pytree of JAX arrays so it can be closed over by jitted functions.
"""

from __future__ import annotations

import pickle
from typing import Tuple

import jax.numpy as jnp
import numpy as np
from flax import struct

N_VERTS = 6890
N_JOINTS = 24
N_SHAPES = 10
N_POSE_FEATURES = (N_JOINTS - 1) * 9  # 207


@struct.dataclass
class SMPLModel:
    """Immutable SMPL rig as a pytree of arrays (all float32 / int32).

    ``parents`` is static (pytree aux data): the 24-joint kinematic chain is
    unrolled at trace time, so it must be a concrete python tuple.
    """

    v_template: jnp.ndarray   # (V, 3)   rest-pose vertices
    shapedirs: jnp.ndarray    # (V, 3, 10) shape blend shape basis
    posedirs: jnp.ndarray     # (V, 3, 207) pose blend shape basis
    J_regressor: jnp.ndarray  # (24, V)  joint regressor
    weights: jnp.ndarray      # (V, 24)  LBS blend weights (rows sum to 1)
    faces: jnp.ndarray        # (F, 3)   triangle indices
    parents: Tuple[int, ...] = struct.field(pytree_node=False, default=())

    @property
    def n_verts(self) -> int:
        return self.v_template.shape[0]


def load_smpl_pickle(path: str) -> SMPLModel:
    """Load a standard SMPL ``.pkl`` (latin1-pickled, scipy-sparse regressor).

    Mirrors the information content of the reference loader
    (``lib/base_utils.py:6-10`` + ``lib/run_nerf_helpers.py:141-150``).
    """
    with open(path, "rb") as f:
        params = pickle.load(f, encoding="latin1")

    j_reg = params["J_regressor"]
    if hasattr(j_reg, "toarray"):  # scipy sparse
        j_reg = j_reg.toarray()
    kintree = np.asarray(params["kintree_table"]).astype(np.int64)

    parents = kintree[0].copy()
    parents[0] = 0  # the root's stored parent is a sentinel; never read
    return SMPLModel(
        v_template=np.asarray(params["v_template"], np.float32),
        shapedirs=np.asarray(params["shapedirs"], np.float32),
        posedirs=np.asarray(params["posedirs"], np.float32),
        J_regressor=np.asarray(j_reg, np.float32),
        weights=np.asarray(params["weights"], np.float32),
        faces=np.asarray(params["f"], np.int64).astype(np.int32),
        parents=tuple(int(p) for p in parents),
    )


# The real SMPL kinematic tree (kintree_table row 0).  parents[0] is the
# root; the reference stores 4294967295 there — we use 0 and never read it.
_SMPL_PARENTS = np.array(
    [0, 0, 0, 0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 9, 9, 12, 13, 14, 16, 17, 18, 19, 20, 21],
    dtype=np.int32,
)


def synthetic_smpl(
    n_verts: int = N_VERTS, seed: int = 0, scale: float = 1.0
) -> SMPLModel:
    """A deterministic synthetic SMPL-like rig for tests and benchmarks.

    Geometry: vertices sampled on a capsule-ish body volume; joints placed by
    a regressor that averages nearby vertices; blend weights soft-assigned to
    the two nearest joints.  Numerically well-behaved (weights sum to 1,
    invertible per-joint transforms) so LBS round-trip properties hold.
    """
    rng = np.random.default_rng(seed)

    # joints roughly laid out like a human rig (depth along the chain)
    joint_pos = np.zeros((N_JOINTS, 3), np.float64)
    depth = np.zeros(N_JOINTS, np.int32)
    for j in range(1, N_JOINTS):
        depth[j] = depth[_SMPL_PARENTS[j]] + 1
    for j in range(1, N_JOINTS):
        p = _SMPL_PARENTS[j]
        step = rng.normal(size=3) * 0.12
        step[1] -= 0.08  # grow mostly downward/outward
        joint_pos[j] = joint_pos[p] + step

    # vertices around the skeleton: pick a random joint, offset from it
    owner = rng.integers(0, N_JOINTS, size=n_verts)
    verts = joint_pos[owner] + rng.normal(size=(n_verts, 3)) * 0.07
    verts = verts * scale

    # regressor: each joint is a normalized average of its 32 closest verts
    j_reg = np.zeros((N_JOINTS, n_verts), np.float64)
    for j in range(N_JOINTS):
        d = np.linalg.norm(verts - joint_pos[j] * scale, axis=1)
        idx = np.argsort(d)[:32]
        j_reg[j, idx] = 1.0 / 32.0

    # blend weights: softmax over inverse distance to the 2 nearest joints
    d_vj = np.linalg.norm(
        verts[:, None, :] - joint_pos[None, :, :] * scale, axis=2
    )
    w = np.exp(-(d_vj / 0.08) ** 2)
    top2 = np.argsort(d_vj, axis=1)[:, :2]
    mask = np.zeros_like(w)
    np.put_along_axis(mask, top2, 1.0, axis=1)
    w = w * mask + 1e-6
    w = w / w.sum(axis=1, keepdims=True)

    shapedirs = rng.normal(size=(n_verts, 3, N_SHAPES)) * 0.01
    posedirs = rng.normal(size=(n_verts, 3, N_POSE_FEATURES)) * 0.001

    # simple valid triangulation over vertex indices (not a real surface —
    # only used for normal computation paths in tests)
    n_faces = 2 * n_verts - 4 if n_verts > 3 else 1
    faces = rng.integers(0, n_verts, size=(n_faces, 3)).astype(np.int64)

    return SMPLModel(
        v_template=np.asarray(verts, np.float32),
        shapedirs=np.asarray(shapedirs, np.float32),
        posedirs=np.asarray(posedirs, np.float32),
        J_regressor=np.asarray(j_reg, np.float32),
        weights=np.asarray(w, np.float32),
        faces=np.asarray(faces, np.int32),
        parents=tuple(int(p) for p in _SMPL_PARENTS),
    )
