"""SMPL kinematics: Rodrigues, rigid chain transforms, blend offsets.

Behavioral reference: ``/root/reference/lib/run_nerf_helpers.py:174-254``
(``batch_rodrigues_torch``, ``get_rigid_transformation_torch``,
``get_transform_params_torch``) and the numpy twins at
``/root/reference/lib/if_nerf_data_utils.py:1026-1079``.

TPU-first notes: the 24-joint chain is unrolled at trace time (static tree),
everything is fp32, and all outputs are small fixed-shape arrays that live in
VMEM for downstream per-point matmuls.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax.numpy as jnp
import numpy as np

from mpsnerf_tpu.smpl.model import SMPLModel, N_JOINTS

# Canonical "big pose": zero pose with shoulders at +/-45deg and elbows at
# -/+30deg about the z axis — pose-vector entries 5, 8, 23, 26
# (reference: lib/skinnning_batch.py:193-201).
BIG_POSE_AXES: Tuple[Tuple[int, float], ...] = (
    (5, np.pi / 4.0),
    (8, -np.pi / 4.0),
    (23, -np.pi / 6.0),
    (26, np.pi / 6.0),
)


def big_pose_vector(dtype=jnp.float32) -> jnp.ndarray:
    """The 72-dim canonical big-pose axis-angle vector."""
    v = np.zeros(72, np.float64)
    for idx, val in BIG_POSE_AXES:
        v[idx] = val
    return jnp.asarray(v, dtype)


def rodrigues(r: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """Axis-angle vectors (N, 3) -> rotation matrices (N, 3, 3).

    Matches the reference numerics: the epsilon is added to the vector before
    taking the norm (not to the norm), so zero vectors map to identity.
    """
    angle = jnp.linalg.norm(r + eps, axis=-1, keepdims=True)  # (N, 1)
    axis = r / angle
    cos = jnp.cos(angle)[..., None]
    sin = jnp.sin(angle)[..., None]

    rx, ry, rz = axis[..., 0], axis[..., 1], axis[..., 2]
    zeros = jnp.zeros_like(rx)
    K = jnp.stack(
        [zeros, -rz, ry, rz, zeros, -rx, -ry, rx, zeros], axis=-1
    ).reshape(r.shape[:-1] + (3, 3))

    ident = jnp.eye(3, dtype=r.dtype)
    return ident + sin * K + (1.0 - cos) * (K @ K)


def rigid_transforms(
    rot_mats: jnp.ndarray, joints: jnp.ndarray, parents: np.ndarray
) -> jnp.ndarray:
    """Per-joint world rigid transforms relative to the rest pose.

    Args:
      rot_mats: (24, 3, 3) local joint rotations.
      joints:   (24, 3) rest-pose joint locations.
      parents:  length-24 parent indices (host ints — the tree is static).

    Returns:
      (24, 4, 4) transforms ``A`` such that a rest point bound to joint j
      maps to ``A[j, :3, :3] @ x + A[j, :3, 3]`` in the posed space.
    """
    parents = np.asarray(parents)
    rel = joints - joints[parents]
    rel = rel.at[0].set(joints[0])

    local = jnp.concatenate([rot_mats, rel[:, :, None]], axis=2)  # (24,3,4)
    bottom = jnp.tile(
        jnp.asarray([[0.0, 0.0, 0.0, 1.0]], rot_mats.dtype), (N_JOINTS, 1, 1)
    )
    local = jnp.concatenate([local, bottom], axis=1)  # (24,4,4)

    # static unroll of the 24-joint chain (fixed topology -> no scan needed)
    chain = [local[0]]
    for j in range(1, N_JOINTS):
        chain.append(chain[int(parents[j])] @ local[j])
    transforms = jnp.stack(chain, axis=0)  # (24,4,4)

    # subtract the transformed rest joint so A maps rest -> posed offsets
    joints_h = jnp.concatenate(
        [joints, jnp.zeros((N_JOINTS, 1), joints.dtype)], axis=1
    )
    posed_joint = jnp.einsum("jab,jb->ja", transforms, joints_h)
    transforms = transforms.at[:, :, 3].add(-posed_joint)
    return transforms


def shape_blend_offsets(smpl: SMPLModel, shapes: jnp.ndarray) -> jnp.ndarray:
    """Per-vertex shape blend shape offsets: (V, 3)."""
    return jnp.einsum("vds,s->vd", smpl.shapedirs, shapes.reshape(-1))


def pose_blend_offsets(smpl: SMPLModel, poses: jnp.ndarray) -> jnp.ndarray:
    """Per-vertex pose blend shape offsets: (V, 3).

    Feature = flattened (R_j - I) for the 23 non-root joints; a (207,) @
    (207, V*3) matmul — MXU-friendly.
    """
    rot = rodrigues(poses.reshape(-1, 3))  # (24,3,3)
    feat = (rot[1:] - jnp.eye(3, dtype=rot.dtype)).reshape(-1)  # (207,)
    v = smpl.v_template.shape[0]
    return (smpl.posedirs.reshape(v * 3, -1) @ feat).reshape(v, 3)


def transform_params(
    smpl: SMPLModel, poses: jnp.ndarray, shapes: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Joint transforms for a pose/shape: returns (A (24,4,4), joints (24,3)).

    Equivalent to the reference ``get_transform_params_torch`` minus the
    global R/Th passthrough (kept in the caller's params dict).
    """
    v_shaped = smpl.v_template + shape_blend_offsets(smpl, shapes)
    rot_mats = rodrigues(poses.reshape(-1, 3))
    joints = smpl.J_regressor @ v_shaped  # (24,3)
    A = rigid_transforms(rot_mats, joints, np.asarray(smpl.parents))
    return A, joints


def params_dict_transforms(
    smpl: SMPLModel, params: Dict[str, jnp.ndarray]
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(A, R, Th, joints) from a params dict {poses, shapes, R, Th}."""
    A, joints = transform_params(smpl, params["poses"], params["shapes"])
    return A, params["R"], params["Th"], joints
