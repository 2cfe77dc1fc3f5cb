"""Linear-blend-skinning warps between target, canonical, and source spaces.

Behavioral reference: ``/root/reference/lib/skinnning_batch.py:203-300``
(``coarse_deform_target2c`` / ``coarse_deform_c2source``).

TPU-first design: the expensive per-pose quantities (joint transforms ``A``,
pose/shape blend offsets over all vertices) are computed ONCE per pose in
:class:`PoseTransforms`, then every query point only does
  * a gather of its nearest vertex's blend weights / offsets,
  * a tiny (N, 24) @ (24, 16) matmul to blend joint transforms (MXU),
  * a closed-form 3x3 inverse (adjugate — no linalg solve on the hot path).
All shapes are static; callers mask invalid points outside.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp

from mpsnerf_tpu.smpl.model import SMPLModel
from mpsnerf_tpu.smpl.kinematics import (
    big_pose_vector,
    pose_blend_offsets,
    shape_blend_offsets,
    transform_params,
)


def world_to_smpl(pts: jnp.ndarray, R: jnp.ndarray, Th: jnp.ndarray) -> jnp.ndarray:
    """World -> SMPL coordinates: ``(x - Th) @ R``  (ref: skinnning_batch.py:347)."""
    return (pts - Th.reshape(1, 3)) @ R


def smpl_to_world(pts: jnp.ndarray, R: jnp.ndarray, Th: jnp.ndarray) -> jnp.ndarray:
    """SMPL -> world coordinates: ``x @ R^-1 + Th`` (ref: skinnning_batch.py:298)."""
    return pts @ inv3x3(R) + Th.reshape(1, 3)


def inv3x3(m: jnp.ndarray) -> jnp.ndarray:
    """Closed-form (adjugate) inverse of (..., 3, 3) matrices."""
    a, b, c = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    d, e, f = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    g, h, i = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]

    co_a = e * i - f * h
    co_b = -(d * i - f * g)
    co_c = d * h - e * g
    det = a * co_a + b * co_b + c * co_c

    adj = jnp.stack(
        [
            co_a, -(b * i - c * h), b * f - c * e,
            co_b, a * i - c * g, -(a * f - c * d),
            co_c, -(a * h - b * g), a * e - b * d,
        ],
        axis=-1,
    ).reshape(m.shape)
    return adj / det[..., None, None]


class PoseTransforms(NamedTuple):
    """Everything per-pose the warps need, computed once (not per point)."""

    A: jnp.ndarray              # (24, 4, 4) joint rigid transforms
    A_big: jnp.ndarray          # (24, 4, 4) big-pose joint transforms
    R: jnp.ndarray              # (3, 3) global rotation (world<->smpl)
    Th: jnp.ndarray             # (3,)  global translation
    joints: jnp.ndarray         # (24, 3) rest joints
    pose_offsets: jnp.ndarray   # (V, 3) per-vertex pose blend offsets
    shape_offsets: jnp.ndarray  # (V, 3) per-vertex shape blend offsets
    # (V, 30) = [weights | pose_off | shape_off]: ONE row gather per warp
    # point instead of three.  EVAL-ONLY (``fused=True`` on the warps):
    # the round-5 bisect put the fused render at 284.4k vs 275.5k rays/s
    # unfused (+1-3%; within tunnel run-to-run noise, kept because the
    # forward-only gather-count argument is one-sided).  In the TRAIN
    # step the wide gather sliced four ways defeats XLA's backward-pass
    # fusion and regressed the plain step 4x (bisect of commit 67d4064,
    # 93.9 -> 385.8 ms — table in BASELINE.md).  NEVER fuse under grad.
    vert_table: jnp.ndarray

    @staticmethod
    def create(smpl: SMPLModel, params) -> "PoseTransforms":
        """``params``: dict with 'poses' (72,), 'shapes' (10,), 'R', 'Th'."""
        poses = params["poses"].reshape(-1)
        shapes = params["shapes"].reshape(-1)
        A, joints = transform_params(smpl, poses, shapes)
        A_big, _ = transform_params(smpl, big_pose_vector(poses.dtype), shapes)
        pose_off = pose_blend_offsets(smpl, poses)
        shape_off = shape_blend_offsets(smpl, shapes)
        return PoseTransforms(
            A=A,
            A_big=A_big,
            R=params["R"].reshape(3, 3),
            Th=params["Th"].reshape(3),
            joints=joints,
            pose_offsets=pose_off,
            shape_offsets=shape_off,
            vert_table=jnp.concatenate(
                [jnp.asarray(smpl.weights), pose_off, shape_off], axis=-1
            ),
        )


def _blend_A(bweights: jnp.ndarray, A: jnp.ndarray) -> jnp.ndarray:
    """(N, 24) blend weights x (24, 4, 4) -> per-point (N, 4, 4)."""
    return (bweights @ A.reshape(24, 16)).reshape(-1, 4, 4)


def deform_target_to_canonical(
    smpl: SMPLModel,
    tf: PoseTransforms,
    query_pts: jnp.ndarray,   # (N, 3) in target SMPL space
    vert_ids: jnp.ndarray,    # (N,) nearest SMPL vertex index
    mean_shape: bool = True,
    fused: bool = False,
) -> jnp.ndarray:
    """Inverse-LBS warp: target-pose SMPL space -> canonical big-pose space.

    Ref: ``coarse_deform_target2c`` (lib/skinnning_batch.py:203-251).
    ``fused`` trades three narrow gathers for one (V, 30) row gather —
    EVAL-ONLY (see the PoseTransforms.vert_table note).
    """
    if fused:
        tab = tf.vert_table[vert_ids]
        bweights = tab[:, :24]
    else:
        bweights = jnp.asarray(smpl.weights)[vert_ids]  # (N, 24)

    A = _blend_A(bweights, tf.A)
    can = query_pts - A[:, :3, 3]
    can = jnp.einsum("nij,nj->ni", inv3x3(A[:, :3, :3]), can)

    if mean_shape:
        if fused:
            can = can - tab[:, 24:27] - tab[:, 27:30]
        else:
            can = can - tf.pose_offsets[vert_ids]
            can = can - tf.shape_offsets[vert_ids]

    A_b = _blend_A(bweights, tf.A_big)
    can = jnp.einsum("nij,nj->ni", A_b[:, :3, :3], can) + A_b[:, :3, 3]
    return can


def deform_target_to_canonical_with_weights(
    smpl: SMPLModel,
    tf: PoseTransforms,
    query_pts: jnp.ndarray,   # (N, 3) in target SMPL space
    bweights: jnp.ndarray,    # (N, 24) explicit blend weights
    mean_shape: bool = False,
) -> jnp.ndarray:
    """Inverse-LBS with caller-provided blend weights (the mesh-animation
    path interpolates baked per-vertex weights at ray-surface hits —
    ref lib/mesh_animation_renderer.py:291-299).  With ``mean_shape`` the
    blend-offset gathers fall back to the nearest-vertex lookup."""
    A = _blend_A(bweights, tf.A)
    can = query_pts - A[:, :3, 3]
    can = jnp.einsum("nij,nj->ni", inv3x3(A[:, :3, :3]), can)
    if mean_shape:
        from mpsnerf_tpu.ops.knn import nearest_vertex

        _, vert_ids = nearest_vertex(query_pts, smpl.v_template)
        can = can - tf.pose_offsets[vert_ids]
        can = can - tf.shape_offsets[vert_ids]
    A_b = _blend_A(bweights, tf.A_big)
    return jnp.einsum("nij,nj->ni", A_b[:, :3, :3], can) + A_b[:, :3, 3]


def deform_canonical_to_source(
    smpl: SMPLModel,
    tf: PoseTransforms,
    query_pts: jnp.ndarray,                  # (N, 3) canonical big-pose pts
    vert_ids: jnp.ndarray,                   # (N,) nearest canonical vertex
    weights_correction: Optional[jnp.ndarray] = None,  # (N, 24) or None
    mean_shape: bool = True,
    fused: bool = False,
):
    """Forward-LBS warp: canonical big-pose -> source pose -> world.

    Returns ``(smpl_src_pts, world_src_pts, bweights)``.
    Ref: ``coarse_deform_c2source`` (lib/skinnning_batch.py:253-300) —
    including the 0.2-scaled skinning-field correction and renormalization.
    ``fused``: EVAL-ONLY single row gather (PoseTransforms.vert_table note).
    """
    if fused:
        tab = tf.vert_table[vert_ids]
        bweights = tab[:, :24]
    else:
        bweights = jnp.asarray(smpl.weights)[vert_ids]  # (N, 24)
    if weights_correction is not None:
        bweights = bweights + 0.2 * weights_correction
        bweights = bweights / jnp.sum(bweights, axis=-1, keepdims=True)

    # big pose -> T pose (inverse of the big-pose transform)
    A_b = _blend_A(bweights, tf.A_big)
    pts = query_pts - A_b[:, :3, 3]
    pts = jnp.einsum("nij,nj->ni", inv3x3(A_b[:, :3, :3]), pts)

    if mean_shape:
        if fused:
            pts = pts + tab[:, 27:30] + tab[:, 24:27]
        else:
            pts = pts + tf.shape_offsets[vert_ids]
            pts = pts + tf.pose_offsets[vert_ids]

    # T pose -> source pose
    A_s = _blend_A(bweights, tf.A)
    smpl_src = jnp.einsum("nij,nj->ni", A_s[:, :3, :3], pts) + A_s[:, :3, 3]

    world_src = smpl_to_world(smpl_src, tf.R, tf.Th)
    return smpl_src, world_src, bweights


def posed_vertices(smpl: SMPLModel, params) -> jnp.ndarray:
    """Full forward LBS of the template mesh to world space.

    Used by mesh-animation and synthetic data generation (the reference loads
    precomputed ``new_vertices/*.npy`` instead; same semantics).
    """
    poses = params["poses"].reshape(-1)
    shapes = params["shapes"].reshape(-1)
    A, _ = transform_params(smpl, poses, shapes)
    v = (
        smpl.v_template
        + shape_blend_offsets(smpl, shapes)
        + pose_blend_offsets(smpl, poses)
    )
    A_pt = _blend_A(smpl.weights, A)
    v_posed = jnp.einsum("nij,nj->ni", A_pt[:, :3, :3], v) + A_pt[:, :3, 3]
    return smpl_to_world(v_posed, params["R"].reshape(3, 3), params["Th"].reshape(3))
