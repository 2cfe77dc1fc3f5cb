"""Mesh-anchored fast animation rendering.

Behavioral reference: ``/root/reference/lib/mesh_animation_renderer.py:150-322``:
  1. bake (blend weights, rgb, sigma) at the canonical mesh vertices once
     (model mesh_animation mode)
  2. per target pose: forward-LBS the mesh to world space with the baked
     weights, rasterize from the target camera (pix_to_face + barycentrics)
  3. at hit pixels: interpolate surface point, weights; take M=11 samples
     along the camera ray within +-interval of the hit
  4. inverse-LBS the samples to canonical space with the interpolated
     weights, query the canonical radiance field, alpha-composite
     (occupancy-style weights, ref :312)
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from mpsnerf_tpu.models.mps_nerf import MPSNeRF
from mpsnerf_tpu.native import rasterize_mesh
from mpsnerf_tpu.ops.composite import wide_sigmoid
from mpsnerf_tpu.smpl.lbs import (
    PoseTransforms,
    deform_canonical_to_source,
    deform_target_to_canonical_with_weights,
    world_to_smpl,
)
from mpsnerf_tpu.smpl.model import SMPLModel
from mpsnerf_tpu.train.trainer import to_device_input


class MeshAnimationRenderer:
    def __init__(
        self,
        model: Optional[MPSNeRF],
        variables,
        smpl: SMPLModel,
        can_verts: np.ndarray,   # (V, 3) canonical mesh vertices
        tris: np.ndarray,        # (T, 3)
        m_samples: int = 11,
        interval: float = 0.01,
        chunk: int = 200_000,
        # injectable compute (serving bundles drive this renderer through
        # exported graphs — serve/bundle.py:ServedRenderer.animate):
        # query_fn(variables, smpl, sp, latent, pts) ->
        #   (bweights (N, 24), rgb (N, 3), sigma (N,));
        # encode_fn(variables, images) -> latent.
        # With both given, ``model`` may be None and ``mean_shape`` must
        # be passed explicitly.
        query_fn=None,
        encode_fn=None,
        mean_shape: Optional[bool] = None,
    ):
        self.model = model
        self.variables = variables
        self.smpl = smpl
        self.can_verts = np.asarray(can_verts, np.float32)
        self.tris = np.asarray(tris, np.int32)
        self.m = m_samples
        self.interval = interval
        self.chunk = chunk
        self._baked = None
        self.mean_shape = (
            bool(model.mean_shape) if mean_shape is None else bool(mean_shape)
        )

        if query_fn is None:
            @jax.jit
            def query_fn(variables, smpl, sp, latent, pts):
                raw = model.apply(
                    variables, smpl, sp, sp, latent, pts,
                    jnp.zeros_like(pts), train=False,
                    mode="mesh_animation", method=MPSNeRF.query,
                )
                return raw.bweights, raw.rgb, raw.sigma

        self._query = query_fn

        if encode_fn is None:
            @jax.jit
            def encode_fn(variables, images):
                return model.apply(
                    variables, images, train=False, method=MPSNeRF.encode
                )

        self._encode = encode_fn

    def bake(self, sp_item: Dict) -> None:
        """Query weights / rgb / sigma at the canonical vertices once."""
        # "_"-prefixed keys are other renderers' private caches (e.g. the
        # eval ViewRenderer's _device_cache holds nested namedtuples that
        # to_device_input's flat-dict branch cannot convert)
        sp = to_device_input({k: v for k, v in sp_item.items()
                              if k != "msk_all"
                              and not k.startswith("_")})
        latent = self._encode(self.variables, sp["img_all"])
        self._latent = latent
        self._sp = sp
        bw, rgb, sig = [], [], []
        pts = self.can_verts
        for i in range(0, len(pts), self.chunk):
            b, r, s = self._query(
                self.variables, self.smpl, sp, latent,
                jnp.asarray(pts[i : i + self.chunk]),
            )
            bw.append(np.asarray(b))
            rgb.append(np.asarray(wide_sigmoid(r)))
            sig.append(np.asarray(wide_sigmoid(s)))
        self._baked = {
            "bweights": np.concatenate(bw),
            "rgb": np.concatenate(rgb),
            "sigma": np.concatenate(sig),
        }

    def render_pose(
        self,
        tp_item: Dict,
        view_index: int,
        height: int = 512,
        width: int = 512,
        fast: bool = False,
    ) -> np.ndarray:
        """Render the animated mesh under ``tp_item``'s pose from one of its
        cameras.  ``fast=True`` returns the directly-interpolated baked rgb
        (ref :256-258); otherwise the full M-sample ray compositing."""
        assert self._baked is not None, "call bake() first"
        baked = self._baked

        tp = to_device_input({k: v for k, v in tp_item.items()
                              if k != "msk_all"
                              and not k.startswith("_")})
        tf_t = PoseTransforms.create(self.smpl, tp["params"])

        # deform canonical mesh to target world space with baked weights
        world_verts = self._deform_with_weights(tf_t, baked["bweights"])

        K = np.asarray(tp_item["K_all"][view_index])
        R = np.asarray(tp_item["R_all"][view_index])
        T = np.asarray(tp_item["T_all"][view_index]).reshape(3)

        cam = np.asarray(world_verts) @ R.T + T
        z = cam[:, 2]
        sx = K[0, 0] * cam[:, 0] / np.maximum(z, 1e-6) + K[0, 2]
        sy = K[1, 1] * cam[:, 1] / np.maximum(z, 1e-6) + K[1, 2]
        screen = np.stack([sx, sy, z], 1).astype(np.float32)

        p2f, bary, _ = rasterize_mesh(screen, self.tris, height, width)
        hit = p2f >= 0
        img = np.zeros((height, width, 3), np.float32)
        if not hit.any():
            return img

        face_ids = p2f[hit]
        b = bary[hit]  # (M, 3)

        def interp(attr):
            return np.einsum("mk,mkc->mc", b, attr[self.tris[face_ids]])

        if fast:
            img[hit] = interp(baked["rgb"])
            return img

        # surface hit points + per-pixel blend weights
        hit_pts = interp(np.asarray(world_verts))
        hit_w = interp(baked["bweights"])

        origin = (-R.T @ T).reshape(3)
        ray_d = hit_pts - origin
        ray_d /= np.linalg.norm(ray_d, axis=-1, keepdims=True) + 1e-12

        offs = (np.arange(self.m) - self.m // 2) * self.interval
        samples = hit_pts[None] + ray_d[None] * offs[:, None, None]  # (M,P,3)
        m, p = samples.shape[:2]
        flat = samples.reshape(-1, 3)
        w_flat = np.repeat(hit_w[None], m, axis=0).reshape(-1, 24)

        # world -> target smpl space, then inverse LBS with given weights
        smpl_pts = world_to_smpl(
            jnp.asarray(flat), tf_t.R, tf_t.Th
        )
        can_pts = deform_target_to_canonical_with_weights(
            self.smpl, tf_t, smpl_pts, jnp.asarray(w_flat),
            self.mean_shape,
        )
        can_pts = np.asarray(can_pts)

        rgbs, sigs = [], []
        for i in range(0, len(can_pts), self.chunk):
            _, r, s = self._query(
                self.variables, self.smpl, self._sp, self._latent,
                jnp.asarray(can_pts[i : i + self.chunk]),
            )
            rgbs.append(np.asarray(wide_sigmoid(r)))
            sigs.append(np.asarray(wide_sigmoid(s)))
        rgb = np.concatenate(rgbs).reshape(m, p, 3).transpose(1, 0, 2)
        alpha = np.concatenate(sigs).reshape(m, p).T  # (P, M)

        # occupancy-style compositing (ref :312-313)
        trans = np.cumprod(
            np.concatenate([np.ones((p, 1)), 1 - alpha + 1e-10], 1), 1
        )[:, :-1]
        w = alpha * trans
        img[hit] = (w[..., None] * rgb).sum(1)
        return img

    def _deform_with_weights(self, tf_t: PoseTransforms, bweights):
        """canonical -> world with explicit per-vertex weights."""
        from mpsnerf_tpu.smpl.lbs import _blend_A, inv3x3, smpl_to_world
        from mpsnerf_tpu.smpl.kinematics import (
            pose_blend_offsets, shape_blend_offsets,
        )

        bw = jnp.asarray(bweights)
        pts = jnp.asarray(self.can_verts)
        A_b = _blend_A(bw, tf_t.A_big)
        pts = pts - A_b[:, :3, 3]
        pts = jnp.einsum("nij,nj->ni", inv3x3(A_b[:, :3, :3]), pts)
        # blend-shape offsets are per-SMPL-vertex; an extracted mesh has its
        # own topology, so they are skipped here (the shipped configs train
        # with mean_shape=0, where the reference skips them too)
        A_s = _blend_A(bw, tf_t.A)
        smpl_pts = jnp.einsum("nij,nj->ni", A_s[:, :3, :3], pts) + A_s[:, :3, 3]
        return smpl_to_world(smpl_pts, tf_t.R, tf_t.Th)
