"""The numpy-era per-sample correction models, TPU-style.

Capability reference: ``CorrectionByf3d`` at
``/root/reference/lib/correction.py:53-436`` — selected by
``--model correction_by_f3d`` (plain) and ``correction_by_f3d_fagg``
(``use_agg=True`` windowed 2D aggregation), ``model_selection.py:9-20``.

Architecture (per query point), mirroring the reference field-for-field:
  1. world -> target SMPL space; optional 5 cm human-region mask
  2. spconv feature of the POSED grid at the query points (143-ch fusion:
     PE6(39) + per-joint offsets (72) + f3d (32) [+ windowed agg 128])
  3. forward correction field (D=3, zero-init) refines the coarse inverse
     LBS warp: canonical = coarse_t2c(q) + correction
  4. BACKWARD correction field (D=3; 111-ch: PE6 + canonical joint
     offsets [+ agg]) refines the forward warp:
     smpl_src = coarse_c2source(canonical) + correction_
  5. NeRF conditioned on PE6(canonical) + canonical-grid spconv feature
     [+ fused 2D feature when ``use_f2d``] (ref :359-363 — the
     ``use_f2d`` consult the batch models dropped)
  6. optional Jacobian smoothness: column norms of d(correction)/d(query)
     for both fields (ref :404-420's triple ``autograd.grad`` — here one
     ``jax.jacrev`` each, vmapped)

Deviations (documented): the LBS warps are the shared oracle-tested
``smpl/lbs.py`` implementations (the reference keeps a numpy twin of the
same math); results use the batch-era :class:`RawOutput` protocol with
the Jacobian norms carried in the ``occ_normal`` / ``nearest_smpl_normal``
slots (the numpy-era ``others`` tensor's ``grad_deform`` / ``grad_deform_``
channels, ref :426).  No compaction — this family is a legacy
architecture kept for capability parity, not a hot path.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import flax.linen as nn

from mpsnerf_tpu.models.layers import TorchLinear
from mpsnerf_tpu.models.deform import DeformField
from mpsnerf_tpu.models.mps_nerf import (
    HUMAN_DIST_THRESHOLD_SQ, MASK_FILL, RawOutput,
)
from mpsnerf_tpu.models.resnet import SpatialEncoder
from mpsnerf_tpu.models.sparse_conv import SparseConvNet3D
from mpsnerf_tpu.models.transformer import ViewFusionTransformer
from mpsnerf_tpu.ops.grid_sample import index_features_patch
from mpsnerf_tpu.ops.knn import nearest_vertex
from mpsnerf_tpu.ops.positional import positional_encoding
from mpsnerf_tpu.smpl.lbs import (
    PoseTransforms,
    deform_canonical_to_source,
    deform_target_to_canonical,
    smpl_to_world,
    world_to_smpl,
)
from mpsnerf_tpu.smpl.model import SMPLModel


def _joint_offsets(pts: jnp.ndarray, joints: jnp.ndarray) -> jnp.ndarray:
    """(N, 3) x (24, 3) -> (N, 72) per-joint offset vectors (ref
    ``forward_fusion``/``backward_fusion``, lib/correction.py:218-239)."""
    return (pts[:, None, :] - joints[None]).reshape(pts.shape[0], 72)


def _posed_joints(tf: PoseTransforms) -> jnp.ndarray:
    """Rest joints pushed through the pose's rigid transforms — the
    reference's ``t_joints = A @ [J, 1]`` (lib/correction.py:137-140)."""
    return (
        jnp.einsum("jab,jb->ja", tf.A[:, :3, :3], tf.joints)
        + tf.A[:, :3, 3]
    )


def _project_points_uv(sp_input, world_pts):
    """World points -> per-view pixel coordinates (ref ``projection``,
    lib/correction.py:96-105)."""
    R_all = sp_input["R_all"]
    T_all = sp_input["T_all"].reshape(-1, 3, 1)
    K_all = sp_input["K_all"]
    img_all = sp_input["img_all"]
    image_size = (float(img_all.shape[-1]), float(img_all.shape[-2]))
    cam = (
        jnp.einsum("vij,nj->vni", R_all, world_pts)
        + T_all.transpose(0, 2, 1)
    )
    pix = jnp.einsum("vij,vnj->vni", K_all, cam)
    uv = pix[..., :2] / (pix[..., 2:] + 1e-5)
    return uv, image_size


def _window_agg_feature(latent, uv, image_size):
    """5x5 pixel-window mean of the pixel-aligned features, averaged over
    views (ref ``window_feature``, lib/correction.py:113-131 — including
    its axis-swapped shift construction: the shifted lookup uses
    (uv_y + dx, uv_x + dy))."""
    feats = []
    for dx in (-2.0, -1.0, 0.0, 1.0, 2.0):
        for dy in (-2.0, -1.0, 0.0, 1.0, 2.0):
            new_uv = jnp.stack(
                [uv[:, :, 1] + dx, uv[:, :, 0] + dy], axis=-1
            )
            feats.append(
                index_features_patch(latent, new_uv, image_size)
            )  # (V, C, N)
    mean = sum(feats) / float(len(feats))  # (V, C, N)
    return jnp.mean(mean, axis=0).T  # (N, C)


class CorrectionF3D(nn.Module):
    """``CorrectionByf3d`` / ``correction_by_f3d_fagg`` equivalent."""

    use_agg: bool = False        # windowed 2D aggregation into the fields
    use_f2d: bool = True         # NeRF consults the fused 2D feature
    with_viewdirs: bool = False
    human_sample: bool = False   # note the reference DEFAULTS this off
    use_transformer: bool = False
    encoder_layers: int = 2
    nerf_width: int = 256
    nerf_depth: int = 8
    nerf_skips: tuple = (4,)

    # duck-type surface shared with MPSNeRF (plain class attrs, not flax
    # fields): the CLI/trainer attach spconv gather tables when
    # `correction_field` is set (run_nerf_batch.py), `canonical_grid`
    # additionally requests the canonical t_* grid this family's NeRF
    # conditions on (lib/correction.py:339-341), and `compact_fraction`
    # None opts out of the masked-compaction render modes (this family
    # has no in-render compaction; the renderer's clone() path is gated
    # on it being non-None)
    correction_field = True
    canonical_grid = True
    compact_fraction = None

    def setup(self):
        self.encoder_2d = SpatialEncoder(num_layers=self.encoder_layers)
        self.encoder_3d = SparseConvNet3D()
        # ref dims: forward 143(+128 agg), backward 111(+128), D=3
        self.forward_deform = DeformField(
            depth=3, out_ch=3, deform_type="correction"
        )
        self.backward_deform = DeformField(
            depth=3, out_ch=3, deform_type="correction"
        )
        if self.use_transformer:
            self.transformer = ViewFusionTransformer(dim=128)
        W = self.nerf_width
        self.pts_linears = [
            TorchLinear(W, name=f"pts_linear_{i}")
            for i in range(self.nerf_depth)
        ]
        self.alpha_linear = TorchLinear(1, name="alpha_linear")
        self.feature_linear = TorchLinear(W, name="feature_linear")
        self.views_linear = TorchLinear(W // 2, name="views_linear")
        self.rgb_linear = TorchLinear(3, name="rgb_linear")

    def encode(self, images: jnp.ndarray, train: bool = False):
        return self.encoder_2d(images, train=train)

    # ------------------------------------------------------------------

    def _project_uv(self, sp_input, world_pts):
        return _project_points_uv(sp_input, world_pts)

    def _window_agg(self, latent, uv, image_size):
        return _window_agg_feature(latent, uv, image_size)

    def _forward_fused(self, q_pts, tj, p3d, agg):
        parts = [positional_encoding(q_pts, 6), _joint_offsets(q_pts, tj),
                 p3d]
        if agg is not None:
            parts.append(agg)
        return jnp.concatenate(parts, axis=-1)  # (N, 143[+128])

    def _backward_fused(self, can_pts, cj, agg):
        parts = [positional_encoding(can_pts, 6),
                 _joint_offsets(can_pts, cj)]
        if agg is not None:
            parts.append(agg)
        return jnp.concatenate(parts, axis=-1)  # (N, 111[+128])

    def query(
        self,
        smpl: SMPLModel,
        sp_input: Dict[str, Any],
        tp_input: Dict[str, Any],
        latent: jnp.ndarray,
        world_pts: jnp.ndarray,
        viewdirs: jnp.ndarray,
        train: bool = False,
        compute_normals: bool = False,  # -> Jacobian smoothness here
        mode: str = "full",
        nn_ids=None,
    ) -> RawOutput:
        """Signature-compatible with ``MPSNeRF.query`` so the shared
        renderer/trainer drive this model unchanged.  ``compute_normals``
        selects the numpy-era smoothness quantities (Jacobian norms)
        instead of occupancy normals."""
        assert mode == "full" and nn_ids is None, (
            "geometry-tool modes are flagship-only (the reference's "
            "extract_mesh path also lives on SKinningBatch)"
        )
        compute_smooth = compute_normals
        n = world_pts.shape[0]
        tf_t = PoseTransforms.create(smpl, tp_input["params"])
        tf_s = PoseTransforms.create(smpl, sp_input["params"])

        q = world_to_smpl(world_pts, tf_t.R, tf_t.Th)
        tar_smpl = world_to_smpl(tp_input["vertices"], tf_t.R, tf_t.Th)
        d2, ids_t = nearest_vertex(jax.lax.stop_gradient(q), tar_smpl)
        if self.human_sample:
            pts_mask = (d2 < HUMAN_DIST_THRESHOLD_SQ).astype(jnp.int32)
        else:
            pts_mask = jnp.ones((n,), jnp.int32)

        # posed-grid spconv feature at the (normalized) query points
        bounds = tp_input["bounds"]
        center = 0.5 * (bounds[0] + bounds[1])
        half = 0.5 * (bounds[1] - bounds[0])
        p3d_0 = self.encoder_3d(
            tp_input["feature"], tp_input["spconv_plan"],
            (q - center) / half, train=train,
        )

        coarse_can = deform_target_to_canonical(
            smpl, tf_t, q, ids_t, mean_shape=False
        )
        tj = _posed_joints(tf_t)   # target-pose joints (smpl space)
        cj = tf_t.joints           # canonical joints

        agg = None
        if self.use_agg:
            # aggregate at the COARSE source-warped points (ref :298-302)
            _, ids_cc = nearest_vertex(
                jax.lax.stop_gradient(coarse_can), sp_input["t_vertices"]
            )
            _, world_src_coarse, _ = deform_canonical_to_source(
                smpl, tf_s, coarse_can, ids_cc, None, False
            )
            uv0, image_size = self._project_uv(sp_input, world_src_coarse)
            agg = self._window_agg(latent, uv0, image_size)

        correction = self.forward_deform(
            self._forward_fused(q, tj, p3d_0, agg)
        )
        canonical = coarse_can + correction

        _, ids_c = nearest_vertex(
            jax.lax.stop_gradient(canonical), sp_input["t_vertices"]
        )
        coarse_smpl_src, _, bweights = deform_canonical_to_source(
            smpl, tf_s, canonical, ids_c, None, False
        )
        correction_ = self.backward_deform(
            self._backward_fused(canonical, cj, agg)
        )
        smpl_src = coarse_smpl_src + correction_
        world_src = smpl_to_world(smpl_src, tf_s.R, tf_s.Th)

        # canonical-grid spconv feature (ref :339-341)
        t_bounds = sp_input["t_bounds"]
        t_center = 0.5 * (t_bounds[0] + t_bounds[1])
        t_half = 0.5 * (t_bounds[1] - t_bounds[0])
        p3d_t = self.encoder_3d(
            sp_input["t_feature"], sp_input["t_spconv_plan"],
            (canonical - t_center) / t_half, train=train,
        )

        # fused 2D feature at the refined source-warped points
        uv, image_size = self._project_uv(sp_input, world_src)
        f2d = index_features_patch(latent, uv, image_size)  # (V, C, N)
        f2d = f2d.transpose(0, 2, 1)  # (V, N, C)
        if self.use_transformer:
            fused = self.transformer(f2d, out_views=2)
            f1, f2 = fused[0], fused[1]
        else:
            f1 = f2 = jnp.mean(f2d, axis=0)

        parts = [positional_encoding(canonical, 6), p3d_t]
        if self.use_f2d:
            parts.append(f1)
        x = jnp.concatenate(parts, axis=-1)  # (N, 71[+128])
        h = x
        for i, layer in enumerate(self.pts_linears):
            h = nn.relu(layer(h))
            if i in self.nerf_skips:
                h = jnp.concatenate([x, h], axis=-1)
        alpha = self.alpha_linear(h)[..., 0]
        feature = self.feature_linear(h)
        if self.with_viewdirs:
            vd = positional_encoding(viewdirs, 4)
            h2 = jnp.concatenate([feature, vd, f2], axis=-1)
        else:
            h2 = jnp.concatenate([feature, f2], axis=-1)
        rgb = self.rgb_linear(nn.relu(self.views_linear(h2)))

        # Jacobian smoothness (ref :404-420): column norms of each
        # correction field's Jacobian wrt its POINT input, non-point
        # conditioning detached exactly like the reference
        grad_deform = jnp.zeros((n, 3), world_pts.dtype)
        grad_deform_ = jnp.zeros((n, 3), world_pts.dtype)
        if compute_smooth:
            p3d_sg = jax.lax.stop_gradient(p3d_0)
            agg_sg = (
                jax.lax.stop_gradient(agg) if agg is not None else None
            )
            can_sg = jax.lax.stop_gradient(canonical)
            q_sg = jax.lax.stop_gradient(q)

            def fwd_batch(pts):
                return self.forward_deform(
                    self._forward_fused(pts, tj, p3d_sg, agg_sg)
                )

            def bwd_batch(pts):
                return self.backward_deform(
                    self._backward_fused(pts, cj, agg_sg)
                )

            def col_norms(fn, pts):
                # one VJP per output channel — the reference's three
                # autograd.grad calls — then per-input-coordinate norms
                # over the output axis (ref stacks grad_u/v/w on dim=2
                # and norms dim=-1)
                out, vjp = jax.vjp(fn, pts)
                rows = [
                    vjp(
                        jnp.zeros_like(out).at[:, u].set(1.0)
                    )[0]
                    for u in range(3)
                ]  # each (N, 3) = dC_u/dq
                J = jnp.stack(rows, axis=2)  # (N, in 3, out 3)
                return jnp.linalg.norm(J, axis=-1)

            grad_deform = col_norms(fwd_batch, q_sg)
            grad_deform_ = col_norms(bwd_batch, can_sg)

        maskf = pts_mask.astype(rgb.dtype)[:, None]
        rgb_out = jnp.where(maskf > 0, rgb, MASK_FILL)
        sigma_out = jnp.where(maskf[:, 0] > 0, alpha, MASK_FILL)

        def zmask(xv):
            return xv * maskf

        return RawOutput(
            rgb=rgb_out,
            sigma=sigma_out,
            pts_mask=pts_mask,
            correction=zmask(correction),
            correction_=zmask(correction_),
            smpl_query_pts=zmask(q),
            smpl_src_pts=zmask(smpl_src),
            # numpy-era layout: Jacobian norms ride the normal slots
            occ_normal=zmask(grad_deform),
            nearest_smpl_normal=zmask(grad_deform_),
            world_src_pts=world_src,
            bweights=bweights,
            n_dropped=jnp.zeros((), jnp.int32),
        )

    def __call__(self, smpl, sp_input, tp_input, world_pts, viewdirs,
                 train: bool = False, compute_normals: bool = False):
        latent = self.encode(sp_input["img_all"], train=train)
        return self.query(
            smpl, sp_input, tp_input, latent, world_pts, viewdirs,
            train=train, compute_normals=compute_normals,
        )


class CorrectionUvhAgg(nn.Module):
    """``CorrectionByUvhAgg`` equivalent — the reference's fallthrough
    default model (``model_selection.py:84``, ``lib/correction.py:438-751``).

    Architecture as written there (per query point):
      1. world -> target SMPL space; 1-NN against the POSED target verts
      2. forward correction field on [PE10(q) 63 | nearest canonical
         vertex 3 | distance-to-nearest 1 | windowed agg 128 if
         ``use_agg``] refines the coarse inverse LBS warp (D=8, zero-init
         out — the reference's DeformField DEFAULTS, not f3d's D=3)
      3. backward correction field on [PE10(canonical) 63 | distance 1 |
         agg] refines the forward warp
      4. NeRF (D=8, skip 4) on [PE10(canonical) 63 | canonical-grid
         spconv feature 32 | summed per-view 2D feature 128 when
         ``use_f2d``]; rgb head always consumes PE4(viewdirs) 27 and the
         summed 2D feature (``torch.sum(..., dim=0)`` — SUM over views,
         not the batch models' transformer/mean; lib/correction.py:725)

    The reference class is UNCONSTRUCTIBLE as shipped; this module
    resolves its latent errors the way the surrounding code evidently
    intends, each documented in PARITY.md:
      * ``nerf_input_ch``/``nerf_input_ch_2`` are commented-out globals
        (lib/correction.py:15-16 -> NameError at :459).  Flax infers
        input widths, and the actual concatenations give 223 / 411.
      * ``self.use_f2d`` is read (:714) but never assigned -> a module
        flag, defaulting True (the 2D pathway is the class's namesake).
      * ``coarse_deform_target2c`` returns one value but is unpacked as
        two (:592 vs :556); ``coarse_deform_c2source`` returns two but is
        unpacked as three (:601,:695) -> both also return their 1-NN ids,
        which the fusion features consume.
      * ``forward_fusion``'s distance (:618) is ``‖q_smpl −
        vertices_world[ids]‖`` — a frame mixture, but RUNNABLE as
        written, so reproduced faithfully rather than "fixed".

    No human-region mask and no Jacobian-smoothness branch exist in this
    forward (unlike CorrectionByf3d); ``compute_normals`` therefore
    returns zeros in the smoothness slots.
    """

    use_agg: bool = False
    use_f2d: bool = True
    encoder_layers: int = 2
    nerf_width: int = 256
    nerf_depth: int = 8
    nerf_skips: tuple = (4,)

    # duck-type surface shared with MPSNeRF — see CorrectionF3D
    correction_field = True
    canonical_grid = True
    compact_fraction = None

    def setup(self):
        self.encoder_2d = SpatialEncoder(num_layers=self.encoder_layers)
        self.encoder_3d = SparseConvNet3D()
        # the reference passes only input_ch/output_ch/deform_type, so
        # DeformField keeps its D=8 / W=256 / skips=[4] defaults (:444-445)
        self.forward_deform = DeformField(
            depth=8, out_ch=3, deform_type="correction"
        )
        self.backward_deform = DeformField(
            depth=8, out_ch=3, deform_type="correction"
        )
        W = self.nerf_width
        self.pts_linears = [
            TorchLinear(W, name=f"pts_linear_{i}")
            for i in range(self.nerf_depth)
        ]
        self.alpha_linear = TorchLinear(1, name="alpha_linear")
        self.feature_linear = TorchLinear(W, name="feature_linear")
        self.views_linear = TorchLinear(W // 2, name="views_linear")
        self.rgb_linear = TorchLinear(3, name="rgb_linear")

    def encode(self, images: jnp.ndarray, train: bool = False):
        return self.encoder_2d(images, train=train)

    def query(
        self,
        smpl: SMPLModel,
        sp_input: Dict[str, Any],
        tp_input: Dict[str, Any],
        latent: jnp.ndarray,
        world_pts: jnp.ndarray,
        viewdirs: jnp.ndarray,
        train: bool = False,
        compute_normals: bool = False,
        mode: str = "full",
        nn_ids=None,
    ) -> RawOutput:
        assert mode == "full" and nn_ids is None, (
            "geometry-tool modes are flagship-only"
        )
        n = world_pts.shape[0]
        tf_t = PoseTransforms.create(smpl, tp_input["params"])
        tf_s = PoseTransforms.create(smpl, sp_input["params"])

        # world -> smpl space, target pose (ref :674-680)
        q = world_to_smpl(world_pts, tf_t.R, tf_t.Th)
        tar_smpl = world_to_smpl(tp_input["vertices"], tf_t.R, tf_t.Th)
        _, ids_t = nearest_vertex(jax.lax.stop_gradient(q), tar_smpl)
        coarse_can = deform_target_to_canonical(
            smpl, tf_t, q, ids_t, mean_shape=False
        )

        agg = None
        if self.use_agg:
            # aggregate 5x5-window 2D features at the COARSE source-warped
            # points (ref :692-696)
            _, ids_cc = nearest_vertex(
                jax.lax.stop_gradient(coarse_can), sp_input["t_vertices"]
            )
            _, world_src_coarse, _ = deform_canonical_to_source(
                smpl, tf_s, coarse_can, ids_cc, None, False
            )
            uv0, image_size = _project_points_uv(sp_input, world_src_coarse)
            agg = _window_agg_feature(latent, uv0, image_size)

        # forward fusion (ref ``forward_fusion``, :605-625): PE10(q) |
        # nearest canonical vertex | distance to nearest (world-frame
        # verts as written) | agg
        t_vertex = tp_input["t_vertices"][ids_t]
        dist_f = jnp.linalg.norm(
            q - tp_input["vertices"][ids_t], axis=-1, keepdims=True
        )
        parts = [positional_encoding(q, 10), t_vertex, dist_f]
        if agg is not None:
            parts.append(agg)
        correction = self.forward_deform(jnp.concatenate(parts, axis=-1))
        canonical = coarse_can + correction

        # backward fusion (ref ``backward_fusion``, :627-657):
        # PE10(canonical) | distance to nearest canonical vertex | agg
        _, ids_c = nearest_vertex(
            jax.lax.stop_gradient(canonical), sp_input["t_vertices"]
        )
        coarse_smpl_src, _, bweights = deform_canonical_to_source(
            smpl, tf_s, canonical, ids_c, None, False
        )
        dist_b = jnp.linalg.norm(
            canonical - tp_input["t_vertices"][ids_c], axis=-1,
            keepdims=True,
        )
        parts = [positional_encoding(canonical, 10), dist_b]
        if agg is not None:
            parts.append(agg)
        correction_ = self.backward_deform(jnp.concatenate(parts, axis=-1))
        smpl_src = coarse_smpl_src + correction_
        world_src = smpl_to_world(smpl_src, tf_s.R, tf_s.Th)

        # canonical-grid spconv feature at the REFINED canonical points
        # (ref :700-712 — the single encoder_3d consult of this class)
        t_bounds = sp_input["t_bounds"]
        t_center = 0.5 * (t_bounds[0] + t_bounds[1])
        t_half = 0.5 * (t_bounds[1] - t_bounds[0])
        p3d = self.encoder_3d(
            sp_input["t_feature"], sp_input["t_spconv_plan"],
            (canonical - t_center) / t_half, train=train,
        )

        # per-view 2D features at the refined source points, SUMMED over
        # views (ref :719-722)
        uv, image_size = _project_points_uv(sp_input, world_src)
        f2d = jnp.sum(
            index_features_patch(latent, uv, image_size), axis=0
        ).T  # (N, C)

        parts = [positional_encoding(canonical, 10), p3d]
        if self.use_f2d:
            parts.append(f2d)
        x = jnp.concatenate(parts, axis=-1)  # (N, 223 | 95)
        h = x
        for i, layer in enumerate(self.pts_linears):
            h = nn.relu(layer(h))
            if i in self.nerf_skips:
                h = jnp.concatenate([x, h], axis=-1)
        alpha = self.alpha_linear(h)[..., 0]
        feature = self.feature_linear(h)
        vd = positional_encoding(viewdirs, 4)
        h2 = jnp.concatenate([feature, vd, f2d], axis=-1)  # (N, 411)
        rgb = self.rgb_linear(nn.relu(self.views_linear(h2)))

        # ref raw = [rgb, alpha, query_pts, smpl_src_pts, correction,
        # correction_] (:748) — no mask, no smoothness quantities
        return RawOutput(
            rgb=rgb,
            sigma=alpha,
            pts_mask=jnp.ones((n,), jnp.int32),
            correction=correction,
            correction_=correction_,
            smpl_query_pts=q,
            smpl_src_pts=smpl_src,
            occ_normal=jnp.zeros((n, 3), world_pts.dtype),
            nearest_smpl_normal=jnp.zeros((n, 3), world_pts.dtype),
            world_src_pts=world_src,
            bweights=bweights,
            n_dropped=jnp.zeros((), jnp.int32),
        )

    def __call__(self, smpl, sp_input, tp_input, world_pts, viewdirs,
                 train: bool = False, compute_normals: bool = False):
        latent = self.encode(sp_input["img_all"], train=train)
        return self.query(
            smpl, sp_input, tp_input, latent, world_pts, viewdirs,
            train=train, compute_normals=compute_normals,
        )
