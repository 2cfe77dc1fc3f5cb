"""The flagship generalizable human-NeRF model.

Capability reference: ``SKinningBatch`` at
``/root/reference/lib/skinnning_batch.py:109-514`` — the model the shipped
configs train (``model = skinning_batch``, use_trans=1, append_rgb=1,
human_sample=1, correction_field=0, skinning_field=0, mean_shape=0).

Pipeline per query point (world space, target pose):
  1. world -> target SMPL space via the global (R, Th)
  2. human-region mask: 1-NN distance to posed SMPL verts < 5 cm
  3. inverse LBS warp target -> canonical big-pose space
  4. optional correction / skinning-weight fields
  5. forward LBS warp canonical -> source pose -> world
  6. project into every source view; sample ResNet features (+ PE'd rgb)
  7. transformer fusion across views -> f1 (density path), f2 (rgb path)
  8. NeRF MLP -> (rgb, sigma)

TPU-first restructuring vs. the reference:
  * image encoding is a separate method, run ONCE per step (the reference
    re-encoded every ray chunk — ``skinnning_batch.py:349-351``)
  * no boolean compaction: every point is computed, invalid ones are masked
    to raw = -80 (identical compositing semantics, static shapes)
  * the smooth-loss occupancy normal is a ``jax.vjp`` of the tail function
    from canonical points to sigma — double backprop handled by XLA
  * state (latent, image shape) is threaded explicitly, never stored on
    the module
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn

from mpsnerf_tpu.models.layers import TorchLinear
from mpsnerf_tpu.ops.compact import plan_compaction, compact, expand
from mpsnerf_tpu.models.resnet import SpatialEncoder
from mpsnerf_tpu.models.transformer import ViewFusionTransformer
from mpsnerf_tpu.models.deform import DeformField
from mpsnerf_tpu.models.sparse_conv import SparseConvNet3D
from mpsnerf_tpu.ops.positional import positional_encoding
from mpsnerf_tpu.ops.grid_sample import (
    index_features_patch,
    grid_sample_2d_patch,
)
from mpsnerf_tpu.ops.knn import nearest_vertex
from mpsnerf_tpu.ops.composite import wide_sigmoid
from mpsnerf_tpu.smpl.model import SMPLModel
from mpsnerf_tpu.smpl.lbs import (
    PoseTransforms,
    world_to_smpl,
    smpl_to_world,
    deform_target_to_canonical,
    deform_canonical_to_source,
)
from mpsnerf_tpu.smpl.mesh import vertex_normals

HUMAN_DIST_THRESHOLD_SQ = 0.05 ** 2  # 5 cm (ref skinnning_batch.py:360)
MASK_FILL = -80.0                    # ref skinnning_batch.py:493


class RawOutput(NamedTuple):
    """Typed replacement for the reference's packed 17/23-channel ``raw``
    protocol (ref skinnning_batch.py:491-504 / SURVEY §2.5)."""

    rgb: jnp.ndarray                  # (N, 3) pre-activation (masked: -80)
    sigma: jnp.ndarray                # (N,)   pre-activation (masked: -80)
    pts_mask: jnp.ndarray             # (N,)   1 = inside human region
    correction: jnp.ndarray           # (N, 3)
    correction_: jnp.ndarray          # (N, 3)
    smpl_query_pts: jnp.ndarray       # (N, 3)
    smpl_src_pts: jnp.ndarray         # (N, 3)
    occ_normal: jnp.ndarray           # (N, 3) d wide_sigmoid(sigma) / d can_pts
    nearest_smpl_normal: jnp.ndarray  # (N, 3)
    world_src_pts: jnp.ndarray        # (N, 3) (mesh_animation consumers)
    bweights: jnp.ndarray             # (N, 24)
    n_dropped: jnp.ndarray            # () valid points lost to capacity
    # overflow (0 when compaction is off or capacity suffices)

    def packed(self) -> jnp.ndarray:
        """The reference's 23-channel layout, for parity checks."""
        return jnp.concatenate(
            [
                self.rgb,
                self.sigma[:, None],
                self.pts_mask[:, None].astype(self.rgb.dtype),
                self.correction,
                self.correction_,
                self.smpl_query_pts,
                self.smpl_src_pts,
                self.occ_normal,
                self.nearest_smpl_normal,
            ],
            axis=-1,
        )


class MPSNeRF(nn.Module):
    """Generalizable human NeRF with LBS canonicalization."""

    num_instances: int = 25
    use_transformer: bool = True
    append_rgb: bool = True
    with_viewdirs: bool = False
    human_sample: bool = True
    mean_shape: bool = False
    correction_field: bool = False
    skinning_field: bool = False
    # correction-field formulation:
    #   "aggregate" — the flagship's PE + spconv-f3d + aggregated-2D input
    #     (ref skinnning_batch.py:116, 374-391), forward correction only
    #   "instance"  — CorrectionBatch's PE + poses(72) + instance-embed(128)
    #     + spconv-f3d input (ref skinnning_batch.py:1081-1102), with BOTH a
    #     forward correction on the canonical points (ref :1152-1165) and a
    #     backward correction on the source-pose points (ref :1176-1189)
    correction_style: str = "aggregate"
    # DirectDeform (ref skinnning_batch.py:517-880) conditions the NeRF MLP
    # on the fused 2D feature ONLY — no PE of the canonical points
    # (``x = point_2d_feature_1``, ref :832; nerf_input_ch=128(+27), :556).
    # Its declared skinning field is never used in the forward
    # (``weights_correction = 0.``, ref :795), so the faithful mapping is
    # pe_condition=False with both deform fields off.
    pe_condition: bool = True
    # compute dtype for the NeRF-MLP / transformer matmuls: "bfloat16"
    # runs them at the MXU's bf16 rate.  Params, the LBS/projection
    # geometry, LayerNorm statistics, and compositing all stay float32 —
    # the reference runs fp32 end-to-end (AMP wired but disabled,
    # run_nerf_batch.py:486), so "float32" is the parity default and
    # tests/test_bf16.py bounds the bf16 deviation.
    compute_dtype: str = "float32"
    encoder_layers: int = 2
    nerf_width: int = 256
    nerf_depth: int = 8
    nerf_skips: tuple = (4,)
    bn_axis_name: Optional[str] = None
    # pair training (H36M_P/THuman_P): the correction field's aggregated
    # 2D feature is sampled at the coarse source-warped points instead of
    # the raw query points (ref skinnning_batch.py:378-382)
    pair_mode: bool = False
    # CorrectionBatchBlend head (ref skinnning_batch.py:1993-1999): the
    # rgb head predicts per-view softmax weights that blend the sampled
    # image rgb instead of regressing color.  NOTE: the blended value is
    # fed through the compositing sigmoid exactly like the reference.
    blend_rgb: bool = False
    n_input_views: int = 3  # sizes the blend head
    # static capacity for masked-point compaction as a fraction of the
    # query count; None disables (full masked compute, exact reference
    # semantics even at capacity overflow).  Body-importance-sampled TRAIN
    # batches run ~35-42% in-body samples (measured at the shipped config),
    # so the default must be 0.5; full-image eval renders are ~6% valid and
    # use tighter caps with shuffled rays (see eval/runner.ViewRenderer).
    # RawOutput.n_dropped reports any overflow.
    compact_fraction: Optional[float] = 0.5

    def setup(self):
        cdt = jnp.bfloat16 if self.compute_dtype == "bfloat16" else None
        self.encoder_2d = SpatialEncoder(
            num_layers=self.encoder_layers, bn_axis_name=self.bn_axis_name
        )
        feat_ch = self.encoder_2d.latent_channels + (27 if self.append_rgb else 0)
        if self.use_transformer:
            self.transformer = ViewFusionTransformer(dim=feat_ch, dtype=cdt)
        self.latent_codes = nn.Embed(
            self.num_instances, 128,
            embedding_init=nn.initializers.normal(stddev=0.01),
        )
        if self.correction_field:
            self.encoder_3d = SparseConvNet3D()
            # flagship: D=2 (ref :116); CorrectionBatch: D=4 (ref :890)
            fwd_depth = 2 if self.correction_style == "aggregate" else 4
            self.forward_deform = DeformField(
                depth=fwd_depth, out_ch=3, deform_type="correction"
            )
            if self.correction_style == "instance":
                self.backward_correction = DeformField(
                    depth=4, out_ch=3, deform_type="correction"
                )
        if self.skinning_field:
            self.backward_deform = DeformField(
                depth=4, out_ch=24, deform_type="weights"
            )

        self.pts_linears = [
            TorchLinear(self.nerf_width, dtype=cdt, name=f"pts_linear_{i}")
            for i in range(self.nerf_depth)
        ]
        self.alpha_linear = TorchLinear(1, dtype=cdt, name="alpha_linear")
        self.feature_linear = TorchLinear(
            self.nerf_width, dtype=cdt, name="feature_linear"
        )
        self.views_linear = TorchLinear(
            self.nerf_width // 2, dtype=cdt, name="views_linear"
        )
        self.rgb_linear = TorchLinear(
            self.n_input_views if self.blend_rgb else 3, dtype=cdt,
            name="rgb_linear",
        )

    # ------------------------------------------------------------------
    # stage 1: per-step image encoding (NOT per chunk)
    # ------------------------------------------------------------------

    def encode(self, images: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        """images (V, 3, H, W) -> latent (V, C, H/4, W/4)."""
        return self.encoder_2d(images, train=train)

    # ------------------------------------------------------------------
    # stage 2: per-point query
    # ------------------------------------------------------------------

    def _nerf_mlp(self, can_pts, f1, f2, viewdirs, rgb_samples=None):
        if self.pe_condition:
            x = jnp.concatenate([positional_encoding(can_pts, 6), f1], axis=-1)
        else:
            x = f1  # DirectDeform: 2D feature only (ref :832)
        if self.compute_dtype == "bfloat16":
            # one up-front cast keeps the skip concats (and thus every
            # matmul input) in bf16 instead of promoting back to fp32
            x = x.astype(jnp.bfloat16)
            f2 = f2.astype(jnp.bfloat16)
        h = x
        for i, layer in enumerate(self.pts_linears):
            h = nn.relu(layer(h))
            if i in self.nerf_skips:
                h = jnp.concatenate([x, h], axis=-1)
        alpha = self.alpha_linear(h)[..., 0]
        feature = self.feature_linear(h)
        if self.with_viewdirs:
            vd = positional_encoding(viewdirs, 4).astype(feature.dtype)
            h = jnp.concatenate([feature, vd, f2], axis=-1)
        else:
            h = jnp.concatenate([feature, f2], axis=-1)
        h = nn.relu(self.views_linear(h))
        if self.blend_rgb:
            # per-view blend weights over the sampled image rgb (fp32 —
            # the convex blend must not quantize the image values)
            w = nn.softmax(
                self.rgb_linear(h).astype(jnp.float32), axis=-1
            )  # (N, V)
            rgb = jnp.einsum("nv,vnc->nc", w, rgb_samples)
        else:
            rgb = self.rgb_linear(h)
        # compositing and losses run fp32 regardless of compute dtype
        return rgb.astype(jnp.float32), alpha.astype(jnp.float32)

    def _project_uv(self, sp_input, world_src_pts):
        """World points -> per-view pixel coords (ref ``projection``,
        skinnning_batch.py:179-186).  Returns (uv (V, N, 2), image_size)."""
        R_all = sp_input["R_all"]          # (V, 3, 3)
        T_all = sp_input["T_all"].reshape(-1, 3, 1)
        K_all = sp_input["K_all"]          # (V, 3, 3)
        img_all = sp_input["img_all"]      # (V, 3, H, W)
        image_size = (float(img_all.shape[-1]), float(img_all.shape[-2]))

        with jax.named_scope("projection"):
            cam = (
                jnp.einsum("vij,nj->vni", R_all, world_src_pts)
                + T_all.transpose(0, 2, 1)
            )
            pix = jnp.einsum("vij,vnj->vni", K_all, cam)
            uv = pix[..., :2] / (pix[..., 2:] + 1e-5)  # (V, N, 2)
        return uv, image_size

    def _view_features(self, sp_input, latent, world_src_pts, fuse=True):
        """Project points into each source view, gather pixel-aligned
        features (+ PE'd sampled rgb), fuse across views.  With
        ``fuse=False`` returns the raw per-view stack (V, N, C)."""
        img_all = sp_input["img_all"]      # (V, 3, H, W)
        uv, image_size = self._project_uv(sp_input, world_src_pts)

        with jax.named_scope("encoder_index"):
            # patch-gather fast path: one (2,2,C) gather per point instead
            # of four corner gathers (bit-identical; ops/grid_sample.py)
            feats = index_features_patch(latent, uv, image_size)  # (V, C, N)
            feats = feats.transpose(0, 2, 1)  # (V, N, C)

        rgb_s = None
        if self.append_rgb or self.blend_rgb:
            size = jnp.asarray(image_size, uv.dtype)
            coords = 2.0 * uv / size - 1.0
            rgb_s = grid_sample_2d_patch(
                img_all, coords
            ).transpose(0, 2, 1)  # (V, N, 3)
        if self.append_rgb:
            rgb_pe = positional_encoding(rgb_s, 4)  # (V, N, 27)
            feats = jnp.concatenate([feats, rgb_pe], axis=-1)

        if not fuse:
            return feats

        if self.use_transformer:
            # only fused[0]/fused[1] are read — the last layer skips the
            # remaining views' rows (bit-identical, ~1/3 less last-layer
            # work at V=3; models/transformer.py)
            fused = self.transformer(feats, out_views=2)  # (2, N, C)
            f1 = fused[0]
            f2 = fused[1]
        else:
            f1 = f2 = jnp.mean(feats, axis=0)
        return f1, f2, rgb_s

    def query(
        self,
        smpl: SMPLModel,
        sp_input: Dict[str, Any],
        tp_input: Dict[str, Any],
        latent: jnp.ndarray,
        world_pts: jnp.ndarray,     # (N, 3)
        viewdirs: jnp.ndarray,      # (N, 3)
        train: bool = False,
        compute_normals: bool = False,
        mode: str = "full",         # "full" | "extract_mesh" | "mesh_animation"
        nn_ids: Optional[jnp.ndarray] = None,
    ) -> RawOutput:
        n = world_pts.shape[0]
        tp_params = tp_input["params"]
        sp_params = sp_input["params"]
        tf_t = PoseTransforms.create(smpl, tp_params)
        tf_s = PoseTransforms.create(smpl, sp_params)

        geometry_only = mode in ("extract_mesh", "mesh_animation")
        cplan = None
        n_dropped = jnp.zeros((), jnp.int32)

        if not geometry_only:
            smpl_query_pts = world_to_smpl(world_pts, tf_t.R, tf_t.Th)
            tar_smpl_pts = world_to_smpl(tp_input["vertices"], tf_t.R, tf_t.Th)
            q_stop = jax.lax.stop_gradient(smpl_query_pts)

            def cap_of(frac):
                c = int(np.ceil(n * frac / 1024)) * 1024
                return max(1024, min(c, n))

            use_compact = self.compact_fraction is not None and self.human_sample

            if nn_ids is not None:
                # caller already ran the exact 5 cm cull and supplies the
                # nearest-vertex ids (render_rays_compact's second-stage
                # fine compaction): every point is in-body, no internal
                # 1-NN or compaction needed
                pts_mask = jnp.ones((n,), jnp.int32)
                q_pts, q_ids, q_vd = smpl_query_pts, nn_ids, viewdirs
            elif use_compact and "body_grid" in tp_input:
                # O(1) stage 1: conservative occupancy-grid candidate test
                # (exact superset of the 5 cm mask — see ops/body_grid.py);
                # the exact 1-NN then runs on the compacted candidates only
                from mpsnerf_tpu.ops.body_grid import grid_lookup

                cand = grid_lookup(tp_input["body_grid"], q_stop).astype(
                    jnp.int32
                )
                cplan = plan_compaction(cand, cap_of(self.compact_fraction))
                d2, q_ids = nearest_vertex(
                    compact(cplan, q_stop), tar_smpl_pts
                )
                k1 = d2.shape[0]
                in_domain = (
                    jax.lax.broadcasted_iota(jnp.int32, (k1, 1), 0)[:, 0]
                    < cplan.n_valid
                )
                fine = (
                    (d2 < HUMAN_DIST_THRESHOLD_SQ) & in_domain
                ).astype(jnp.int32)
                q_pts = compact(cplan, smpl_query_pts)
                q_vd = compact(cplan, viewdirs)
                # the tail runs on all candidate slots; candidates beyond
                # 5 cm render as empty through the final mask (-80 fill)
                pts_mask = expand(cplan, fine, 0)
                n_dropped = jnp.maximum(
                    cplan.n_valid - cplan.gather_idx.shape[0], 0
                ).astype(jnp.int32)
            else:
                # single-phase: exact 1-NN on every point (ONE knn call —
                # the reference issued separate calls for the mask and the
                # warp, skinnning_batch.py:214,357)
                d2, vert_ids_t = nearest_vertex(q_stop, tar_smpl_pts)
                if self.human_sample:
                    pts_mask = (d2 < HUMAN_DIST_THRESHOLD_SQ).astype(jnp.int32)
                else:
                    pts_mask = jnp.ones((n,), jnp.int32)
                q_pts, q_ids, q_vd = smpl_query_pts, vert_ids_t, viewdirs
                if use_compact:
                    cplan = plan_compaction(
                        pts_mask, cap_of(self.compact_fraction)
                    )
                    q_pts = compact(cplan, smpl_query_pts)
                    q_ids = compact(cplan, vert_ids_t)
                    q_vd = compact(cplan, viewdirs)
                    n_dropped = jnp.maximum(
                        cplan.n_valid - cplan.gather_idx.shape[0], 0
                    ).astype(jnp.int32)

            # fused (V,30) table gathers are EVAL-ONLY: under grad the
            # wide gather defeats XLA's backward fusion (4x train-step
            # regression — smpl/lbs.py vert_table note)
            fused_lbs = not train
            coarse_can = deform_target_to_canonical(
                smpl, tf_t, q_pts, q_ids, self.mean_shape, fused=fused_lbs
            )
        else:
            # extract_mesh / mesh_animation query directly in canonical space
            smpl_query_pts = world_pts
            coarse_can = world_pts
            q_pts, q_vd = world_pts, viewdirs
            pts_mask = jnp.ones((n,), jnp.int32)

        # correction field: spconv features + aggregated 2D features drive a
        # zero-init MLP refining the coarse canonical points
        # (ref skinnning_batch.py:374-391)
        correction_c = jnp.zeros_like(coarse_can)
        if self.correction_field and not geometry_only:
            splan = tp_input["spconv_plan"]
            bounds = tp_input["bounds"]
            center = 0.5 * (bounds[0] + bounds[1])
            halfext = 0.5 * (bounds[1] - bounds[0])
            norm_pts = (q_pts - center) / halfext
            p3d = self.encoder_3d(
                tp_input["feature"], splan, norm_pts, train=train
            )  # (K, 32)

            if self.correction_style == "instance":
                # CorrectionBatch formulation (ref skinnning_batch.py:
                # 1081-1090, 1152-1165): PE + target poses + instance
                # embedding + spconv feature, added to the canonical pts
                k = q_pts.shape[0]
                embed = self.latent_codes(
                    tp_input["instance_idx"].astype(jnp.int32).reshape(())[None]
                )[0]
                fused = jnp.concatenate(
                    [
                        positional_encoding(q_pts, 6),
                        jnp.broadcast_to(
                            tp_params["poses"].reshape(1, 72), (k, 72)
                        ),
                        jnp.broadcast_to(embed, (k, 128)),
                        p3d,
                    ],
                    axis=-1,
                )
                correction_c = self.forward_deform(fused)
                coarse_can = coarse_can + correction_c
            else:
                # aggregated pixel-aligned feature at the (detached)
                # query pts (flagship formulation, ref :374-391)
                if self.pair_mode:
                    _, coarse_world_src, _ = deform_canonical_to_source(
                        smpl, tf_s, coarse_can,
                        nearest_vertex(
                            jax.lax.stop_gradient(coarse_can),
                            sp_input["t_vertices"],
                        )[1],
                        None, self.mean_shape, fused=fused_lbs,
                    )
                    agg_pts = coarse_world_src
                else:
                    # world-space query points of the compacted set
                    agg_pts = jax.lax.stop_gradient(
                        compact(cplan, world_pts) if cplan is not None
                        else world_pts
                    )
                agg = self._view_features(
                    sp_input, latent, agg_pts, fuse=False
                )  # (V, K, C); mean over views of the image channels only
                agg = jnp.mean(
                    agg[..., : self.encoder_2d.latent_channels], axis=0
                )

                fused = jnp.concatenate(
                    [positional_encoding(q_pts, 6), p3d, agg], axis=-1
                )
                correction_c = self.forward_deform(fused)
                coarse_can = coarse_can + correction_c

        # --- tail: everything downstream of the canonical points.  Wrapped
        # as a function of can_pts so the occupancy normal is one vjp call.
        t_vertices = sp_input["t_vertices"]
        instance_idx = tp_input["instance_idx"].astype(jnp.int32).reshape(())

        def tail(can_pts):
            # the 1-NN index is non-differentiable (matches the reference's
            # knn_points semantics) — stop_gradient keeps the vjp clean
            _, vert_ids_c = nearest_vertex(
                jax.lax.stop_gradient(can_pts), t_vertices
            )
            if self.skinning_field:
                # (1,)-shaped index: flax Embed mis-broadcasts scalar
                # indices when num_embeddings == 1
                embed = self.latent_codes(instance_idx[None])[0]  # (128,)
                code = jnp.concatenate(
                    [
                        positional_encoding(can_pts, 6),
                        jnp.broadcast_to(embed, (can_pts.shape[0], 128)),
                    ],
                    axis=-1,
                )
                weights_corr = self.backward_deform(code)
            else:
                weights_corr = None
            smpl_src, world_src, bweights = deform_canonical_to_source(
                smpl, tf_s, can_pts, vert_ids_c, weights_corr,
                self.mean_shape, fused=not train,
            )
            correction_b = jnp.zeros_like(smpl_src)
            if (
                self.correction_field
                and self.correction_style == "instance"
                and not geometry_only
            ):
                # CorrectionBatch's backward correction on the source-pose
                # points (ref skinnning_batch.py:1176-1189): spconv features
                # from the SOURCE posed voxel grid at the (detached) warped
                # points; the corrected smpl_src re-projects to world with
                # the source global transform
                sbounds = sp_input["bounds"]
                s_center = 0.5 * (sbounds[0] + sbounds[1])
                s_half = 0.5 * (sbounds[1] - sbounds[0])
                p3d_s = self.encoder_3d(
                    sp_input["feature"], sp_input["spconv_plan"],
                    jax.lax.stop_gradient((smpl_src - s_center) / s_half),
                    train=train,
                )
                ks = smpl_src.shape[0]
                embed_s = self.latent_codes(
                    sp_input["instance_idx"].astype(jnp.int32).reshape(())[
                        None
                    ]
                )[0]
                fused_b = jnp.concatenate(
                    [
                        positional_encoding(smpl_src, 6),
                        jnp.broadcast_to(
                            sp_params["poses"].reshape(1, 72), (ks, 72)
                        ),
                        jnp.broadcast_to(embed_s, (ks, 128)),
                        p3d_s,
                    ],
                    axis=-1,
                )
                correction_b = self.backward_correction(fused_b)
                smpl_src = smpl_src + correction_b
                world_src = smpl_to_world(smpl_src, tf_s.R, tf_s.Th)
            f1, f2, rgb_s = self._view_features(sp_input, latent, world_src)
            rgb, alpha = self._nerf_mlp(can_pts, f1, f2, q_vd, rgb_s)
            return alpha, (
                rgb, smpl_src, world_src, bweights, vert_ids_c, correction_b
            )

        if compute_normals:
            # One transposed backward pass — the form the reference's
            # autograd.grad takes (skinnning_batch.py:496-500).  A
            # forward-mode variant (3 tangent streams through the tail,
            # reverse-over-forward outer grad) was built and measured
            # round 5: mathematically identical (f64 parity 8e-8) but it
            # OOMs HBM at train capacities (21.6G, 19.5G with remat, vs
            # 15.75G on v5e) and costs 3 streams where this costs 1 —
            # dead end, see ROADMAP.md.
            alpha, vjp_fn, aux = jax.vjp(tail, coarse_can, has_aux=True)
            # occ_normal = d wide_sigmoid(alpha) / d can_pts (ref :499);
            # chain rule through the vjp: cotangent = wide_sigmoid'(alpha)
            s = jax.nn.sigmoid(alpha)
            cot = (1.0 + 2.0 * 1e-4) * s * (1.0 - s)
            (occ_normal,) = vjp_fn(cot)
            # normalize; where the density gradient vanishes (saturated
            # sigmoid) there is no surface normal — gate it to zero.  The
            # reference's bare /(norm + 1e-8) (skinnning_batch.py:500) has
            # a 1/eps gradient blowup there, and sqrt at exactly zero emits
            # NaN cotangents under double backprop — double-where guards.
            n2 = jnp.sum(occ_normal * occ_normal, axis=-1, keepdims=True)
            valid = jax.lax.stop_gradient(n2 > 1e-8)
            denom = jnp.sqrt(jnp.where(valid, n2, 1.0))
            occ_normal = jnp.where(valid, occ_normal / denom, 0.0)
            rgb, smpl_src, world_src, bweights, vert_ids_c, corr_b = aux
            t_normals = vertex_normals(t_vertices, smpl.faces)
            nearest_smpl_normal = t_normals[vert_ids_c]
        else:
            alpha, aux = tail(coarse_can)
            rgb, smpl_src, world_src, bweights, vert_ids_c, corr_b = aux
            k = coarse_can.shape[0]
            occ_normal = jnp.zeros((k, 3), world_pts.dtype)
            nearest_smpl_normal = jnp.zeros((k, 3), world_pts.dtype)

        if cplan is not None:
            # scatter compacted results back to the full point set; the
            # effective mask is ``take`` (valid AND within capacity) ANDed
            # with the branch's own mask (the body-grid path marks
            # beyond-5cm candidates invalid in pts_mask already)
            pts_mask = pts_mask * cplan.take.astype(jnp.int32)
            rgb = expand(cplan, rgb, 0.0)
            alpha = expand(cplan, alpha, 0.0)
            smpl_src = expand(cplan, smpl_src, 0.0)
            world_src = expand(cplan, world_src, 0.0)
            bweights = expand(cplan, bweights, 0.0)
            occ_normal = expand(cplan, occ_normal, 0.0)
            nearest_smpl_normal = expand(cplan, nearest_smpl_normal, 0.0)
            correction = expand(cplan, correction_c, 0.0)
            correction_b_full = expand(cplan, corr_b, 0.0)
        else:
            correction = correction_c
            correction_b_full = corr_b

        # --- mask fill (ref: raw[pts_mask==0] = -80)
        maskf = pts_mask.astype(rgb.dtype)[:, None]
        rgb_out = jnp.where(maskf > 0, rgb, MASK_FILL)
        sigma_out = jnp.where(maskf[:, 0] > 0, alpha, MASK_FILL)

        def zmask(x):
            return x * maskf

        return RawOutput(
            rgb=rgb_out,
            sigma=sigma_out,
            pts_mask=pts_mask,
            correction=zmask(correction),
            correction_=zmask(correction_b_full),
            smpl_query_pts=zmask(smpl_query_pts),
            smpl_src_pts=zmask(smpl_src),
            occ_normal=zmask(occ_normal),
            nearest_smpl_normal=zmask(nearest_smpl_normal),
            world_src_pts=world_src,
            bweights=bweights,
            n_dropped=n_dropped,
        )

    def __call__(self, smpl, sp_input, tp_input, world_pts, viewdirs,
                 train: bool = False, compute_normals: bool = False):
        """Convenience single-shot forward: encode + query."""
        latent = self.encode(sp_input["img_all"], train=train)
        return self.query(
            smpl, sp_input, tp_input, latent, world_pts, viewdirs,
            train=train, compute_normals=compute_normals,
        )
