"""Model and dataset factories.

Behavioral reference: ``/root/reference/model_selection.py`` —
``return_model`` maps the ``--model`` string to a model class wired from
the global args; ``return_dataset`` maps ``--data_set_type`` to a dataset
class with the split windowing args.
"""

from __future__ import annotations

from typing import Any

from mpsnerf_tpu.models.mps_nerf import MPSNeRF

# model string -> behavior deltas relative to the flagship (the reference's
# variants share the SKinningBatch pipeline with different deform stages;
# see lib/skinnning_batch.py:517 (DirectDeform), :883 (CorrectionBatch),
# :1292 (CoarseBatch), :1637 (CorrectionBatchBlend)).  The numpy-era
# ``correction_by_f3d`` family and ``correction_by_uvh_agg`` (the
# reference's fallthrough default, lib/correction.py:438-751 — reached by
# ANY unrecognized --model string, model_selection.py:84) get their own
# faithful per-sample modules (models/correction_f3d.py).
_MODEL_VARIANTS = {
    "skinning_batch": {},
    # CoarseBatch: pure LBS warp, no correction/skinning fields
    # (lib/skinnning_batch.py:1292 — all deform fields commented out)
    "coarse_batch": {"correction_field": False, "skinning_field": False},
    # CorrectionBatch (lib/skinnning_batch.py:883-1289): instance-style
    # correction field — PE + poses + instance embedding + spconv feature
    # (271 ch, D=4), with BOTH a forward correction on the canonical points
    # (:1152-1165) and a backward correction on the source-pose points
    # (:1176-1189); no skinning field (c2source gets weights_correction=0.)
    "correction_batch": {
        "correction_field": True,
        "skinning_field": False,
        "correction_style": "instance",
    },
    # DirectDeform (lib/skinnning_batch.py:517-880): the NeRF MLP takes the
    # fused 2D feature ONLY — no positional encoding of the canonical pts
    # (``x = point_2d_feature_1``, :832; nerf_input_ch=128(+27), :556).
    # Its declared deform fields are unused in the forward
    # (``weights_correction = 0.``, :795), so both stay off here.
    "direct_deform": {
        "correction_field": False,
        "skinning_field": False,
        "pe_condition": False,
    },
    # CorrectionBatchBlend: blend sampled image rgb via predicted weights
    "correction_batch_blend": {"blend_rgb": True},
}


def return_model(args: Any):
    name = args.model
    if name in ("correction_by_f3d", "correction_by_f3d_fagg"):
        # numpy-era per-sample architecture (lib/correction.py:53-436,
        # model_selection.py:9-20): dual correction fields with joint-
        # offset conditioning, canonical-grid NeRF features, use_f2d
        from mpsnerf_tpu.models.correction_f3d import CorrectionF3D

        return CorrectionF3D(
            use_agg=(name == "correction_by_f3d_fagg"),
            use_f2d=bool(args.use_f2d),
            with_viewdirs=bool(args.with_viewdirs),
            human_sample=bool(args.human_sample),
            use_transformer=bool(args.use_trans),
        )
    if name in ("correction_by_uvh_agg", "correction_by_uvh_agg_fagg"):
        # the reference's fallthrough default (model_selection.py:84 —
        # the bare ``CorrectionByUvhAgg()`` every unrecognized --model
        # string lands on; use_agg=True has no reference spelling, so the
        # ``_fagg`` suffix mirrors the f3d family's convention)
        from mpsnerf_tpu.models.correction_f3d import CorrectionUvhAgg

        return CorrectionUvhAgg(
            use_agg=(name == "correction_by_uvh_agg_fagg"),
            use_f2d=bool(args.use_f2d),
        )
    if name not in _MODEL_VARIANTS:
        raise NotImplementedError(
            f"model '{name}' is not available "
            "(reference: model_selection.py:8-85)"
        )
    extra = dict(_MODEL_VARIANTS[name])
    kwargs = dict(
        num_instances=args.num_instance,
        use_transformer=bool(args.use_trans),
        append_rgb=bool(args.append_rgb),
        with_viewdirs=bool(args.with_viewdirs),
        human_sample=bool(args.human_sample),
        mean_shape=bool(args.mean_shape),
        correction_field=bool(args.correction_field),
        skinning_field=bool(args.skinning_field),
        pair_mode=args.data_set_type in ("H36M_P", "THuman_P"),
        n_input_views=args.view_num,
        compute_dtype=getattr(args, "compute_dtype", "float32"),
        compact_fraction=(
            args.compact_fraction
            if getattr(args, "compact_fraction", None) not in (None, 0)
            else None
        ),
    )
    kwargs.update(extra)
    return MPSNeRF(**kwargs)


def return_dataset(args: Any, split: str | None = None):
    """Instantiate the training dataset for ``--data_set_type``."""
    split = split or args.train_split
    dst = args.data_set_type

    if dst == "Synthetic":
        from mpsnerf_tpu.data.synthetic import SyntheticHumanDataset

        return SyntheticHumanDataset(
            n_poses=args.poses_num,
            n_cameras=6,
            image_size=int(512 * args.image_scaling),
            n_rays=args.N_rand,
            num_instances=args.num_instance,
            split=split,
        )

    if dst in ("THuman_B", "THuman"):
        from mpsnerf_tpu.data.thuman import THumanDataset, THumanDatasetBatch

        cls = THumanDatasetBatch if dst == "THuman_B" else THumanDataset
        return cls(
            args.data_root,
            split=split,
            view_num=args.view_num,
            N_rand=args.N_rand,
            multi_person=bool(args.multi_person),
            num_instance=args.num_instance,
            start=args.start,
            interval=args.interval,
            poses_num=args.poses_num,
            male=args.male,
            mean_shape=args.mean_shape,
            image_scaling=args.image_scaling,
            model=args.model,
        )

    if dst == "THuman_B_R":
        from mpsnerf_tpu.data.thuman import THumanDatasetBatchRandom

        return THumanDatasetBatchRandom(
            args.data_root,
            split=split,
            view_num=args.view_num,
            N_rand=args.N_rand,
            multi_person=bool(args.multi_person),
            num_instance=args.num_instance,
            start=args.start,
            interval=args.interval,
            poses_num=args.poses_num,
            male=args.male,
            mean_shape=args.mean_shape,
            image_scaling=args.image_scaling,
        )

    if dst == "THuman_P":
        from mpsnerf_tpu.data.thuman import THumanDatasetPair

        return THumanDatasetPair(
            args.data_root,
            split=split,
            view_num=args.view_num,
            border=args.border,
            N_rand=args.N_rand,
            multi_person=bool(args.multi_person),
            num_instance=args.num_instance,
            start=args.start,
            interval=args.interval,
            poses_num=args.poses_num,
            random_pair=bool(args.random_pair),
            male=args.male,
            mean_shape=args.mean_shape,
            image_scaling=args.image_scaling,
        )

    if dst in ("H36M_B", "H36M", "H36M_B_All"):
        from mpsnerf_tpu.data.h36m import (
            H36MDataset, H36MDatasetBatch, H36MDatasetBatchAll,
        )

        cls = {"H36M_B": H36MDatasetBatch, "H36M": H36MDataset,
               "H36M_B_All": H36MDatasetBatchAll}[dst]
        return cls(
            args.data_root,
            split=split,
            view_num=args.view_num,
            N_rand=args.N_rand,
            multi_person=bool(args.multi_person),
            num_instance=args.num_instance,
            start=args.start,
            interval=args.interval,
            poses_num=args.poses_num,
            mean_shape=args.mean_shape,
            image_scaling=args.image_scaling,
            new_mask=args.new_mask,
        )

    if dst == "H36M_P":
        from mpsnerf_tpu.data.h36m import H36MDatasetPair

        return H36MDatasetPair(
            args.data_root,
            split=split,
            view_num=args.view_num,
            border=args.border,
            N_rand=args.N_rand,
            multi_person=bool(args.multi_person),
            num_instance=args.num_instance,
            start=args.start,
            interval=args.interval,
            poses_num=args.poses_num,
            random_pair=bool(args.random_pair),
            mean_shape=args.mean_shape,
            image_scaling=args.image_scaling,
        )

    raise NotImplementedError(
        f"data_set_type '{dst}' is not available "
        "(reference: model_selection.py:88-230)"
    )
