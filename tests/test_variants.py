"""Model-variant coverage: factory mapping + blend-RGB head."""

import argparse

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mpsnerf_tpu.config import parse_args
from mpsnerf_tpu.factory import return_model
from mpsnerf_tpu.data.synthetic import SyntheticHumanDataset
from mpsnerf_tpu.models.mps_nerf import MPSNeRF
from mpsnerf_tpu.train.trainer import to_device_input, Trainer, TrainConfig


@pytest.fixture(scope="module")
def scene():
    ds = SyntheticHumanDataset(
        n_poses=1, n_cameras=4, image_size=64, n_rays=32, n_verts=400,
        num_instances=1,
    )
    item = ds.get_item(0, instance_idx=0)
    return ds, ds.smpl_for(0), to_device_input(item)


class TestFactory:
    @pytest.mark.parametrize(
        "name,expect",
        [
            ("skinning_batch", {}),
            ("coarse_batch", {"correction_field": False}),
            (
                "correction_batch",
                {
                    "skinning_field": False,
                    "correction_field": True,
                    "correction_style": "instance",
                },
            ),
            ("correction_batch_blend", {"blend_rgb": True}),
            # correction_by_f3d and correction_by_uvh_agg build their own
            # faithful modules — covered by tests/test_correction_f3d.py
            # factory-name tests
            (
                "direct_deform",
                {
                    "pe_condition": False,
                    "correction_field": False,
                    "skinning_field": False,
                },
            ),
        ],
    )
    def test_known_models(self, name, expect):
        args = parse_args(["--model", name, "--num_instance", "2"])
        m = return_model(args)
        assert isinstance(m, MPSNeRF)
        for k, v in expect.items():
            assert getattr(m, k) == v

    def test_unknown_model_raises(self):
        args = parse_args(["--model", "nope"])
        with pytest.raises(NotImplementedError):
            return_model(args)


def _query_pts(inp, n=64, seed=0):
    rng = np.random.default_rng(seed)
    verts = np.asarray(inp["vertices"])
    pts = jnp.asarray(verts[rng.integers(0, len(verts), n)], jnp.float32)
    dirs = jnp.ones((n, 3)) / np.sqrt(3.0)
    return pts, dirs


class TestDirectDeform:
    """DirectDeform conditions the NeRF MLP on the 2D feature only — no
    positional encoding of the canonical points (ref skinnning_batch.py:
    556, 832) — and applies no deform fields (:795)."""

    def test_mlp_input_has_no_pe(self, scene):
        _, smpl, inp = scene
        flag = MPSNeRF(num_instances=1)
        dd = MPSNeRF(
            num_instances=1, pe_condition=False,
            correction_field=False, skinning_field=False,
        )
        pts, dirs = _query_pts(inp, 8)
        v_f = flag.init({"params": jax.random.PRNGKey(0)}, smpl, inp, inp,
                        pts, dirs, train=False)
        v_d = dd.init({"params": jax.random.PRNGKey(0)}, smpl, inp, inp,
                      pts, dirs, train=False)
        in_f = v_f["params"]["pts_linear_0"]["Dense_0"]["kernel"].shape[0]
        in_d = v_d["params"]["pts_linear_0"]["Dense_0"]["kernel"].shape[0]
        assert in_f - in_d == 39  # PE(xyz, 6 freqs, include_input) = 39 ch

    def test_forward_differs_from_flagship(self, scene):
        _, smpl, inp = scene
        dd = MPSNeRF(
            num_instances=1, pe_condition=False,
            correction_field=False, skinning_field=False,
        )
        pts, dirs = _query_pts(inp)
        variables = dd.init({"params": jax.random.PRNGKey(0)}, smpl, inp,
                            inp, pts, dirs, train=False)
        raw = dd.apply(variables, smpl, inp, inp, pts, dirs, train=False)
        assert np.isfinite(np.asarray(raw.sigma)).all()
        # translating every canonical point the same way must not change
        # the MLP output pathway through PE — here there IS no PE input,
        # so sigma depends on can_pts only through the warp/projection
        assert np.asarray(raw.pts_mask).sum() > 0


class TestCorrectionBatchInstanceStyle:
    """CorrectionBatch (ref skinnning_batch.py:883-1289): 271-ch instance
    fusion, forward + backward corrections."""

    @pytest.fixture(scope="class")
    def cb(self, scene):
        from mpsnerf_tpu.data import attach_spconv_plan

        ds, smpl, _ = scene
        item = ds.get_item(0, instance_idx=0)
        attach_spconv_plan(item)
        inp = to_device_input(item)
        model = MPSNeRF(
            num_instances=1, correction_field=True, skinning_field=False,
            correction_style="instance",
        )
        pts, dirs = _query_pts(inp)
        variables = model.init({"params": jax.random.PRNGKey(0)}, smpl,
                               inp, inp, pts, dirs, train=False)
        return model, variables, smpl, inp

    def test_fusion_input_width_is_271(self, cb):
        model, variables, *_ = cb
        p = variables["params"]
        assert "backward_correction" in p
        for field in ("forward_deform", "backward_correction"):
            k = p[field]["fc0"]["Dense_0"]["kernel"]
            assert k.shape[0] == 39 + 72 + 128 + 32  # PE+poses+embed+f3d

    def test_corrections_zero_at_init_then_active(self, cb):
        """Zero-init output layers start at the pure LBS warp (parity with
        the reference's DeformField init); perturbing them must move BOTH
        the forward and backward corrections."""
        model, variables, smpl, inp = cb
        pts, dirs = _query_pts(inp)
        raw0 = model.apply(variables, smpl, inp, inp, pts, dirs, train=False)
        mask = np.asarray(raw0.pts_mask) == 1
        assert mask.sum() > 0
        assert np.allclose(np.asarray(raw0.correction)[mask], 0.0)
        assert np.allclose(np.asarray(raw0.correction_)[mask], 0.0)

        p = jax.tree.map(lambda x: x, variables["params"])  # shallow copy
        for field in ("forward_deform", "backward_correction"):
            out = dict(p[field]["out"]["Dense_0"])
            out["bias"] = out["bias"] + 0.01
            p[field] = {**p[field], "out": {"Dense_0": out}}
        raw1 = model.apply(
            {**variables, "params": p}, smpl, inp, inp, pts, dirs,
            train=False,
        )
        c_f = np.asarray(raw1.correction)[mask]
        c_b = np.asarray(raw1.correction_)[mask]
        assert np.abs(c_f).max() > 1e-4
        assert np.abs(c_b).max() > 1e-4
        # the backward correction shifts the source-pose points it reports
        d = np.asarray(raw1.smpl_src_pts)[mask] - np.asarray(
            raw0.smpl_src_pts
        )[mask]
        assert np.abs(d).max() > 1e-4


class TestBlendRGB:
    def test_blend_rgb_trains_and_blends(self, scene):
        _, smpl, inp = scene
        model = MPSNeRF(num_instances=1, blend_rgb=True, n_input_views=3)
        variables = model.init(
            {"params": jax.random.PRNGKey(0)}, smpl, inp, inp,
            jnp.zeros((8, 3)), jnp.zeros((8, 3)), train=False,
        )
        # rgb head emits V=3 blend weights
        assert variables["params"]["rgb_linear"]["Dense_0"]["kernel"].shape[-1] == 3

        cfg = TrainConfig(n_samples=8, smooth_loss=False)
        trainer = Trainer(model, cfg, variables)
        logs = trainer.train_item(smpl, inp, inp, jax.random.PRNGKey(1))
        assert np.isfinite(logs["loss"])

    def test_blended_rgb_is_convex_combination(self, scene):
        """On in-body points the raw rgb must lie within the range of the
        per-view sampled image values (softmax blend property)."""
        _, smpl, inp = scene
        model = MPSNeRF(num_instances=1, blend_rgb=True, n_input_views=3)
        variables = model.init(
            {"params": jax.random.PRNGKey(0)}, smpl, inp, inp,
            jnp.zeros((8, 3)), jnp.zeros((8, 3)), train=False,
        )
        rng = np.random.default_rng(0)
        verts = np.asarray(inp["vertices"])
        pts = jnp.asarray(
            verts[rng.integers(0, len(verts), 64)], jnp.float32
        )
        raw = model.apply(
            variables, smpl, inp, inp, pts, jnp.ones((64, 3)), train=False,
        )
        mask = np.asarray(raw.pts_mask) == 1
        rgb = np.asarray(raw.rgb)[mask]
        # image rgb lives in [0, 1]; a convex blend must too
        assert rgb.min() >= -1e-5 and rgb.max() <= 1.0 + 1e-5
