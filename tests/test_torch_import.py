"""Reference-checkpoint importer: name mapping, layout orientation, and a
full load into a live model (synthesized torch checkpoint with the real
SKinningBatch key names/shapes)."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from mpsnerf_tpu.compat import (
    convert_reference_state_dict, load_reference_checkpoint,
)
from mpsnerf_tpu.data.synthetic import SyntheticHumanDataset
from mpsnerf_tpu.models.mps_nerf import MPSNeRF
from mpsnerf_tpu.train.trainer import to_device_input


def _synth_reference_state_dict(rng, num_instances=1, feat_ch=155,
                                nerf_in=194):
    """A torch state dict with SKinningBatch's key names and shapes for
    the trained config (resnet stages 1-2, depth-2 transformer, 8x256
    MLP, deform fields)."""
    sd = {}

    def lin(name, i, o):
        sd[name + ".weight"] = torch.from_numpy(
            rng.normal(size=(o, i)).astype(np.float32))
        sd[name + ".bias"] = torch.from_numpy(
            rng.normal(size=(o,)).astype(np.float32))

    def conv(name, i, o, k):
        sd[name + ".weight"] = torch.from_numpy(
            rng.normal(size=(o, i, k, k)).astype(np.float32))

    def bn(name, c):
        for suffix, shape in ((".weight", (c,)), (".bias", (c,)),
                              (".running_mean", (c,)), (".running_var", (c,))):
            sd[name + suffix] = torch.from_numpy(
                np.abs(rng.normal(size=shape)).astype(np.float32))
        sd[name + ".num_batches_tracked"] = torch.tensor(0)

    conv("encoder_2d.model.conv1", 3, 64, 7)
    bn("encoder_2d.model.bn1", 64)
    for b in range(3):
        base = f"encoder_2d.model.layer1.{b}"
        conv(base + ".conv1", 64, 64, 3)
        bn(base + ".bn1", 64)
        conv(base + ".conv2", 64, 64, 3)
        bn(base + ".bn2", 64)

    for i in range(2):
        base = f"transformer.layers.{i}"
        for which in ("0", "1"):
            sd[f"{base}.{which}.fn.norm.weight"] = torch.from_numpy(
                rng.normal(size=(feat_ch,)).astype(np.float32))
            sd[f"{base}.{which}.fn.norm.bias"] = torch.from_numpy(
                rng.normal(size=(feat_ch,)).astype(np.float32))
        sd[f"{base}.0.fn.fn.to_qkv.weight"] = torch.from_numpy(
            rng.normal(size=(768, feat_ch)).astype(np.float32))
        lin(f"{base}.0.fn.fn.to_out.0", 256, feat_ch)
        lin(f"{base}.1.fn.fn.net.0", feat_ch, 128)
        lin(f"{base}.1.fn.fn.net.3", 128, feat_ch)

    lin("pts_linears.0", nerf_in, 256)
    for i in range(1, 8):
        lin(f"pts_linears.{i}", 256 + (nerf_in if i == 5 else 0), 256)
    lin("alpha_linear", 256, 1)
    lin("feature_linear", 256, 256)
    lin("views_linear", 256 + feat_ch, 128)
    lin("rgb_linear", 128, 3)
    sd["latent_codes.weight"] = torch.from_numpy(
        rng.normal(size=(num_instances, 128)).astype(np.float32))

    lin("forward_deform.pts_time_linears.0", 199, 256)
    lin("forward_deform.pts_time_linears.1", 256, 256)
    lin("forward_deform.output_linear", 256, 3)
    lin("backward_deform.pts_time_linears.0", 167, 256)
    for i in range(1, 4):
        lin(f"backward_deform.pts_time_linears.{i}", 256, 256)
    lin("backward_deform.output_linear", 256, 24)
    return sd


class TestConversion:
    def test_linear_orientation_matches_torch(self):
        """A converted Dense must compute exactly what torch.nn.Linear
        computes with the same weights."""
        rng = np.random.default_rng(0)
        w = rng.normal(size=(7, 5)).astype(np.float32)
        b = rng.normal(size=(7,)).astype(np.float32)
        x = rng.normal(size=(4, 5)).astype(np.float32)

        torch_out = torch.nn.functional.linear(
            torch.from_numpy(x), torch.from_numpy(w), torch.from_numpy(b)
        ).numpy()
        from mpsnerf_tpu.compat.torch_import import _t

        ours = x @ _t(w) + b
        np.testing.assert_allclose(ours, torch_out, atol=1e-6)

    def test_full_checkpoint_roundtrip(self, tmp_path):
        rng = np.random.default_rng(1)
        sd = _synth_reference_state_dict(rng)
        tar = tmp_path / "012000.tar"
        torch.save({"global_step": 12000, "network_fn_state_dict": sd}, tar)

        ds = SyntheticHumanDataset(
            n_poses=1, n_cameras=4, image_size=64, n_rays=16, n_verts=300,
            num_instances=1,
        )
        item = ds.get_item(0, instance_idx=0)
        smpl = ds.smpl_for(0)
        inp = to_device_input(item)
        model = MPSNeRF(
            num_instances=1, correction_field=True, skinning_field=True,
        )
        from mpsnerf_tpu.data import attach_spconv_plan

        attach_spconv_plan(item)
        inp = to_device_input(item)
        variables = model.init(
            {"params": jax.random.PRNGKey(0)}, smpl, inp, inp,
            jnp.zeros((8, 3)), jnp.zeros((8, 3)), train=False,
        )

        new_vars, step, report = load_reference_checkpoint(
            str(tar), variables
        )
        assert step == 12000
        assert not report["skipped"], report["skipped"]

        # imported leaves actually landed (spot check a couple)
        got = np.asarray(
            new_vars["params"]["alpha_linear"]["Dense_0"]["kernel"]
        )
        np.testing.assert_allclose(
            got, np.asarray(sd["alpha_linear.weight"]).T, atol=1e-7
        )
        got_bn = np.asarray(
            new_vars["batch_stats"]["encoder_2d"]["bn1"]["mean"]
        )
        np.testing.assert_allclose(
            got_bn, np.asarray(sd["encoder_2d.model.bn1.running_mean"]),
            atol=1e-7,
        )

        # the model still runs with the imported weights
        raw = model.apply(
            new_vars, smpl, inp, inp,
            jnp.zeros((16, 3)), jnp.ones((16, 3)), train=False,
        )
        assert raw.sigma.shape == (16,)

    def test_shape_mismatch_rejected(self, tmp_path):
        rng = np.random.default_rng(2)
        sd = _synth_reference_state_dict(rng)
        sd["alpha_linear.weight"] = torch.zeros((2, 256))
        tar = tmp_path / "bad.tar"
        torch.save({"global_step": 1, "network_fn_state_dict": sd}, tar)

        ds = SyntheticHumanDataset(
            n_poses=1, n_cameras=4, image_size=64, n_rays=16, n_verts=300,
            num_instances=1,
        )
        item = ds.get_item(0, instance_idx=0)
        from mpsnerf_tpu.data import attach_spconv_plan

        attach_spconv_plan(item)
        inp = to_device_input(item)
        smpl = ds.smpl_for(0)
        model = MPSNeRF(
            num_instances=1, correction_field=True, skinning_field=True,
        )
        variables = model.init(
            {"params": jax.random.PRNGKey(0)}, smpl, inp, inp,
            jnp.zeros((8, 3)), jnp.zeros((8, 3)), train=False,
        )
        with pytest.raises(ValueError):
            load_reference_checkpoint(str(tar), variables)


class TestImportedCheckpointServes:
    def test_torch_tar_to_serving_bundle(self, tmp_path):
        """The reference-user migration path end-to-end: a torch ``.tar``
        checkpoint (SKinningBatch key names) -> importer -> AOT serving
        bundle -> served render == live render on the same weights."""
        from mpsnerf_tpu.eval.runner import ViewRenderer
        from mpsnerf_tpu.serve import (
            export_serving_bundle, load_serving_bundle,
        )

        rng = np.random.default_rng(7)
        sd = _synth_reference_state_dict(rng)
        tar = tmp_path / "020000.tar"
        torch.save({"global_step": 20000, "network_fn_state_dict": sd},
                   tar)

        ds = SyntheticHumanDataset(
            n_poses=1, n_cameras=4, image_size=64, n_rays=16,
            n_verts=300, num_instances=1, split="test",
        )
        item = ds.get_item(0, instance_idx=0)
        smpl = ds.smpl_for(0)
        model = MPSNeRF(
            num_instances=1, correction_field=True, skinning_field=True,
        )
        from mpsnerf_tpu.data import attach_spconv_plan

        attach_spconv_plan(item)
        inp = to_device_input(item)
        variables = model.init(
            {"params": jax.random.PRNGKey(0)}, smpl, inp, inp,
            jnp.zeros((8, 3)), jnp.zeros((8, 3)), train=False,
        )
        new_vars, step, report = load_reference_checkpoint(
            str(tar), variables
        )
        assert step == 20000 and not report["skipped"]

        out = str(tmp_path / "bundle")
        gender = int(np.asarray(item["gender"]))
        export_serving_bundle(
            out, model, new_vars, {gender: smpl},
            dict(item), dict(item), chunk=256, n_samples=8,
            global_compact=False, mesh_chunk=0,
        )
        served = load_serving_bundle(out)
        a = served.render_view(dict(item), dict(item), 0)

        live = ViewRenderer(
            model, lambda g: smpl, chunk=256, n_samples=8,
            shuffle_rays=False, global_compact=False,
        )
        b = live.render_view(new_vars, item, item, 0)
        np.testing.assert_allclose(a, np.asarray(b), atol=1e-5)
