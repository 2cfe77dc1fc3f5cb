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
            ("correction_batch", {"skinning_field": False}),
            ("correction_batch_blend", {"blend_rgb": True}),
            ("correction_by_f3d", {"correction_field": True}),
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
