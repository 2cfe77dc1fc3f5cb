"""Correction-field and skinning-field variants train end-to-end."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mpsnerf_tpu.data.synthetic import SyntheticHumanDataset
from mpsnerf_tpu.data import attach_spconv_plan
from mpsnerf_tpu.models.mps_nerf import MPSNeRF
from mpsnerf_tpu.train.trainer import Trainer, TrainConfig, to_device_input


@pytest.fixture(scope="module")
def scene():
    ds = SyntheticHumanDataset(
        n_poses=1, n_cameras=4, image_size=64, n_rays=32, n_verts=400,
        num_instances=2,
    )
    item = ds.get_item(0, instance_idx=0)
    attach_spconv_plan(item)
    return ds, ds.smpl_for(0), to_device_input(item)


@pytest.mark.parametrize(
    "fields",
    [
        {"correction_field": True, "skinning_field": False},
        {"correction_field": False, "skinning_field": True},
        {"correction_field": True, "skinning_field": True},
    ],
    ids=["correction", "skinning", "both"],
)
def test_field_variant_trains(scene, fields):
    _, smpl, inp = scene
    model = MPSNeRF(num_instances=2, **fields)
    variables = model.init(
        {"params": jax.random.PRNGKey(0)}, smpl, inp, inp,
        jnp.zeros((8, 3)), jnp.zeros((8, 3)), train=False,
    )
    cfg = TrainConfig(
        n_samples=8, smooth_loss=False,
        correction_loss=fields["correction_field"],
    )
    trainer = Trainer(model, cfg, variables)
    logs = trainer.train_item(smpl, inp, inp, jax.random.PRNGKey(1))
    assert np.isfinite(logs["loss"])


def test_correction_starts_at_zero(scene):
    """Zero-init correction head: the first forward must equal the pure
    LBS warp (the canonical points are unchanged)."""
    _, smpl, inp = scene
    m_corr = MPSNeRF(num_instances=2, correction_field=True)
    m_plain = MPSNeRF(num_instances=2, correction_field=False)
    variables = m_corr.init(
        {"params": jax.random.PRNGKey(0)}, smpl, inp, inp,
        jnp.zeros((8, 3)), jnp.zeros((8, 3)), train=False,
    )
    # plain model shares every non-correction parameter name
    plain_params = {
        k: v for k, v in variables["params"].items()
        if k not in ("encoder_3d", "forward_deform")
    }
    plain_vars = {
        "params": plain_params,
        "batch_stats": {
            k: v for k, v in variables["batch_stats"].items()
            if k != "encoder_3d"
        },
    }
    rng = np.random.default_rng(0)
    verts = np.asarray(inp["vertices"])
    pts = jnp.asarray(
        verts[rng.integers(0, len(verts), 64)]
        + rng.normal(size=(64, 3)) * 0.01,
        jnp.float32,
    )
    dirs = jnp.ones((64, 3))
    r1 = m_corr.apply(variables, smpl, inp, inp, pts, dirs, train=False)
    r2 = m_plain.apply(plain_vars, smpl, inp, inp, pts, dirs, train=False)
    np.testing.assert_allclose(
        np.asarray(r1.sigma), np.asarray(r2.sigma), atol=1e-5
    )
    np.testing.assert_allclose(np.asarray(r1.correction), 0.0, atol=1e-7)
