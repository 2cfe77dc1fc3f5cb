"""bf16 compute-path parity: the "bfloat16" compute dtype must agree with
fp32 to bf16 rounding error while sharing the same fp32 parameters.

The reference runs fp32 end-to-end (AMP wired but disabled,
run_nerf_batch.py:486); here "bfloat16" is the TPU-native fast path for
the NeRF-MLP/transformer matmuls, with params, geometry, and compositing
kept fp32.  These tests bound the deviation on composited pixels.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mpsnerf_tpu.data.synthetic import SyntheticHumanDataset
from mpsnerf_tpu.models.mps_nerf import MPSNeRF
from mpsnerf_tpu.renderer.render import render_rays
from mpsnerf_tpu.train.trainer import to_device_input


@pytest.fixture(scope="module")
def scene():
    ds = SyntheticHumanDataset(
        n_poses=1, n_cameras=4, image_size=64, n_rays=64, n_verts=500,
        num_instances=1,
    )
    item = ds.get_item(0, instance_idx=0)
    return ds.smpl_for(0), to_device_input(item)


def _models():
    kw = dict(num_instances=1, compact_fraction=0.5)
    return (
        MPSNeRF(compute_dtype="float32", **kw),
        MPSNeRF(compute_dtype="bfloat16", **kw),
    )


class TestBf16Parity:
    def test_same_param_tree(self, scene):
        """Params must be identical fp32 trees (dtype only changes
        compute), so fp32-trained checkpoints load into the bf16 model."""
        smpl, inp = scene
        m32, m16 = _models()
        pts = jnp.zeros((8, 3))
        dirs = jnp.ones((8, 3))
        v32 = m32.init({"params": jax.random.PRNGKey(0)}, smpl, inp, inp,
                       pts, dirs, train=False)
        v16 = m16.init({"params": jax.random.PRNGKey(0)}, smpl, inp, inp,
                       pts, dirs, train=False)
        jax.tree.map(
            lambda a, b: (
                np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
                _assert_f32(a),
            ),
            v32["params"], v16["params"],
        )

    def test_raw_outputs_close(self, scene):
        smpl, inp = scene
        m32, m16 = _models()
        rng = np.random.default_rng(0)
        verts = np.asarray(inp["vertices"])
        pts = jnp.asarray(verts[rng.integers(0, len(verts), 256)],
                          jnp.float32)
        dirs = jnp.ones((256, 3)) / np.sqrt(3.0)
        variables = m32.init({"params": jax.random.PRNGKey(0)}, smpl, inp,
                             inp, pts, dirs, train=False)
        r32 = m32.apply(variables, smpl, inp, inp, pts, dirs, train=False)
        r16 = m16.apply(variables, smpl, inp, inp, pts, dirs, train=False)
        assert r16.rgb.dtype == jnp.float32  # outputs stay fp32
        mask = np.asarray(r32.pts_mask) == 1
        assert (np.asarray(r16.pts_mask) == np.asarray(r32.pts_mask)).all()
        # pre-activation raw values agree to bf16 rounding through 8 layers
        np.testing.assert_allclose(
            np.asarray(r16.rgb)[mask], np.asarray(r32.rgb)[mask], atol=0.05
        )
        np.testing.assert_allclose(
            np.asarray(r16.sigma)[mask], np.asarray(r32.sigma)[mask],
            atol=0.05,
        )

    def test_composited_pixels_close(self, scene):
        """End-to-end: rendered pixels (post sigmoid/softplus compositing)
        from the bf16 path must sit within ~1/255 of fp32 — invisible at
        8-bit output."""
        smpl, inp = scene
        m32, m16 = _models()
        k = 1
        ro = jnp.asarray(inp["ray_o_all"][k][:256])
        rd = jnp.asarray(inp["ray_d_all"][k][:256])
        nr = jnp.asarray(inp["near_all"][k][:256]).reshape(-1)
        fr = jnp.asarray(inp["far_all"][k][:256]).reshape(-1)
        pts = jnp.zeros((8, 3))
        variables = m32.init({"params": jax.random.PRNGKey(0)}, smpl, inp,
                             inp, pts, jnp.ones((8, 3)), train=False)
        latent = m32.apply(variables, inp["img_all"], train=False,
                           method="encode")
        outs = []
        for m in (m32, m16):
            out = render_rays(
                m, variables, smpl, inp, inp, latent, ro, rd, nr, fr,
                jax.random.PRNGKey(0), n_samples=16, perturb=0.0,
                train=False,
            )
            outs.append(np.asarray(out.rgb_map))
        err = np.abs(outs[0] - outs[1]).max()
        assert err < 1.0 / 255.0, f"bf16 pixel deviation {err}"


def _assert_f32(x):
    assert x.dtype == jnp.float32
    return x
