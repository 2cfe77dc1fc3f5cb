"""Fused Pallas tail: parity vs the model's XLA transformer+MLP path.

Three-way check on identical weights/inputs:
  model path (flax)  ==  tail_reference (XLA twin)  ==  tail_fused
The reference twin is also the kernel's backward, so gradient semantics
are the XLA path's by construction.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mpsnerf_tpu.models.mps_nerf import MPSNeRF
from mpsnerf_tpu.ops.fused_tail import (
    extract_tail_weights,
    tail_fused,
    tail_reference,
)


@pytest.fixture(scope="module")
def setup():
    model = MPSNeRF(num_instances=1, compute_dtype="bfloat16")
    n = 1024
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.standard_normal((3, n, 155)).astype(np.float32))
    pts = jnp.asarray(
        rng.uniform(-1.2, 1.2, (n, 3)).astype(np.float32)
    )

    # init the transformer+MLP params through a throwaway forward
    tf_vars = model.transformer.init(jax.random.PRNGKey(0), feats) \
        if False else None
    # full-module init (builds every tail layer with the real names)
    from mpsnerf_tpu.data.synthetic import SyntheticHumanDataset
    from mpsnerf_tpu.train.trainer import to_device_input

    ds = SyntheticHumanDataset(
        n_poses=1, n_cameras=4, image_size=32, n_rays=16, n_verts=200,
        num_instances=1,
    )
    item = ds.get_item(0, instance_idx=0)
    smpl = ds.smpl_for(0)
    inp = to_device_input(item)
    variables = model.init(
        {"params": jax.random.PRNGKey(0)}, smpl, inp, inp,
        jnp.zeros((8, 3)), jnp.zeros((8, 3)), train=False,
    )
    return model, variables, feats, pts


def _model_path(model, variables, feats, pts):
    fused = model.apply(
        variables, feats, method=lambda m, f: m.transformer(f)
    )
    f1, f2 = fused[0], fused[1]
    rgb, alpha = model.apply(
        variables, pts, f1, f2,
        method=lambda m, p, a, b: m._nerf_mlp(p, a, b, None),
    )
    return np.asarray(rgb), np.asarray(alpha)


class TestFusedTail:
    def test_reference_matches_model(self, setup):
        model, variables, feats, pts = setup
        w = extract_tail_weights(variables["params"])
        rgb_m, alpha_m = _model_path(model, variables, feats, pts)
        rgb_r, alpha_r = tail_reference(w, feats, pts)
        # same op sequence at the same dtypes -> tight tolerance (bf16
        # rounding composes slightly differently through jnp.stack)
        np.testing.assert_allclose(
            np.asarray(rgb_r), rgb_m, atol=5e-3, rtol=0
        )
        np.testing.assert_allclose(
            np.asarray(alpha_r), alpha_m, atol=5e-3, rtol=0
        )

    def test_kernel_matches_reference(self, setup):
        model, variables, feats, pts = setup
        w = extract_tail_weights(variables["params"])
        rgb_r, alpha_r = tail_reference(w, feats, pts)
        rgb_k, alpha_k = tail_fused(w, feats, pts, True)  # interpret
        np.testing.assert_allclose(
            np.asarray(rgb_k), np.asarray(rgb_r), atol=5e-3, rtol=0
        )
        np.testing.assert_allclose(
            np.asarray(alpha_k), np.asarray(alpha_r), atol=5e-3, rtol=0
        )

    def test_model_query_with_fused_tail(self, setup, monkeypatch):
        """End-to-end: MPSNeRF.query with the fused tail forced (interpret
        mode) matches the XLA path on rgb/sigma."""
        from mpsnerf_tpu.data.synthetic import SyntheticHumanDataset
        from mpsnerf_tpu.train.trainer import to_device_input

        model, variables, _, _ = setup
        ds = SyntheticHumanDataset(
            n_poses=1, n_cameras=4, image_size=32, n_rays=16, n_verts=200,
            num_instances=1,
        )
        item = ds.get_item(0, instance_idx=0)
        smpl = ds.smpl_for(0)
        inp = to_device_input(item)
        latent = model.apply(
            variables, inp["img_all"], train=False, method=MPSNeRF.encode
        )
        rng = np.random.default_rng(1)
        lo, hi = np.asarray(item["bounds"])
        pts = jnp.asarray(
            rng.uniform(lo - 0.05, hi + 0.05, (1024, 3)).astype(np.float32)
        )
        vd = jnp.asarray(
            rng.standard_normal((1024, 3)).astype(np.float32)
        )

        def q():
            # closes over ``model`` — rebinding it below switches paths
            return model.apply(
                variables, smpl, inp, inp, latent, pts, vd,
                train=False, method=MPSNeRF.query,
            )

        base = q()
        # fused_tail is a construction-time model field now (the env var
        # is read once in the field default) — select it via clone
        model = model.clone(fused_tail="force")
        fused = q()
        body = np.asarray(base.pts_mask) > 0
        assert body.any()
        np.testing.assert_allclose(
            np.asarray(fused.sigma)[body], np.asarray(base.sigma)[body],
            atol=5e-3,
        )
        np.testing.assert_allclose(
            np.asarray(fused.rgb)[body], np.asarray(base.rgb)[body],
            atol=5e-3,
        )
        # masked points keep the exact -80 fill
        np.testing.assert_array_equal(
            np.asarray(fused.sigma)[~body], np.asarray(base.sigma)[~body]
        )

    def test_v2_twin_matches_feats_reference(self, setup):
        """tail_reference_patches (combine+PE in the twin) == building the
        feature stack by hand and calling tail_reference."""
        from mpsnerf_tpu.ops.fused_tail import (
            tail_reference_patches, RGB_FREQS,
        )
        from mpsnerf_tpu.ops.positional import positional_encoding

        model, variables, _, pts = setup
        w = extract_tail_weights(variables["params"])
        n = pts.shape[0]
        rng = np.random.default_rng(3)
        c = 128
        patches = jnp.asarray(
            rng.standard_normal((3, n, 4 * c)).astype(np.float32)
        )
        wx = jnp.asarray(rng.uniform(0, 1, (3, n, 1)).astype(np.float32))
        wy = jnp.asarray(rng.uniform(0, 1, (3, n, 1)).astype(np.float32))
        rgb_s = jnp.asarray(
            rng.uniform(0, 1, (3, n, 3)).astype(np.float32)
        )

        lat = (
            patches[..., 0 * c:1 * c] * (1 - wx) * (1 - wy)
            + patches[..., 1 * c:2 * c] * wx * (1 - wy)
            + patches[..., 2 * c:3 * c] * (1 - wx) * wy
            + patches[..., 3 * c:4 * c] * wx * wy
        )
        feats = jnp.concatenate(
            [lat, positional_encoding(rgb_s, RGB_FREQS)], axis=-1
        )
        rgb_r, alpha_r = tail_reference(w, feats, pts)
        rgb_p, alpha_p = tail_reference_patches(
            w, patches, wx, wy, rgb_s, pts
        )
        # the twin's sequential combine rounds fp32 slightly differently
        # from the broadcast expression above; after the bf16 cast that is
        # at most one bf16 ulp on a fraction of elements
        np.testing.assert_allclose(
            np.asarray(rgb_p), np.asarray(rgb_r), atol=2e-3, rtol=0
        )
        np.testing.assert_allclose(
            np.asarray(alpha_p), np.asarray(alpha_r), atol=2e-3, rtol=0
        )

    def test_v2_kernel_matches_twin(self, setup):
        from mpsnerf_tpu.ops.fused_tail import (
            tail_fused_patches, tail_reference_patches,
        )

        model, variables, _, pts = setup
        w = extract_tail_weights(variables["params"])
        n = pts.shape[0]
        rng = np.random.default_rng(4)
        c = 128
        patches = jnp.asarray(
            rng.standard_normal((3, n, 4 * c)).astype(np.float32)
        )
        wx = jnp.asarray(rng.uniform(0, 1, (3, n, 1)).astype(np.float32))
        wy = jnp.asarray(rng.uniform(0, 1, (3, n, 1)).astype(np.float32))
        rgb_s = jnp.asarray(
            rng.uniform(0, 1, (3, n, 3)).astype(np.float32)
        )
        rgb_r, alpha_r = tail_reference_patches(
            w, patches, wx, wy, rgb_s, pts
        )
        rgb_k, alpha_k = tail_fused_patches(
            w, patches, wx, wy, rgb_s, pts, True  # interpret
        )
        np.testing.assert_allclose(
            np.asarray(rgb_k), np.asarray(rgb_r), atol=5e-3, rtol=0
        )
        np.testing.assert_allclose(
            np.asarray(alpha_k), np.asarray(alpha_r), atol=5e-3, rtol=0
        )

    def test_v2_backward_is_reference_grad(self, setup):
        from mpsnerf_tpu.ops.fused_tail import (
            tail_fused_patches, tail_reference_patches,
        )

        model, variables, _, pts = setup
        w = extract_tail_weights(variables["params"])
        n = pts.shape[0]
        rng = np.random.default_rng(5)
        c = 128
        args = (
            jnp.asarray(
                rng.standard_normal((3, n, 4 * c)).astype(np.float32)
            ),
            jnp.asarray(rng.uniform(0, 1, (3, n, 1)).astype(np.float32)),
            jnp.asarray(rng.uniform(0, 1, (3, n, 1)).astype(np.float32)),
            jnp.asarray(rng.uniform(0, 1, (3, n, 3)).astype(np.float32)),
            pts,
        )

        def loss_fused(w_, *a):
            rgb, alpha = tail_fused_patches(w_, *a, True)
            return jnp.sum(rgb) + jnp.sum(alpha * 0.5)

        def loss_ref(w_, *a):
            rgb, alpha = tail_reference_patches(w_, *a)
            return jnp.sum(rgb) + jnp.sum(alpha * 0.5)

        g_f = jax.grad(loss_fused, argnums=(1, 5))(w, *args)
        g_r = jax.grad(loss_ref, argnums=(1, 5))(w, *args)
        for a, b in zip(jax.tree.leaves(g_f), jax.tree.leaves(g_r)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-6
            )

    def test_backward_is_reference_grad(self, setup):
        """The custom VJP must equal grads of tail_reference exactly."""
        model, variables, feats, pts = setup
        w = extract_tail_weights(variables["params"])

        def loss_fused(w_, f_, p_):
            rgb, alpha = tail_fused(w_, f_, p_, True)
            return jnp.sum(rgb) + jnp.sum(alpha * 0.5)

        def loss_ref(w_, f_, p_):
            rgb, alpha = tail_reference(w_, f_, p_)
            return jnp.sum(rgb) + jnp.sum(alpha * 0.5)

        g_f = jax.grad(loss_fused, argnums=(1, 2))(w, feats, pts)
        g_r = jax.grad(loss_ref, argnums=(1, 2))(w, feats, pts)
        for a, b in zip(jax.tree.leaves(g_f), jax.tree.leaves(g_r)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-6
            )
