"""Kernel / op parity tests: KNN, grid-sample (vs torch oracle), PE,
compositing (vs independent numpy implementation)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as TF

from mpsnerf_tpu.ops.knn import (
    nearest_vertex_xla,
    nearest_vertex_pallas,
    knn_points,
)
from mpsnerf_tpu.ops.grid_sample import grid_sample_2d, grid_sample_3d, index_features
from mpsnerf_tpu.ops.positional import positional_encoding, pe_dim
from mpsnerf_tpu.ops.composite import (
    composite_rays,
    stratified_z_vals,
    sample_pdf,
    shifted_softplus,
    wide_sigmoid,
)


class TestKNN:
    def _brute(self, q, v):
        d = ((q[:, None, :] - v[None, :, :]) ** 2).sum(-1)
        return d.min(1), d.argmin(1)

    def _check(self, ids, d2, q, v, atol=1e-4):
        """Argmin ties between the matmul form and the diff form can flip on
        fp noise — require the *distance* to match the true min; the chosen
        vertex must be a (near-)minimizer."""
        bd, bi = self._brute(q, v)
        chosen = ((q - v[np.asarray(ids)]) ** 2).sum(-1)
        np.testing.assert_allclose(chosen, bd, atol=atol)
        np.testing.assert_allclose(np.asarray(d2), bd, atol=atol)
        assert (np.asarray(ids) == bi).mean() > 0.95

    def test_xla_matches_bruteforce(self):
        rng = np.random.default_rng(0)
        q = rng.normal(size=(777, 3)).astype(np.float32)
        v = rng.normal(size=(250, 3)).astype(np.float32)
        d2, ids = nearest_vertex_xla(jnp.asarray(q), jnp.asarray(v))
        self._check(ids, d2, q, v)

    def test_pallas_interpret_matches_xla(self):
        rng = np.random.default_rng(1)
        q = rng.normal(size=(600, 3)).astype(np.float32)
        v = rng.normal(size=(300, 3)).astype(np.float32)
        d2p, idp = nearest_vertex_pallas(
            jnp.asarray(q), jnp.asarray(v), interpret=True
        )
        self._check(idp, d2p, q, v, atol=1e-3)

    def test_knn_k5(self):
        rng = np.random.default_rng(2)
        q = rng.normal(size=(100, 3)).astype(np.float32)
        v = rng.normal(size=(200, 3)).astype(np.float32)
        d2, ids = knn_points(jnp.asarray(q), jnp.asarray(v), k=5)
        d = ((q[:, None, :] - v[None, :, :]) ** 2).sum(-1)
        ref_ids = np.argsort(d, axis=1)[:, :5]
        ref_d = np.take_along_axis(d, ref_ids, axis=1)
        np.testing.assert_allclose(np.sort(np.asarray(d2), 1), np.sort(ref_d, 1), atol=1e-4)


class TestGridSample2D:
    def test_matches_torch_border_align_corners(self):
        rng = np.random.default_rng(0)
        img = rng.normal(size=(2, 4, 9, 7)).astype(np.float32)
        coords = rng.uniform(-1.3, 1.3, size=(2, 50, 2)).astype(np.float32)

        ours = np.asarray(grid_sample_2d(jnp.asarray(img), jnp.asarray(coords)))

        t = TF.grid_sample(
            torch.from_numpy(img),
            torch.from_numpy(coords)[:, :, None, :],
            mode="bilinear",
            padding_mode="border",
            align_corners=True,
        )[:, :, :, 0].numpy()
        np.testing.assert_allclose(ours, t, atol=1e-5)

    def test_patch_gather_matches_4corner(self):
        """grid_sample_2d_patch must be bit-identical to grid_sample_2d,
        including far-out-of-range coords (border replicate) and exact
        integer positions (the w-2 start-clip edge case)."""
        from mpsnerf_tpu.ops.grid_sample import grid_sample_2d_patch

        rng = np.random.default_rng(1)
        img = rng.normal(size=(3, 5, 9, 7)).astype(np.float32)
        coords = np.concatenate(
            [
                rng.uniform(-1.3, 1.3, size=(3, 40, 2)),
                rng.uniform(-4.0, 4.0, size=(3, 10, 2)),  # far outside
                np.tile([[1.0, 1.0], [-1.0, -1.0], [1.0, -1.0]], (3, 1))
                .reshape(3, 3, 2),  # exact corners
            ],
            axis=1,
        ).astype(np.float32)
        a = np.asarray(grid_sample_2d(jnp.asarray(img), jnp.asarray(coords)))
        b = np.asarray(
            grid_sample_2d_patch(jnp.asarray(img), jnp.asarray(coords))
        )
        np.testing.assert_allclose(a, b, atol=1e-6, rtol=1e-6)

    def test_patch_gather_grads_match_4corner(self):
        """The custom VJP must produce the 4-corner formulation's exact
        gradients for both image and coords (incl. border coords where
        the patch form's weight clip would otherwise zero coord grads)."""
        from mpsnerf_tpu.ops.grid_sample import grid_sample_2d_patch

        rng = np.random.default_rng(3)
        img = rng.normal(size=(2, 3, 6, 5)).astype(np.float32)
        coords = np.concatenate(
            [
                rng.uniform(-0.9, 0.9, size=(2, 20, 2)),
                rng.uniform(0.95, 1.4, size=(2, 8, 2)),  # at/past border
            ],
            axis=1,
        ).astype(np.float32)
        cot = rng.normal(size=(2, 3, 28)).astype(np.float32)

        def loss(fn, i, c):
            return jnp.sum(fn(i, c) * jnp.asarray(cot))

        gi_a, gc_a = jax.grad(
            lambda i, c: loss(grid_sample_2d, i, c), argnums=(0, 1)
        )(jnp.asarray(img), jnp.asarray(coords))
        gi_b, gc_b = jax.grad(
            lambda i, c: loss(grid_sample_2d_patch, i, c), argnums=(0, 1)
        )(jnp.asarray(img), jnp.asarray(coords))
        np.testing.assert_allclose(np.asarray(gi_a), np.asarray(gi_b),
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(gc_a), np.asarray(gc_b),
                                   atol=1e-6)

    def test_index_features_patch_matches(self):
        from mpsnerf_tpu.ops.grid_sample import index_features_patch

        rng = np.random.default_rng(2)
        latent = rng.normal(size=(2, 8, 16, 16)).astype(np.float32)
        uv = rng.uniform(-10, 70, size=(2, 33, 2)).astype(np.float32)
        a = np.asarray(
            index_features(jnp.asarray(latent), jnp.asarray(uv), (64.0, 64.0))
        )
        b = np.asarray(
            index_features_patch(
                jnp.asarray(latent), jnp.asarray(uv), (64.0, 64.0)
            )
        )
        np.testing.assert_allclose(a, b, atol=1e-6, rtol=1e-6)

    def test_index_features_normalization(self):
        # uv in pixel coords of a (W=10, H=8) image; sampling a latent of the
        # same resolution at integer pixels returns the exact texel
        img = np.arange(80, dtype=np.float32).reshape(1, 1, 8, 10)
        uv = np.array([[[3.0, 2.0], [0.0, 0.0], [9.0, 7.0]]], np.float32)
        # normalization: 2*uv/size - 1 with size=(W,H)=(10,8); then
        # align-corners mapping uses (dim-1): x = (2*3/10-1+1)/2*9 = 2.7
        out = np.asarray(
            index_features(jnp.asarray(img), jnp.asarray(uv), (10.0, 8.0))
        )
        # expected: bilinear at (x=2.7, y=1.75): rows 1,2 cols 2,3
        v = img[0, 0]
        x, y = 2.7, 1.75
        e = (
            v[1, 2] * (3 - x) * (2 - y)
            + v[1, 3] * (x - 2) * (2 - y)
            + v[2, 2] * (3 - x) * (y - 1)
            + v[2, 3] * (x - 2) * (y - 1)
        )
        np.testing.assert_allclose(out[0, 0, 0], e, rtol=1e-5)


class TestGridSample3D:
    def test_matches_torch(self):
        rng = np.random.default_rng(3)
        vol = rng.normal(size=(6, 5, 7, 4)).astype(np.float32)
        coords = rng.uniform(-1.2, 1.2, size=(40, 3)).astype(np.float32)
        ours = np.asarray(grid_sample_3d(jnp.asarray(vol), jnp.asarray(coords)))
        t = TF.grid_sample(
            torch.from_numpy(vol)[None],
            torch.from_numpy(coords)[None, None, None, :, :],
            mode="bilinear",
            padding_mode="zeros",
            align_corners=True,
        )[0, :, 0, 0].numpy()
        np.testing.assert_allclose(ours, t, atol=1e-5)


class TestPositionalEncoding:
    def test_dim(self):
        assert pe_dim(6, 3) == 39
        assert pe_dim(4, 3) == 27

    def test_layout_and_values(self):
        x = jnp.asarray([[0.5, -0.3, 1.0]])
        out = np.asarray(positional_encoding(x, num_freqs=2))
        assert out.shape == (1, 15)
        np.testing.assert_allclose(out[0, :3], [0.5, -0.3, 1.0], atol=1e-6)
        f0 = np.pi
        np.testing.assert_allclose(out[0, 3:6], np.sin(f0 * np.array([0.5, -0.3, 1.0])), atol=1e-6)
        np.testing.assert_allclose(out[0, 6:9], np.cos(f0 * np.array([0.5, -0.3, 1.0])), atol=1e-6)
        np.testing.assert_allclose(out[0, 9:12], np.sin(2 * f0 * np.array([0.5, -0.3, 1.0])), atol=1e-6)


class TestComposite:
    def _numpy_ref(self, rgb_raw, sigma_raw, z, rays_d):
        # independent numpy implementation of the compositing math
        def sp(x):
            return np.log1p(np.exp(-np.abs(x - 1))) + np.maximum(x - 1, 0)

        def ws(x):
            return (1 + 2e-4) / (1 + np.exp(-x)) - 1e-4

        dists = np.diff(z, axis=-1)
        dists = np.concatenate([dists, np.full_like(dists[..., :1], 1e10)], -1)
        dists = dists * np.linalg.norm(rays_d, axis=-1, keepdims=True)
        alpha = 1 - np.exp(-sp(sigma_raw) * dists)
        ones = np.ones_like(alpha[..., :1])
        trans = np.cumprod(np.concatenate([ones, 1 - alpha + 1e-10], -1), -1)[..., :-1]
        w = alpha * trans
        rgb = ws(rgb_raw)
        return (w[..., None] * rgb).sum(-2), w.sum(-1), w

    def test_matches_numpy(self):
        rng = np.random.default_rng(0)
        R, S = 13, 17
        rgb_raw = rng.normal(size=(R, S, 3)).astype(np.float32)
        sigma_raw = rng.normal(size=(R, S)).astype(np.float32) * 3
        z = np.sort(rng.uniform(1, 3, size=(R, S)).astype(np.float32), axis=-1)
        rays_d = rng.normal(size=(R, 3)).astype(np.float32)

        out = composite_rays(
            jnp.asarray(rgb_raw), jnp.asarray(sigma_raw), jnp.asarray(z), jnp.asarray(rays_d)
        )
        ref_rgb, ref_acc, ref_w = self._numpy_ref(rgb_raw, sigma_raw, z, rays_d)
        np.testing.assert_allclose(np.asarray(out.rgb_map), ref_rgb, atol=1e-5)
        np.testing.assert_allclose(np.asarray(out.acc_map), ref_acc, atol=1e-5)
        np.testing.assert_allclose(np.asarray(out.weights), ref_w, atol=1e-5)

    def test_masked_raw_is_transparent(self):
        # raw = -80 (the human-region mask fill) must composite to ~zero
        R, S = 4, 8
        rgb_raw = np.full((R, S, 3), -80, np.float32)
        sigma_raw = np.full((R, S), -80, np.float32)
        z = np.tile(np.linspace(1, 2, S, dtype=np.float32), (R, 1))
        rays_d = np.ones((R, 3), np.float32)
        out = composite_rays(
            jnp.asarray(rgb_raw), jnp.asarray(sigma_raw), jnp.asarray(z), jnp.asarray(rays_d)
        )
        np.testing.assert_allclose(np.asarray(out.acc_map), 0.0, atol=1e-5)
        np.testing.assert_allclose(np.asarray(out.rgb_map), 0.0, atol=1e-3)

    def test_jit_grad_no_nan_at_saturation(self):
        """Regression: the exp(cumsum(log)) transmittance form emitted NaN
        gradients under jit when alpha saturates to exactly 1."""
        rng = np.random.default_rng(0)
        R, S = 8, 6
        rgb = rng.normal(size=(R, S, 3)).astype(np.float32)
        sig = np.full((R, S), -80.0, np.float32)
        sig[:, 2] = 50.0  # saturated live sample
        sig[:, 4] = -0.7
        z = np.sort(rng.uniform(1, 3, size=(R, S)).astype(np.float32), -1)
        rd = rng.normal(size=(R, 3)).astype(np.float32)

        def loss(rgb, sig):
            out = composite_rays(
                jnp.asarray(rgb), jnp.asarray(sig), jnp.asarray(z), jnp.asarray(rd)
            )
            return jnp.mean(out.rgb_map**2) + jnp.mean(out.acc_map)

        g = jax.jit(jax.grad(loss, argnums=(0, 1)))(
            jnp.asarray(rgb), jnp.asarray(sig)
        )
        assert not bool(jnp.isnan(g[0]).any())
        assert not bool(jnp.isnan(g[1]).any())

    def test_stratified_bounds(self):
        key = jax.random.PRNGKey(0)
        near = jnp.full((5, 1), 2.0)
        far = jnp.full((5, 1), 4.0)
        z = stratified_z_vals(key, near, far, 16, perturb=1.0)
        zn = np.asarray(z)
        assert zn.shape == (5, 16)
        assert (zn >= 2.0 - 1e-5).all() and (zn <= 4.0 + 1e-5).all()
        assert (np.diff(zn, axis=-1) > -1e-6).all()  # sorted

    def test_sample_pdf_det(self):
        key = jax.random.PRNGKey(0)
        bins = jnp.asarray(np.linspace(0, 1, 11, dtype=np.float32))[None].repeat(3, 0)
        w = jnp.ones((3, 10), jnp.float32)
        s = sample_pdf(key, bins, w, 7, det=True)
        np.testing.assert_allclose(
            np.asarray(s), np.tile(np.linspace(0, 1, 7), (3, 1)), atol=1e-5
        )


class TestActivations:
    def test_values(self):
        x = jnp.asarray([0.0, 1.0, -80.0])
        np.testing.assert_allclose(
            np.asarray(shifted_softplus(x)),
            [np.log1p(np.exp(-1.0)), np.log(2.0), 0.0],
            atol=1e-6,
        )
        assert abs(float(wide_sigmoid(jnp.asarray(0.0))) - 0.5) < 2e-4
        assert float(wide_sigmoid(jnp.asarray(-80.0))) < 0.0


class TestTransformerOutViews:
    def test_out_views_matches_full_forward(self):
        """out_views computes exactly the full forward's first rows
        (same params, same math) — the dropped rows are the only
        difference."""
        import jax
        from mpsnerf_tpu.models.transformer import ViewFusionTransformer

        model = ViewFusionTransformer(dim=32, mlp_dim=32)
        x = jax.random.normal(jax.random.PRNGKey(0), (3, 64, 32))
        variables = model.init(jax.random.PRNGKey(1), x)
        full = model.apply(variables, x)
        cut = model.apply(variables, x, out_views=2)
        assert cut.shape == (2, 64, 32)
        np.testing.assert_array_equal(np.asarray(cut), np.asarray(full[:2]))
