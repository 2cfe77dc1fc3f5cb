"""Sparse conv encoder vs. dense-convolution oracle.

A submanifold sparse conv equals a dense conv (zeros at inactive voxels)
evaluated at the active sites; the strided conv equals a dense stride-2
conv at the coarse active sites.  torch's conv3d is the oracle.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as TF

from mpsnerf_tpu.models.sparse_conv import (
    COARSE_CAP, FINE_CAP, SparseConvNet3D, build_plan, _OFFSETS,
)


@pytest.fixture(scope="module")
def scene():
    rng = np.random.default_rng(0)
    out_sh = np.array([32, 32, 32])
    n = 300
    coord = np.unique(
        rng.integers(2, 30, size=(n, 3)).astype(np.int32), axis=0
    )
    feats = rng.normal(size=(len(coord), 3)).astype(np.float32)
    return coord, feats, out_sh


class TestPlan:
    def test_fine_neighbors_correct(self, scene):
        coord, feats, out_sh = scene
        plan = build_plan(coord, out_sh)
        lut = {tuple(c): i for i, c in enumerate(coord)}
        n = len(coord)
        for i in [0, 5, n - 1]:
            for j, off in enumerate(_OFFSETS):
                expected = lut.get(tuple(coord[i] + off), FINE_CAP)
                assert plan.fine_neighbors[i, j] == expected

    def test_coarse_sites_cover_downsample(self, scene):
        coord, feats, out_sh = scene
        plan = build_plan(coord, out_sh)
        m = int(plan.n_coarse)
        assert m > 0
        # every fine site must have at least one coarse site covering it
        covered = (plan.down_neighbors[:m] < FINE_CAP).any(axis=1)
        assert covered.all()


class TestConvParity:
    def _dense_oracle(self, coord, feats, out_sh, w, stride):
        """torch conv3d on the dense zero-filled volume."""
        vol = np.zeros((1, feats.shape[1], *out_sh), np.float32)
        vol[0, :, coord[:, 0], coord[:, 1], coord[:, 2]] = feats
        # our weight layout: (27, Cin, Cout) in (dz, dy, dx) offset order
        wt = w.reshape(3, 3, 3, w.shape[1], w.shape[2])  # z, y, x, Cin, Cout
        wt = np.transpose(wt, (4, 3, 0, 1, 2))  # OIzyx
        out = TF.conv3d(
            torch.from_numpy(vol), torch.from_numpy(wt.copy()),
            stride=stride, padding=1,
        ).numpy()[0]
        return out  # (Cout, D', H', W')

    def test_subm_conv_matches_dense(self, scene):
        coord, feats, out_sh = scene
        plan = build_plan(coord, out_sh)
        rng = np.random.default_rng(1)
        w = rng.normal(size=(27, 3, 8)).astype(np.float32)

        from mpsnerf_tpu.models.sparse_conv import _SparseConv, _padded

        model = _SparseConv(8)
        vars_ = model.init(
            jax.random.PRNGKey(0),
            jnp.zeros((FINE_CAP, 3)), jnp.asarray(plan.fine_neighbors),
            FINE_CAP,
        )
        vars_ = {"params": {"kernel": jnp.asarray(w)}}
        fpad = jnp.pad(
            jnp.asarray(feats), ((0, FINE_CAP - len(feats)), (0, 0))
        )
        out = model.apply(
            vars_, fpad, jnp.asarray(plan.fine_neighbors), FINE_CAP
        )
        dense = self._dense_oracle(coord, feats, out_sh, w, stride=1)
        ref = dense[:, coord[:, 0], coord[:, 1], coord[:, 2]].T
        np.testing.assert_allclose(
            np.asarray(out)[: len(coord)], ref, atol=1e-4
        )

    def test_stride_conv_matches_dense(self, scene):
        coord, feats, out_sh = scene
        plan = build_plan(coord, out_sh)
        rng = np.random.default_rng(2)
        w = rng.normal(size=(27, 3, 8)).astype(np.float32)

        from mpsnerf_tpu.models.sparse_conv import _SparseConv

        model = _SparseConv(8)
        vars_ = {"params": {"kernel": jnp.asarray(w)}}
        fpad = jnp.pad(
            jnp.asarray(feats), ((0, FINE_CAP - len(feats)), (0, 0))
        )
        out = model.apply(
            vars_, fpad, jnp.asarray(plan.down_neighbors), FINE_CAP
        )
        dense = self._dense_oracle(coord, feats, out_sh, w, stride=2)

        m = int(plan.n_coarse)
        # recover coarse coords from the index volume
        vol = plan.coarse_index_vol
        zz, yy, xx = np.nonzero(vol < COARSE_CAP)
        ids = vol[zz, yy, xx]
        coarse_coords = np.zeros((m, 3), np.int64)
        coarse_coords[ids] = np.stack([zz, yy, xx], 1)

        ref = dense[:, coarse_coords[:, 0], coarse_coords[:, 1],
                    coarse_coords[:, 2]].T
        np.testing.assert_allclose(np.asarray(out)[:m], ref, atol=1e-4)


class TestEndToEnd:
    def test_network_runs_and_samples(self, scene):
        coord, feats, out_sh = scene
        plan = build_plan(coord, out_sh)
        net = SparseConvNet3D()
        q = jnp.asarray(
            np.random.default_rng(3).uniform(-0.9, 0.9, size=(50, 3)),
            jnp.float32,
        )
        variables = net.init(
            jax.random.PRNGKey(0), jnp.asarray(feats), plan, q, train=False
        )
        out = net.apply(variables, jnp.asarray(feats), plan, q, train=False)
        assert out.shape == (50, 32)
        assert bool(jnp.isfinite(out).all())

    def test_outside_grid_is_zero(self, scene):
        coord, feats, out_sh = scene
        plan = build_plan(coord, out_sh)
        net = SparseConvNet3D()
        q = jnp.asarray([[3.0, 3.0, 3.0], [-3.0, 0.0, 0.0]], jnp.float32)
        variables = net.init(
            jax.random.PRNGKey(0), jnp.asarray(feats), plan, q, train=False
        )
        out = net.apply(variables, jnp.asarray(feats), plan, q, train=False)
        np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-6)
