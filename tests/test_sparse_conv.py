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


class TestSpconvImport:
    """Checkpoint import of the reference's spconv SparseConvNet weights.

    Oracle: the reference's num_layers=2 forward (encoder.py:394-452)
    emulated densely in torch — subm convs = masked dense conv3d, the
    stride conv restricted to the plan's coarse rulebook sites, BN in
    eval mode, F.grid_sample(align_corners=True) — driven by a fabricated
    spconv-2.x-layout state dict fed through
    convert_reference_state_dict.
    """

    def _fake_spconv_sd(self, rng):
        dims = {
            "conv0.0": (16, 3), "conv0.3": (16, 16),
            "down0.0": (32, 16),
            "conv1.0": (32, 32), "conv1.3": (32, 32),
        }
        bns = {"conv0.1": 16, "conv0.4": 16, "down0.1": 32,
               "conv1.1": 32, "conv1.4": 32}
        sd = {}
        for name, (co, ci) in dims.items():
            # spconv 2.x KRSC layout: (Cout, kD, kH, kW, Cin)
            sd[f"encoder_3d.{name}.weight"] = rng.normal(
                size=(co, 3, 3, 3, ci)
            ).astype(np.float32) * 0.2
        for name, c in bns.items():
            sd[f"encoder_3d.{name}.weight"] = rng.uniform(
                0.5, 1.5, c
            ).astype(np.float32)
            sd[f"encoder_3d.{name}.bias"] = rng.normal(size=c).astype(
                np.float32
            ) * 0.1
            sd[f"encoder_3d.{name}.running_mean"] = rng.normal(
                size=c
            ).astype(np.float32) * 0.1
            sd[f"encoder_3d.{name}.running_var"] = rng.uniform(
                0.5, 1.5, c
            ).astype(np.float32)
            sd[f"encoder_3d.{name}.num_batches_tracked"] = np.array(100)
        return sd

    def _torch_reference(self, sd, coord, feats, out_sh, plan, q):
        """Dense emulation of the reference SparseConvNet at eval."""
        def w_t(name):  # KRSC -> torch conv3d OIzyx
            w = sd[f"encoder_3d.{name}.weight"]
            return torch.from_numpy(
                np.ascontiguousarray(np.transpose(w, (0, 4, 1, 2, 3)))
            )

        def bn(x, name, mask):
            w = sd[f"encoder_3d.{name}.weight"]
            b = sd[f"encoder_3d.{name}.bias"]
            m = sd[f"encoder_3d.{name}.running_mean"]
            v = sd[f"encoder_3d.{name}.running_var"]
            sh = (1, -1, 1, 1, 1)
            y = (x - torch.from_numpy(m).view(sh)) / torch.sqrt(
                torch.from_numpy(v).view(sh) + 1e-3
            ) * torch.from_numpy(w).view(sh) + torch.from_numpy(b).view(sh)
            return torch.relu(y) * mask

        fine_mask = torch.zeros((1, 1, *out_sh))
        fine_mask[0, 0, coord[:, 0], coord[:, 1], coord[:, 2]] = 1.0

        m = int(plan.n_coarse)
        vol_idx = plan.coarse_index_vol
        zz, yy, xx = np.nonzero(vol_idx < COARSE_CAP)
        csh = tuple(int(s) for s in plan.coarse_out_sh)
        coarse_mask = torch.zeros((1, 1, *csh))
        coarse_mask[0, 0, zz, yy, xx] = 1.0

        x = torch.zeros((1, 3, *out_sh))
        x[0, :, coord[:, 0], coord[:, 1], coord[:, 2]] = torch.from_numpy(
            feats.T
        )
        # conv0 (double subm, masked to active fine sites)
        x = TF.conv3d(x, w_t("conv0.0"), padding=1) * fine_mask
        x = bn(x, "conv0.1", fine_mask)
        x = TF.conv3d(x, w_t("conv0.3"), padding=1) * fine_mask
        x = bn(x, "conv0.4", fine_mask)
        # down0 (stride 2, restricted to the coarse rulebook sites)
        x = TF.conv3d(x, w_t("down0.0"), stride=2, padding=1)
        x = x[:, :, :csh[0], :csh[1], :csh[2]] * coarse_mask
        x = bn(x, "down0.1", coarse_mask)
        # conv1 (double subm on coarse)
        x = TF.conv3d(x, w_t("conv1.0"), padding=1) * coarse_mask
        x = bn(x, "conv1.1", coarse_mask)
        x = TF.conv3d(x, w_t("conv1.3"), padding=1) * coarse_mask
        x = bn(x, "conv1.4", coarse_mask)
        # net.dense() + grid_sample (encoder.py:413-415)
        grid = torch.from_numpy(
            q.astype(np.float32)
        ).view(1, 1, 1, -1, 3)
        out = TF.grid_sample(
            x, grid, padding_mode="zeros", align_corners=True
        )  # (1, 32, 1, 1, N)
        return out[0, :, 0, 0, :].T.numpy()

    def test_import_matches_torch_reference(self, scene):
        from mpsnerf_tpu.compat.torch_import import (
            convert_reference_state_dict,
        )

        coord, feats, out_sh = scene
        plan = build_plan(coord, out_sh)
        rng = np.random.default_rng(7)
        sd = self._fake_spconv_sd(rng)
        q = rng.uniform(-0.9, 0.9, size=(64, 3))

        params, stats, report = convert_reference_state_dict(sd)
        assert "encoder_3d" in params and "encoder_3d" in stats
        assert not report["has_encoder_3d"]  # nothing left unimported

        net = SparseConvNet3D()
        variables = net.init(
            jax.random.PRNGKey(0), jnp.asarray(feats), plan,
            jnp.asarray(q, jnp.float32), train=False,
        )
        # imported tree must be shape-compatible with the init tree
        import jax as _jax
        _jax.tree.map(
            lambda a, b: None if a.shape == b.shape else (_ for _ in ()).throw(
                AssertionError((a.shape, b.shape))
            ),
            variables["params"], params["encoder_3d"],
        )
        ours = net.apply(
            {"params": params["encoder_3d"],
             "batch_stats": stats["encoder_3d"]},
            jnp.asarray(feats), plan, jnp.asarray(q, jnp.float32),
            train=False,
        )
        ref = self._torch_reference(sd, coord, feats, out_sh, plan, q)
        np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-4)

    def test_spconv1_layout_accepted(self, scene):
        """spconv 1.x (kD, kH, kW, Cin, Cout) kernels convert to the same
        (27, Cin, Cout) tree."""
        from mpsnerf_tpu.compat.torch_import import (
            convert_reference_state_dict,
        )

        rng = np.random.default_rng(8)
        sd2 = self._fake_spconv_sd(rng)
        sd1 = dict(sd2)
        for k, v in sd2.items():
            if v.ndim == 5:
                sd1[k] = np.ascontiguousarray(
                    np.transpose(v, (1, 2, 3, 4, 0))
                )
        p2, _, _ = convert_reference_state_dict(sd2)
        p1, _, _ = convert_reference_state_dict(sd1)
        for name in p2["encoder_3d"]:
            if "kernel" in p2["encoder_3d"][name]:
                np.testing.assert_array_equal(
                    p1["encoder_3d"][name]["kernel"],
                    p2["encoder_3d"][name]["kernel"],
                )
