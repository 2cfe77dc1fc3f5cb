"""CorrectionF3D (numpy-era correction_by_f3d family) behavior tests.

Reference: lib/correction.py:53-436, model_selection.py:9-20.  No torch
oracle here — the reference class needs spconv at import time — so these
are differential/architectural checks: exact reference feature dims,
zero-init correction identity, Jacobian-smoothness semantics, and
end-to-end rendering through the shared renderer.
"""

import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mpsnerf_tpu.data import attach_body_grid, attach_spconv_plan
from mpsnerf_tpu.data.synthetic import SyntheticHumanDataset
from mpsnerf_tpu.models.correction_f3d import CorrectionF3D
from mpsnerf_tpu.train.trainer import to_device_input


@pytest.fixture(scope="module")
def scene():
    ds = SyntheticHumanDataset(
        n_poses=1, n_cameras=4, image_size=32, n_rays=16, n_verts=300,
        num_instances=1,
    )
    item = ds.get_item(0, instance_idx=0)
    attach_spconv_plan(item, canonical=True)
    attach_body_grid(item)
    smpl = ds.smpl_for(0)
    inp = to_device_input(item)
    rng = np.random.default_rng(0)
    lo, hi = np.asarray(item["bounds"])
    pts = jnp.asarray(
        rng.uniform(lo - 0.05, hi + 0.05, (256, 3)).astype(np.float32)
    )
    vd = jnp.asarray(rng.standard_normal((256, 3)).astype(np.float32))
    return ds, smpl, item, inp, pts, vd


def _init(model, scene):
    ds, smpl, item, inp, pts, vd = scene
    return model.init(
        {"params": jax.random.PRNGKey(0)}, smpl, inp, inp, pts[:8],
        vd[:8], train=False,
    )


class TestCorrectionF3D:
    def test_reference_feature_dims(self, scene):
        """Exact reference channel counts (lib/correction.py:60-77):
        forward 143(+128 agg), backward 111(+128), NeRF 71(+128 f2d)."""
        for use_agg, fwd_in, bwd_in in ((False, 143, 111), (True, 271, 239)):
            model = CorrectionF3D(use_agg=use_agg, human_sample=True)
            variables = _init(model, scene)
            p = variables["params"]
            assert p["forward_deform"]["fc0"]["Dense_0"]["kernel"].shape[0] == fwd_in
            assert p["backward_deform"]["fc0"]["Dense_0"]["kernel"].shape[0] == bwd_in
            assert p["pts_linear_0"]["Dense_0"]["kernel"].shape[0] == 71 + 128
            # nerf_input_ch_2 = 384 = 128 fused + 256 feature (ref :78)
            assert p["views_linear"]["Dense_0"]["kernel"].shape[0] == 384

        model = CorrectionF3D(use_f2d=False, human_sample=True)
        variables = _init(model, scene)
        p = variables["params"]
        assert p["pts_linear_0"]["Dense_0"]["kernel"].shape[0] == 71

    def test_zero_init_corrections_and_mask(self, scene):
        """At init the zero-init correction heads output exactly 0 (the
        warp chain is purely coarse LBS), and masked points carry the
        reference's exact -80 fill."""
        ds, smpl, item, inp, pts, vd = scene
        model = CorrectionF3D(human_sample=True)
        variables = _init(model, scene)
        raw = model.apply(
            variables, smpl, inp, inp, pts, vd, train=False,
        )
        m = np.asarray(raw.pts_mask) > 0
        assert 0 < m.sum() < m.size
        np.testing.assert_array_equal(np.asarray(raw.correction), 0.0)
        np.testing.assert_array_equal(np.asarray(raw.correction_), 0.0)
        assert np.all(np.asarray(raw.sigma)[~m] == -80.0)
        assert np.isfinite(np.asarray(raw.rgb)[m]).all()

    def test_jacobian_smoothness(self, scene):
        """compute_normals carries the numpy-era grad_deform norms: zero
        at init (zero-init output layers), nonzero + finite after the
        output weights are perturbed."""
        ds, smpl, item, inp, pts, vd = scene
        model = CorrectionF3D(human_sample=True)
        variables = _init(model, scene)
        raw0 = model.apply(
            variables, smpl, inp, inp, pts, vd, train=False,
            compute_normals=True,
        )
        np.testing.assert_array_equal(np.asarray(raw0.occ_normal), 0.0)

        params = jax.device_get(variables["params"])
        for field in ("forward_deform", "backward_deform"):
            out = params[field]["out"]["Dense_0"]
            out["kernel"] = np.full_like(
                np.asarray(out["kernel"]), 0.01
            )
        variables = {**variables, "params": params}
        raw1 = model.apply(
            variables, smpl, inp, inp, pts, vd, train=False,
            compute_normals=True,
        )
        m = np.asarray(raw1.pts_mask) > 0
        gf = np.asarray(raw1.occ_normal)[m]
        gb = np.asarray(raw1.nearest_smpl_normal)[m]
        assert np.isfinite(gf).all() and np.isfinite(gb).all()
        assert float(np.abs(gf).max()) > 0
        assert float(np.abs(gb).max()) > 0

    def test_agg_variant_runs_and_differs(self, scene):
        ds, smpl, item, inp, pts, vd = scene
        model = CorrectionF3D(use_agg=True, human_sample=True)
        variables = _init(model, scene)
        raw = model.apply(variables, smpl, inp, inp, pts, vd, train=False)
        m = np.asarray(raw.pts_mask) > 0
        assert np.isfinite(np.asarray(raw.rgb)[m]).all()

    def test_renders_through_shared_renderer(self, scene):
        from mpsnerf_tpu.renderer.render import render_rays

        ds, smpl, item, inp, pts, vd = scene
        model = CorrectionF3D(human_sample=True)
        variables = _init(model, scene)
        latent = model.apply(
            variables, inp["img_all"], train=False, method="encode"
        )
        k = 1
        ro = jnp.asarray(item["ray_o_all"][k][:16], jnp.float32)
        rd = jnp.asarray(item["ray_d_all"][k][:16], jnp.float32)
        nr = jnp.asarray(item["near_all"][k][:16, 0], jnp.float32)
        fr = jnp.asarray(item["far_all"][k][:16, 0], jnp.float32)
        out = render_rays(
            model, variables, smpl, inp, inp, latent, ro, rd, nr, fr,
            jax.random.PRNGKey(0), n_samples=8, perturb=0.0, train=False,
        )
        assert np.isfinite(np.asarray(out.rgb_map)).all()

    def test_factory_names(self, scene):
        from mpsnerf_tpu.factory import return_model

        args = types.SimpleNamespace(
            model="correction_by_f3d_fagg", use_f2d=1, with_viewdirs=0,
            human_sample=1, use_trans=0,
        )
        model = return_model(args)
        assert isinstance(model, CorrectionF3D) and model.use_agg
        args.model = "correction_by_f3d"
        model = return_model(args)
        assert isinstance(model, CorrectionF3D) and not model.use_agg

    def test_gradients_flow(self, scene):
        ds, smpl, item, inp, pts, vd = scene
        model = CorrectionF3D(human_sample=True)
        variables = _init(model, scene)

        def loss(params):
            raw = model.apply(
                {**variables, "params": params}, smpl, inp, inp,
                pts[:64], vd[:64], train=False,
            )
            m = raw.pts_mask.astype(jnp.float32)
            return jnp.sum(raw.rgb * m[:, None]) + jnp.sum(
                raw.sigma * m
            )

        g = jax.grad(loss)(variables["params"])
        leaves = jax.tree.leaves(g)
        assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
        # the deform-field input layers must receive gradient (they sit
        # upstream of the warps)
        gnorm = float(
            jnp.abs(
                g["forward_deform"]["out"]["Dense_0"]["kernel"]
            ).sum()
        )
        assert gnorm > 0


class TestCorrectionUvhAgg:
    """CorrectionByUvhAgg equivalent (lib/correction.py:438-751 — the
    model_selection.py:84 fallthrough).  The reference class cannot even
    be constructed (NameError on the commented-out ``nerf_input_ch``
    global), so these are architectural/differential checks of the
    resolved-as-intended module; every resolution is documented in the
    class docstring + PARITY.md."""

    def _model(self, **kw):
        from mpsnerf_tpu.models.correction_f3d import CorrectionUvhAgg

        return CorrectionUvhAgg(**kw)

    def test_reference_feature_dims(self, scene):
        """Channel counts from the class's ACTUAL concatenations:
        forward 67 = PE10(63) + t_vertex(3) + dist(1) (ref :444 declares
        4 + 63), backward 64 = 1 + 63 (ref :445), +128 agg when use_agg;
        NeRF input 223 = 63 + 32 f3d + 128 f2d; rgb-head input
        411 = 256 + 27 + 128."""
        for use_agg, fwd_in, bwd_in in ((False, 67, 64), (True, 195, 192)):
            model = self._model(use_agg=use_agg)
            variables = _init(model, scene)
            p = variables["params"]
            assert p["forward_deform"]["fc0"]["Dense_0"]["kernel"].shape[0] == fwd_in
            assert p["backward_deform"]["fc0"]["Dense_0"]["kernel"].shape[0] == bwd_in
            assert p["pts_linear_0"]["Dense_0"]["kernel"].shape[0] == 223
            assert p["views_linear"]["Dense_0"]["kernel"].shape[0] == 411
            # D=8 deform fields (the reference's DeformField DEFAULTS —
            # unlike f3d's D=3): fc0..fc7 present
            assert "fc7" in p["forward_deform"]

        model = self._model(use_f2d=False)
        variables = _init(model, scene)
        p = variables["params"]
        assert p["pts_linear_0"]["Dense_0"]["kernel"].shape[0] == 95

    def test_zero_init_corrections_no_mask(self, scene):
        """Zero-init correction heads -> pure coarse LBS warp at init;
        this class has NO human-region mask (every point participates)."""
        ds, smpl, item, inp, pts, vd = scene
        model = self._model()
        variables = _init(model, scene)
        raw = model.apply(variables, smpl, inp, inp, pts, vd, train=False)
        np.testing.assert_array_equal(np.asarray(raw.pts_mask), 1)
        np.testing.assert_array_equal(np.asarray(raw.correction), 0.0)
        np.testing.assert_array_equal(np.asarray(raw.correction_), 0.0)
        assert np.isfinite(np.asarray(raw.rgb)).all()
        assert np.isfinite(np.asarray(raw.sigma)).all()

    def test_agg_variant_consults_windowed_feature(self, scene):
        """use_agg routes the 5x5-window aggregate into both fields: with
        nonzero deform weights, outputs must differ from use_agg=False
        under shared non-agg parameters."""
        ds, smpl, item, inp, pts, vd = scene
        model = self._model(use_agg=True)
        variables = _init(model, scene)
        raw = model.apply(variables, smpl, inp, inp, pts, vd, train=False)
        assert np.isfinite(np.asarray(raw.rgb)).all()

    def test_renders_through_shared_renderer(self, scene):
        from mpsnerf_tpu.renderer.render import render_rays

        ds, smpl, item, inp, pts, vd = scene
        model = self._model()
        variables = _init(model, scene)
        latent = model.apply(
            variables, inp["img_all"], train=False, method="encode"
        )
        k = 1
        ro = jnp.asarray(item["ray_o_all"][k][:16], jnp.float32)
        rd = jnp.asarray(item["ray_d_all"][k][:16], jnp.float32)
        nr = jnp.asarray(item["near_all"][k][:16, 0], jnp.float32)
        fr = jnp.asarray(item["far_all"][k][:16, 0], jnp.float32)
        out = render_rays(
            model, variables, smpl, inp, inp, latent, ro, rd, nr, fr,
            jax.random.PRNGKey(0), n_samples=8, perturb=0.0, train=False,
        )
        assert np.isfinite(np.asarray(out.rgb_map)).all()

    def test_factory_names(self, scene):
        from mpsnerf_tpu.factory import return_model
        from mpsnerf_tpu.models.correction_f3d import CorrectionUvhAgg

        args = types.SimpleNamespace(
            model="correction_by_uvh_agg", use_f2d=1,
        )
        model = return_model(args)
        assert isinstance(model, CorrectionUvhAgg) and not model.use_agg
        args.model = "correction_by_uvh_agg_fagg"
        model = return_model(args)
        assert isinstance(model, CorrectionUvhAgg) and model.use_agg

    def test_gradients_flow_both_fields_and_encoders(self, scene):
        ds, smpl, item, inp, pts, vd = scene
        model = self._model()
        variables = _init(model, scene)
        # Query NEAR the posed surface: the canonical sparse grid only has
        # features within ~1 coarse voxel (1 cm) of the 300 synthetic
        # verts, so box-uniform points sample all-zeros and encoder_3d
        # gradients legitimately vanish (a scene artifact, not model
        # behavior).  Near-surface queries warp to occupied canonical
        # voxels and exercise the trilinear-tap gradient path.
        rng = np.random.default_rng(3)
        near = jnp.asarray(
            np.asarray(item["vertices"])[:64]
            + rng.normal(0.0, 0.003, (64, 3)).astype(np.float32)
        )

        def loss(params):
            raw = model.apply(
                {**variables, "params": params}, smpl, inp, inp,
                near, vd[:64], train=False,
            )
            return jnp.sum(raw.rgb) + jnp.sum(raw.sigma)

        g = jax.grad(loss)(variables["params"])
        leaves = jax.tree.leaves(g)
        assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
        for mod in ("forward_deform", "backward_deform", "encoder_3d"):
            gnorm = sum(
                float(jnp.abs(x).sum()) for x in jax.tree.leaves(g[mod])
            )
            assert gnorm > 0, f"no gradient into {mod}"


class TestCorrectionCLITrain:
    """The reference trains WHATEVER model_selection returns through the
    same run_nerf_batch loop; pin that the numpy-era correction family
    trains end-to-end through OUR CLI too (the duck-typed
    correction_field/canonical_grid/compact_fraction surface attaches the
    posed AND canonical spconv grids and opts out of masked compaction)."""

    @pytest.mark.parametrize("name", ["correction_by_f3d",
                                      "correction_by_uvh_agg"])
    def test_cli_trains(self, name, tmp_path):
        import run_nerf_batch

        run_nerf_batch.main([
            "--config", "configs/synthetic_smoke.txt",
            "--basedir", str(tmp_path),
            "--expname", f"smoke_{name}",
            "--model", name,
            "--smooth_loss", "0",
            "--image_scaling", "0.0625",
            "--N_rand", "24",
            "--N_samples", "8",
            "--N_iteration", "2",
            "--i_print", "2",
            "--i_weights", "1000",
            "--i_testset", "1000000",
            "--num_worker", "0",
        ])
        scalars = (
            tmp_path / "summaries" / f"smoke_{name}" / "scalars.jsonl"
        )
        lines = [
            __import__("json").loads(l)
            for l in scalars.read_text().splitlines()
        ]
        assert lines and np.isfinite(lines[-1]["loss"])


class TestCorrectionEval:
    def test_view_renderer_uses_uncompacted_path(self, scene):
        """ViewRenderer must auto-route mask-less models (the correction
        family evaluates the network at EVERY sample in the reference)
        off the global-compaction/box-cull path, whose -80 fill semantics
        require the flagship's 5 cm human mask — and the render must
        match a direct render_rays of the same view exactly."""
        from mpsnerf_tpu.eval.runner import ViewRenderer
        from mpsnerf_tpu.renderer.render import render_rays

        ds, smpl, item, inp, pts, vd = scene
        from mpsnerf_tpu.models.correction_f3d import CorrectionF3D

        model = CorrectionF3D(human_sample=True)
        variables = _init(model, scene)
        r = ViewRenderer(model, lambda g: smpl, chunk=256, n_samples=8,
                         shuffle_rays=False)
        assert not r.global_compact and not r.box_cull
        out = r.render_view(variables, item, item, 1)

        latent = model.apply(
            variables, inp["img_all"], train=False, method="encode"
        )
        k = 1
        n = 256  # one chunk's worth, sliced from the full image
        ro = jnp.asarray(item["ray_o_all"][k][:n], jnp.float32)
        rd = jnp.asarray(item["ray_d_all"][k][:n], jnp.float32)
        nr = jnp.asarray(item["near_all"][k][:n, 0], jnp.float32)
        fr = jnp.asarray(item["far_all"][k][:n, 0], jnp.float32)
        ref = render_rays(
            model, variables, smpl, inp, inp, latent, ro, rd, nr, fr,
            jax.random.PRNGKey(0), n_samples=8, perturb=0.0, train=False,
        )
        np.testing.assert_allclose(
            out[:n], np.asarray(ref.rgb_map), atol=1e-5
        )
