"""Numerical parity against the reference's OWN code (torch CPU oracle).

Every test runs a reference function imported (or extracted) from
``/root/reference`` next to this framework's counterpart on identical
random inputs.  This is the component-level instrument for the PSNR-parity
bar: if each stage matches to ~1e-5 in fp32, end-to-end divergence can only
come from training, not from the math.

Covered (reference file:line -> ours):
  * batch_rodrigues_torch (run_nerf_helpers.py:174)    -> smpl.kinematics.rodrigues
  * get_rigid_transformation_torch (:195)              -> smpl.kinematics.rigid_transforms
  * get_transform_params_torch (:227)                  -> smpl.kinematics.transform_params
  * PositionalEncoding (:313)                          -> ops.positional.positional_encoding
  * Embedder/get_embedder (:367)                       -> models.vanilla_nerf.get_embedder
  * sample_pdf (:548)                                  -> ops.composite.sample_pdf
  * raw2outputs (run_nerf_batch.py:369)                -> ops.composite.composite_rays
  * Transformer (lib/transformer.py:73)                -> models.transformer.ViewFusionTransformer
  * coarse_deform_target2c (skinnning_batch.py:203)    -> smpl.lbs.deform_target_to_canonical
  * coarse_deform_c2source (:253)                      -> smpl.lbs.deform_canonical_to_source
"""

import types

import numpy as np
import pytest

from tests.reference_oracle import (
    extract_fn, knn_points_exact, load_ref_module, patch_cuda_to_cpu,
    reference_available,
)

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference tree not mounted"
)

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

SMPL_PARENTS = (
    0, 0, 0, 0, 1, 2, 3, 4, 5, 6, 7, 8,
    9, 9, 9, 12, 13, 14, 16, 17, 18, 19, 20, 21,
)


@pytest.fixture(scope="module")
def helpers():
    return load_ref_module("lib.run_nerf_helpers")


@pytest.fixture(scope="module")
def synthetic_smpl():
    """Random SMPL rig at the real 6890-vertex size (the reference's LBS
    code hardcodes 6890 in posedirs reshapes)."""
    rng = np.random.default_rng(11)
    V = 6890
    J_reg = rng.random((24, V), np.float64).astype(np.float32)
    J_reg /= J_reg.sum(axis=1, keepdims=True)
    w = rng.random((V, 24)).astype(np.float32)
    w /= w.sum(axis=1, keepdims=True)
    return {
        "v_template": rng.standard_normal((V, 3)).astype(np.float32) * 0.3,
        "shapedirs": rng.standard_normal((V, 3, 10)).astype(np.float32) * 0.01,
        "posedirs": rng.standard_normal((V, 3, 207)).astype(np.float32) * 1e-3,
        "J_regressor": J_reg,
        "weights": w,
    }


def _torch_smpl(s):
    d = {k: torch.from_numpy(v) for k, v in s.items()}
    d["kintree_table"] = torch.tensor(
        [list(SMPL_PARENTS), list(range(24))], dtype=torch.long
    )
    return d


def _jax_smpl(s):
    from mpsnerf_tpu.smpl.model import SMPLModel

    return SMPLModel(
        v_template=jnp.asarray(s["v_template"]),
        shapedirs=jnp.asarray(s["shapedirs"]),
        posedirs=jnp.asarray(s["posedirs"]),
        J_regressor=jnp.asarray(s["J_regressor"]),
        weights=jnp.asarray(s["weights"]),
        faces=jnp.zeros((1, 3), jnp.int32),
        parents=SMPL_PARENTS,
    )


def _params(rng):
    return {
        "poses": rng.standard_normal(72).astype(np.float32) * 0.4,
        "shapes": rng.standard_normal(10).astype(np.float32) * 0.5,
        "R": np.linalg.qr(rng.standard_normal((3, 3)))[0].astype(np.float32),
        "Th": rng.standard_normal((1, 3)).astype(np.float32) * 0.1,
    }


class TestKinematics:
    def test_rodrigues(self, helpers):
        from mpsnerf_tpu.smpl.kinematics import rodrigues

        rng = np.random.default_rng(0)
        poses = rng.standard_normal((24, 3)).astype(np.float32)
        poses[0] = 0.0  # zero rotation hits the eps path
        ref = helpers.batch_rodrigues_torch(torch.from_numpy(poses)).numpy()
        ours = np.asarray(rodrigues(jnp.asarray(poses)))
        np.testing.assert_allclose(ours, ref, atol=1e-6)

    def test_rigid_chain(self, helpers, monkeypatch):
        from mpsnerf_tpu.smpl.kinematics import rigid_transforms, rodrigues

        patch_cuda_to_cpu(monkeypatch)
        rng = np.random.default_rng(1)
        poses = rng.standard_normal((24, 3)).astype(np.float32) * 0.5
        joints = rng.standard_normal((24, 3)).astype(np.float32)
        rots = np.asarray(rodrigues(jnp.asarray(poses)))
        parents = torch.tensor(SMPL_PARENTS, dtype=torch.long)
        ref = helpers.get_rigid_transformation_torch(
            torch.from_numpy(rots), torch.from_numpy(joints), parents
        ).numpy()
        ours = np.asarray(
            rigid_transforms(jnp.asarray(rots), jnp.asarray(joints),
                             np.asarray(SMPL_PARENTS))
        )
        np.testing.assert_allclose(ours, ref, atol=1e-5)

    def test_transform_params(self, helpers, synthetic_smpl, monkeypatch):
        from mpsnerf_tpu.smpl.kinematics import transform_params

        patch_cuda_to_cpu(monkeypatch)
        rng = np.random.default_rng(2)
        params = _params(rng)
        tparams = {k: torch.from_numpy(v) for k, v in params.items()}
        A_ref, R_ref, Th_ref, joints_ref = helpers.get_transform_params_torch(
            _torch_smpl(synthetic_smpl), tparams
        )
        A, joints = transform_params(
            _jax_smpl(synthetic_smpl),
            jnp.asarray(params["poses"]), jnp.asarray(params["shapes"]),
        )
        np.testing.assert_allclose(np.asarray(A), A_ref.numpy(), atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(joints), joints_ref.numpy(), atol=1e-5
        )


class TestEncodings:
    @pytest.mark.parametrize("num_freqs", [4, 6])
    def test_positional_encoding(self, helpers, num_freqs):
        from mpsnerf_tpu.ops.positional import pe_dim, positional_encoding

        rng = np.random.default_rng(3)
        x = rng.standard_normal((257, 3)).astype(np.float32)
        pe = helpers.PositionalEncoding(num_freqs=num_freqs, d_in=3)
        ref = pe(torch.from_numpy(x)).numpy()
        ours = np.asarray(positional_encoding(jnp.asarray(x), num_freqs))
        assert ours.shape[-1] == pe_dim(num_freqs) == pe.d_out
        # fp32 sin/cos at |arg| up to ~pi*32*|x|: libm argument-reduction
        # differences between torch and XLA reach ~3e-5
        np.testing.assert_allclose(ours, ref, atol=1e-4)

    def test_legacy_embedder(self, helpers):
        from mpsnerf_tpu.models.vanilla_nerf import get_embedder

        rng = np.random.default_rng(4)
        x = rng.standard_normal((129, 3)).astype(np.float32)
        ref_fn, ref_dim = helpers.get_embedder(10)
        fn, dim = get_embedder(10)
        assert dim == ref_dim
        np.testing.assert_allclose(
            np.asarray(fn(jnp.asarray(x))),
            ref_fn(torch.from_numpy(x)).numpy(),
            atol=2e-5,
        )


class TestSamplingCompositing:
    def test_sample_pdf_det(self, helpers):
        from mpsnerf_tpu.ops.composite import sample_pdf

        rng = np.random.default_rng(5)
        bins = np.sort(rng.random((33, 17)).astype(np.float32), axis=-1)
        weights = rng.random((33, 16)).astype(np.float32)
        ref = helpers.sample_pdf(
            torch.from_numpy(bins), torch.from_numpy(weights), 24, det=True
        ).numpy()
        ours = np.asarray(
            sample_pdf(jax.random.PRNGKey(0), jnp.asarray(bins),
                       jnp.asarray(weights), 24, det=True)
        )
        np.testing.assert_allclose(ours, ref, atol=1e-5)

    @pytest.mark.parametrize("occupancy", [False, True])
    @pytest.mark.parametrize("white_bkgd", [False, True])
    def test_raw2outputs(self, helpers, occupancy, white_bkgd):
        from mpsnerf_tpu.ops.composite import composite_rays

        raw2outputs = extract_fn(
            "run_nerf_batch.py", "raw2outputs",
            {
                "torch": torch,
                "global_args": types.SimpleNamespace(occupancy=occupancy),
                "density_actfn": helpers.shifted_softplus,
                "rgb_actfn": helpers.wide_sigmoid,
            },
        )
        rng = np.random.default_rng(6)
        R, S = 65, 24
        raw = rng.standard_normal((R, S, 4)).astype(np.float32)
        z = np.sort(rng.random((R, S)).astype(np.float32) * 2 + 1, axis=-1)
        rays_d = rng.standard_normal((R, 3)).astype(np.float32)
        rgb_r, disp_r, acc_r, w_r, depth_r, ts_r = raw2outputs(
            torch.from_numpy(raw)[None], torch.from_numpy(z)[None],
            torch.from_numpy(rays_d)[None], white_bkgd=white_bkgd,
        )
        out = composite_rays(
            jnp.asarray(raw[..., :3]), jnp.asarray(raw[..., 3]),
            jnp.asarray(z), jnp.asarray(rays_d),
            occupancy=occupancy, white_bkgd=white_bkgd,
        )
        np.testing.assert_allclose(
            np.asarray(out.rgb_map), rgb_r[0].numpy(), atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(out.acc_map), acc_r[0].numpy(), atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(out.weights), w_r[0].numpy(), atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(out.depth_map), depth_r[0].numpy(), atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(out.disp_map), disp_r[0].numpy(), rtol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(out.transmittance), ts_r[0].numpy(), atol=1e-5
        )


class TestTransformer:
    def test_forward_parity_with_imported_weights(self):
        """Reference einops transformer vs the view-unrolled TPU
        formulation, with the reference's randomly-initialized weights
        mapped through compat.torch_import."""
        tmod = load_ref_module("lib.transformer")
        from mpsnerf_tpu.compat.torch_import import convert_reference_state_dict
        from mpsnerf_tpu.models.transformer import ViewFusionTransformer

        torch.manual_seed(0)
        dim, depth, heads, dim_head, mlp_dim = 48, 2, 4, 16, 48
        ref = tmod.Transformer(
            dim=dim, depth=depth, heads=heads, dim_head=dim_head,
            mlp_dim=mlp_dim, dropout=0.0,
        ).eval()

        sd = {f"transformer.{k}": v.numpy() for k, v in ref.state_dict().items()}
        params, _, report = convert_reference_state_dict(sd)
        assert not report.get("skipped"), report

        rng = np.random.default_rng(7)
        Vv, N = 4, 33
        x = rng.standard_normal((Vv, N, dim)).astype(np.float32)

        with torch.no_grad():
            # reference attends over its n axis given (b, n, d): points are
            # the batch, views are the sequence
            ref_out = ref(torch.from_numpy(x.transpose(1, 0, 2))).numpy()

        model = ViewFusionTransformer(
            dim=dim, depth=depth, heads=heads, dim_head=dim_head,
            mlp_dim=mlp_dim,
        )
        ours = np.asarray(
            model.apply({"params": params["transformer"]}, jnp.asarray(x))
        )
        np.testing.assert_allclose(
            ours, ref_out.transpose(1, 0, 2), atol=2e-5
        )


class TestLBSWarps:
    @pytest.fixture()
    def lbs_oracle(self, helpers, synthetic_smpl, monkeypatch):
        patch_cuda_to_cpu(monkeypatch)
        import copy

        glb = {
            "torch": torch,
            "np": np,
            "copy": copy,
            "knn_points": knn_points_exact,
            "get_transform_params_torch": helpers.get_transform_params_torch,
        }
        glb["batch_rodrigues"] = extract_fn(
            "lib/skinnning_batch.py", "batch_rodrigues", glb
        )
        target2c = extract_fn(
            "lib/skinnning_batch.py", "coarse_deform_target2c", glb
        )
        c2source = extract_fn(
            "lib/skinnning_batch.py", "coarse_deform_c2source", glb
        )
        big_pose = extract_fn(
            "lib/skinnning_batch.py", "big_pose_params", glb
        )
        self_ = types.SimpleNamespace(
            SMPL_NEUTRAL=_torch_smpl(synthetic_smpl), mean_shape=True
        )
        self_.big_pose_params = types.MethodType(big_pose, self_)
        return self_, target2c, c2source

    def test_target2c(self, lbs_oracle, synthetic_smpl):
        from mpsnerf_tpu.ops.knn import nearest_vertex_xla
        from mpsnerf_tpu.smpl.lbs import (
            PoseTransforms, deform_target_to_canonical, world_to_smpl,
        )

        self_, target2c, _ = lbs_oracle
        rng = np.random.default_rng(8)
        params = _params(rng)
        # reference passes poses/shapes through torch views that expect a
        # leading batch dim in big_pose_params
        tparams = {
            "poses": torch.from_numpy(params["poses"])[None],
            "shapes": torch.from_numpy(params["shapes"]),
            "R": torch.from_numpy(params["R"]),
            "Th": torch.from_numpy(params["Th"]),
        }
        verts_world = (
            synthetic_smpl["v_template"] @ params["R"].T + params["Th"]
        ).astype(np.float32)
        q = (
            synthetic_smpl["v_template"][rng.integers(0, 6890, 400)]
            + rng.standard_normal((400, 3)).astype(np.float32) * 0.05
        ).astype(np.float32)
        # reference queries live in target SMPL space (already world->smpl)
        ref = target2c(
            self_, tparams, torch.from_numpy(verts_world), torch.from_numpy(q)
        ).numpy()

        smpl = _jax_smpl(synthetic_smpl)
        tf = PoseTransforms.create(
            smpl, {k: jnp.asarray(v) for k, v in params.items()}
        )
        smpl_pts = world_to_smpl(
            jnp.asarray(verts_world), tf.R, tf.Th
        )
        _, vid = nearest_vertex_xla(jnp.asarray(q), smpl_pts)
        ours = np.asarray(
            deform_target_to_canonical(smpl, tf, jnp.asarray(q), vid,
                                       mean_shape=True)
        )
        np.testing.assert_allclose(ours, ref, atol=2e-5)

    def test_c2source(self, lbs_oracle, synthetic_smpl):
        from mpsnerf_tpu.ops.knn import nearest_vertex_xla
        from mpsnerf_tpu.smpl.lbs import (
            PoseTransforms, deform_canonical_to_source,
        )

        self_, _, c2source = lbs_oracle
        rng = np.random.default_rng(9)
        params = _params(rng)
        tparams = {
            "poses": torch.from_numpy(params["poses"])[None],
            "shapes": torch.from_numpy(params["shapes"]),
            "R": torch.from_numpy(params["R"]),
            "Th": torch.from_numpy(params["Th"]),
        }
        t_verts = synthetic_smpl["v_template"].astype(np.float32)
        q = (
            t_verts[rng.integers(0, 6890, 400)]
            + rng.standard_normal((400, 3)).astype(np.float32) * 0.05
        ).astype(np.float32)
        wc = rng.standard_normal((400, 24)).astype(np.float32) * 0.1

        smpl_src_ref, world_src_ref, bw_ref = c2source(
            self_, tparams, torch.from_numpy(t_verts), torch.from_numpy(q),
            torch.from_numpy(wc),
        )

        smpl = _jax_smpl(synthetic_smpl)
        tf = PoseTransforms.create(
            smpl, {k: jnp.asarray(v) for k, v in params.items()}
        )
        _, vid = nearest_vertex_xla(jnp.asarray(q), jnp.asarray(t_verts))
        smpl_src, world_src, bw = deform_canonical_to_source(
            smpl, tf, jnp.asarray(q), vid,
            weights_correction=jnp.asarray(wc), mean_shape=True,
        )
        np.testing.assert_allclose(
            np.asarray(bw), bw_ref.numpy(), atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(smpl_src), smpl_src_ref.numpy(), atol=2e-5
        )
        np.testing.assert_allclose(
            np.asarray(world_src), world_src_ref.numpy(), atol=2e-5
        )


class TestGridSample:
    """The reference's CUSTOM differentiable grid_sample
    (lib/encoder.py:10-62) vs ours — unclamped bilinear weights with
    border-clamped corner indices, including out-of-image UVs (points
    projecting outside a source view)."""

    def test_grid_sample_parity(self):
        gs_ref = extract_fn(
            "lib/encoder.py", "grid_sample", {"torch": torch}
        )
        from mpsnerf_tpu.ops.grid_sample import (
            grid_sample_2d, grid_sample_2d_patch,
        )

        rng = np.random.default_rng(5)
        img = rng.standard_normal((3, 7, 11, 9)).astype(np.float32)
        coords = rng.uniform(-1.6, 1.6, (3, 64, 2)).astype(np.float32)

        ref = gs_ref(
            torch.from_numpy(img),
            torch.from_numpy(coords)[:, :, None, :],
        )[:, :, :, 0].numpy()

        ours = np.asarray(
            grid_sample_2d(jnp.asarray(img), jnp.asarray(coords))
        )
        ours_patch = np.asarray(
            grid_sample_2d_patch(jnp.asarray(img), jnp.asarray(coords))
        )
        np.testing.assert_allclose(ours, ref, atol=1e-5)
        np.testing.assert_allclose(ours_patch, ref, atol=1e-5)
