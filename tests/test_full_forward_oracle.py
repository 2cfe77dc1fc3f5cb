"""END-TO-END forward-chain parity against the reference's own code.

The per-stage oracle suite (tests/test_reference_oracle.py) matches every
stage in isolation; this test composes the reference's FULL flagship
forward — ``SKinningBatch.forward`` (lib/skinnning_batch.py:333-514,
correction/skinning fields off, use_trans=1, append_rgb=1, human_sample=1)
followed by ``raw2outputs`` (run_nerf_batch.py:369-398) — on one set of
shared weights and inputs, and asserts parity against ``MPSNeRF.query`` +
``composite_rays`` down to composited pixels.  Stage errors compound and
interface bugs (channel order, masking order, detach points) live BETWEEN
stages; this is the instrument that catches them.

Setup:
  * scene/geometry from SyntheticHumanDataset (full 6890-vertex rig — the
    reference's LBS hardcodes 6890 in posedirs reshapes)
  * the 2D encoder is bypassed on BOTH sides with one shared random
    latent (our ``query`` takes the latent explicitly; the reference gets
    an encoder stub whose ``index`` is the reference's own extracted
    ``SpatialEncoder.index``) — torchvision is not installed here, and
    encoder parity is covered by its own oracle tests
  * tail weights (NeRF MLP, transformer, latent codes) are built as real
    torch modules with the reference's exact names/shapes and imported
    into our parameter tree via ``compat.torch_import``
"""

import copy
import types

import numpy as np
import pytest

from tests.reference_oracle import (
    extract_fn, extract_method, knn_points_exact, load_ref_module,
    patch_cuda_to_cpu, reference_available,
)

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference tree not mounted"
)

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

H = W = 64
N_VIEWS = 3
N_RAYS = 64
N_SAMPLES = 16
FEAT_CH = 128 + 27  # latent + PE'd rgb (append_rgb)
NERF_IN = 39 + FEAT_CH  # PE6(pts) + fused feature


class _TailNet(torch.nn.Module):
    """Torch modules with the reference's exact names/shapes
    (lib/skinnning_batch.py:137-165) so ``state_dict()`` keys match what
    ``compat.torch_import.convert_reference_state_dict`` expects."""

    def __init__(self, tmod, with_viewdirs=False):
        super().__init__()
        nn = torch.nn
        Wd = 256
        self.pts_linears = nn.ModuleList(
            [nn.Linear(NERF_IN, Wd)]
            + [
                nn.Linear(Wd, Wd) if i != 4 else nn.Linear(Wd + NERF_IN, Wd)
                for i in range(7)
            ]
        )
        self.alpha_linear = nn.Linear(Wd, 1)
        self.feature_linear = nn.Linear(Wd, Wd)
        # nerf_input_ch_2 = 411 (+27 PE'd viewdir), ref :161-162
        vin = 128 + 256 + 27 + (27 if with_viewdirs else 0)
        self.views_linear = nn.Linear(vin, Wd // 2)
        self.rgb_linear = nn.Linear(Wd // 2, 3)
        self.transformer = tmod.Transformer(dim=FEAT_CH)
        self.latent_codes = nn.Embedding(1, 128)
        nn.init.normal_(self.latent_codes.weight, mean=0, std=0.01)


def _torch_smpl(smpl):
    """Our SMPLModel -> the reference's SMPL tensor dict."""
    d = {
        "v_template": torch.from_numpy(np.asarray(smpl.v_template)),
        "shapedirs": torch.from_numpy(np.asarray(smpl.shapedirs)),
        "posedirs": torch.from_numpy(np.asarray(smpl.posedirs)),
        "J_regressor": torch.from_numpy(np.asarray(smpl.J_regressor)),
        "weights": torch.from_numpy(np.asarray(smpl.weights)),
        "kintree_table": torch.tensor(
            [list(smpl.parents), list(range(24))], dtype=torch.long
        ),
    }
    return d


def _ref_inputs(item):
    """Item dict -> the reference's BATCHED input layout (what the torch
    dataloader emits before ``sequeeze_0`` strips the leading dim)."""
    d = {}
    for k in ("vertices", "t_vertices", "R_all", "T_all", "K_all",
              "img_all"):
        d[k] = torch.from_numpy(np.asarray(item[k]))[None]
    d["gender"] = torch.tensor([2])  # neutral branch
    d["instance_idx"] = torch.tensor([0])
    p = item["params"]
    d["params"] = {
        "poses": torch.from_numpy(p["poses"]).reshape(1, 1, 72),
        "shapes": torch.from_numpy(p["shapes"]).reshape(1, 10),
        "R": torch.from_numpy(p["R"])[None],
        "Th": torch.from_numpy(p["Th"])[None],
    }
    return d


@pytest.fixture(scope="module")
def scene():
    from mpsnerf_tpu.data.synthetic import SyntheticHumanDataset
    from mpsnerf_tpu.ops.composite import stratified_z_vals

    ds = SyntheticHumanDataset(
        n_poses=1, n_cameras=N_VIEWS + 1, image_size=H, n_rays=N_RAYS,
        n_verts=6890, num_instances=1,
        input_views=list(range(N_VIEWS)),
    )
    item = ds.get_item(0, instance_idx=0)
    smpl = ds.smpl_for(0)

    # rays of the held-out view, deterministic samples (perturb=0)
    k = N_VIEWS
    ro = item["ray_o_all"][k][:N_RAYS]
    rd = item["ray_d_all"][k][:N_RAYS]
    near = item["near_all"][k][:N_RAYS, 0]
    far = item["far_all"][k][:N_RAYS, 0]
    z = np.asarray(
        stratified_z_vals(
            jax.random.PRNGKey(0), jnp.asarray(near)[:, None],
            jnp.asarray(far)[:, None], N_SAMPLES, 0.0,
        )
    )
    pts = (ro[:, None, :] + rd[:, None, :] * z[..., None]).reshape(-1, 3)
    vd = rd / np.linalg.norm(rd, axis=-1, keepdims=True)
    vd_flat = np.broadcast_to(
        vd[:, None, :], (N_RAYS, N_SAMPLES, 3)
    ).reshape(-1, 3).copy()

    rng = np.random.default_rng(42)
    latent = (
        rng.standard_normal((N_VIEWS, 128, H // 4, W // 4)) * 0.5
    ).astype(np.float32)
    return {
        "item": item, "smpl": smpl, "z": z, "rd": rd,
        "pts": pts.astype(np.float32), "vd": vd_flat.astype(np.float32),
        "latent": latent,
    }


@pytest.fixture(scope="module", params=[False, True],
                ids=["plain", "viewdirs"])
def with_viewdirs(request):
    return request.param


@pytest.fixture(scope="module")
def tail_net(with_viewdirs):
    tmod = load_ref_module("lib.transformer")
    torch.manual_seed(0)
    return _TailNet(tmod, with_viewdirs=with_viewdirs).eval()


def _build_ref_forward(scene, tail_net, with_viewdirs, monkeypatch):
    """Assemble the reference ``SKinningBatch.forward`` as an extracted
    function over a namespace carrying real torch weights + the
    reference's own extracted helper methods."""
    patch_cuda_to_cpu(monkeypatch)
    helpers = load_ref_module("lib.run_nerf_helpers")

    glb = {
        "torch": torch,
        "F": torch.nn.functional,
        "np": np,
        "copy": copy,
        "knn_points": knn_points_exact,
        "sequeeze_0": helpers.sequeeze_0,
        "get_transform_params_torch": helpers.get_transform_params_torch,
    }
    glb["grid_sample"] = extract_fn("lib/encoder.py", "grid_sample", glb)
    glb["batch_rodrigues"] = extract_fn(
        "lib/skinnning_batch.py", "batch_rodrigues", glb
    )

    # encoder stub: precomputed shared latent + the reference's own index
    index_fn = extract_method(
        "lib/encoder.py", "SpatialEncoder", "index",
        {**glb, "profiler": torch.autograd.profiler},
    )
    class _Enc:
        """Precomputed-latent stand-in: encode_images calls
        ``self.encoder_2d(images)`` and ``index`` samples the latent."""

        latent = torch.from_numpy(scene["latent"])

        def __call__(self, images):
            return self.latent

    _Enc.index = index_fn  # bound like a normal method

    self_ = types.SimpleNamespace(
        SMPL_NEUTRAL=_torch_smpl(scene["smpl"]),
        human_sample=True, correction_field=False, skinning_field=False,
        use_trans=True, append_rgb=True, with_viewdirs=with_viewdirs,
        smooth_loss=False, training=False,
        extract_mesh=False, mesh_animation=False,
        mean_shape=False, data_set_type="THuman_B",
        skips=[4], image_shape=torch.zeros(2),
        pos_enc=helpers.PositionalEncoding(num_freqs=6),
        view_enc=helpers.PositionalEncoding(num_freqs=4),
        transformer=tail_net.transformer,
        latent_codes=tail_net.latent_codes,
        pts_linears=tail_net.pts_linears,
        alpha_linear=tail_net.alpha_linear,
        feature_linear=tail_net.feature_linear,
        views_linear=tail_net.views_linear,
        rgb_linear=tail_net.rgb_linear,
        encoder_2d=_Enc(),
    )
    self_.SMPL_MALE = self_.SMPL_FEMALE = self_.SMPL_NEU = self_.SMPL_NEUTRAL
    for meth in (
        "coarse_deform_target2c", "coarse_deform_c2source",
        "big_pose_params", "encode_images", "projection",
        "backward_fusion", "normalize_pts",
    ):
        setattr(
            self_, meth,
            types.MethodType(
                extract_method("lib/skinnning_batch.py", "SKinningBatch",
                               meth, glb),
                self_,
            ),
        )
    fwd = extract_method(
        "lib/skinnning_batch.py", "SKinningBatch", "forward", glb
    )
    return types.MethodType(fwd, self_)


def _our_variables(scene, tail_net, with_viewdirs=False):
    """Init our model, then overwrite the tail subtrees with the torch
    weights through the checkpoint importer."""
    from mpsnerf_tpu.compat.torch_import import convert_reference_state_dict
    from mpsnerf_tpu.models.mps_nerf import MPSNeRF
    from mpsnerf_tpu.train.trainer import to_device_input

    model = MPSNeRF(
        num_instances=1, compact_fraction=None, mean_shape=False,
        with_viewdirs=with_viewdirs,
    )
    inp = to_device_input(scene["item"])
    variables = model.init(
        {"params": jax.random.PRNGKey(0)}, scene["smpl"], inp, inp,
        jnp.asarray(scene["pts"][:8]), jnp.asarray(scene["vd"][:8]),
        train=False,
    )
    sd = {k: v.numpy() for k, v in tail_net.state_dict().items()}
    conv, _, report = convert_reference_state_dict(sd)
    assert not report["skipped"], report["skipped"]

    params = dict(jax.device_get(variables["params"]))
    for key, sub in conv.items():
        if key == "latent_codes":
            # the flagship query never invokes the embedding (the
            # reference computes-and-discards it), so our tree has no
            # params for it — nothing to import
            continue
        assert key in params, f"importer emitted unknown module {key}"
        ref_shapes = jax.tree.map(np.shape, sub)
        our_shapes = jax.tree.map(np.shape, jax.device_get(params[key]))
        assert ref_shapes == our_shapes, (key, ref_shapes, our_shapes)
        params[key] = jax.tree.map(jnp.asarray, sub)
    return model, {**variables, "params": params}, inp


class TestFullForward:
    @pytest.fixture(scope="class")
    def outputs(self, scene, tail_net, with_viewdirs):
        """Run both full chains once; tests below slice the results."""
        from _pytest.monkeypatch import MonkeyPatch

        mp = MonkeyPatch()
        try:
            ref_forward = _build_ref_forward(
                scene, tail_net, with_viewdirs, mp
            )
            sp = _ref_inputs(scene["item"])
            tp = copy.deepcopy(sp)  # sequeeze_0 mutates; keep sp/tp distinct
            raw_ref = (
                ref_forward(
                    sp, tp,
                    torch.from_numpy(scene["pts"])[None],
                    torch.from_numpy(scene["vd"])[None],
                )
                .detach()
                .numpy()[0]
            )  # (N, 17)
        finally:
            mp.undo()

        model, variables, inp = _our_variables(
            scene, tail_net, with_viewdirs
        )
        raw_ours = jax.jit(
            model.apply, static_argnames=("train", "method")
        )(
            variables, scene["smpl"], inp, inp,
            jnp.asarray(scene["latent"]), jnp.asarray(scene["pts"]),
            jnp.asarray(scene["vd"]), train=False, method="query",
        )
        return raw_ref, jax.device_get(raw_ours)

    def test_pts_mask(self, outputs):
        raw_ref, ours = outputs
        np.testing.assert_array_equal(
            np.asarray(ours.pts_mask), raw_ref[:, 4].astype(np.int32)
        )
        # the scene must actually exercise the human region
        assert 0 < ours.pts_mask.sum() < ours.pts_mask.shape[0]

    def test_raw_rgb_sigma(self, outputs):
        """Pre-activation rgb/sigma parity on every point (masked points
        are exact -80 fills on both sides)."""
        raw_ref, ours = outputs
        np.testing.assert_allclose(
            np.asarray(ours.rgb), raw_ref[:, 0:3], atol=5e-4
        )
        np.testing.assert_allclose(
            np.asarray(ours.sigma), raw_ref[:, 3], atol=5e-4
        )

    def test_intermediate_channels(self, outputs):
        """smpl_query/src points: the stage INTERFACES (mask order, warp
        composition) — tighter tolerance, geometry only compounds two
        matmul stages."""
        raw_ref, ours = outputs
        m = raw_ref[:, 4] == 1
        np.testing.assert_allclose(
            np.asarray(ours.smpl_query_pts)[m], raw_ref[m, 11:14],
            atol=5e-5,
        )
        np.testing.assert_allclose(
            np.asarray(ours.smpl_src_pts)[m], raw_ref[m, 14:17], atol=5e-5
        )

    def test_composited_pixels(self, outputs, scene):
        """The actual parity bar proxy: composited pixel values of the
        full chain match the reference's render to ~1e-4."""
        from mpsnerf_tpu.ops.composite import composite_rays

        helpers = load_ref_module("lib.run_nerf_helpers")
        raw2outputs = extract_fn(
            "run_nerf_batch.py", "raw2outputs",
            {
                "torch": torch,
                "global_args": types.SimpleNamespace(occupancy=False),
                "density_actfn": helpers.shifted_softplus,
                "rgb_actfn": helpers.wide_sigmoid,
            },
        )
        raw_ref, ours = outputs
        z = scene["z"]
        rd = scene["rd"]

        rgb_ref, _, acc_ref, _, _, _ = raw2outputs(
            torch.from_numpy(
                raw_ref[:, :4].reshape(N_RAYS, N_SAMPLES, 4)
            )[None],
            torch.from_numpy(z)[None],
            torch.from_numpy(rd)[None],
            white_bkgd=False,
        )
        out = composite_rays(
            jnp.asarray(np.asarray(ours.rgb).reshape(N_RAYS, N_SAMPLES, 3)),
            jnp.asarray(np.asarray(ours.sigma).reshape(N_RAYS, N_SAMPLES)),
            jnp.asarray(z), jnp.asarray(rd),
            occupancy=False, white_bkgd=False,
        )
        np.testing.assert_allclose(
            np.asarray(out.rgb_map), rgb_ref[0].numpy(), atol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(out.acc_map), acc_ref[0].numpy(), atol=1e-4
        )


class TestFullForwardGrad:
    """Full-chain GRADIENT parity: torch autograd of
    ``img2mse(raw2outputs(SKinningBatch.forward(...)))`` (the training
    loss of run_nerf_batch.py:549-573, pair/smooth terms off) against our
    ``jax.grad`` of the identical loss, per tail parameter.  The forward
    oracle above proves the primal chain; this is the instrument that
    catches detach/stop-gradient drift — a stop_gradient our side places
    where the reference does not (or vice versa) changes NOTHING in the
    forward test but shifts these gradients."""

    @pytest.fixture(scope="class")
    def grads(self, scene, tail_net, with_viewdirs):
        from _pytest.monkeypatch import MonkeyPatch

        from mpsnerf_tpu.compat.torch_import import (
            convert_reference_state_dict,
        )
        from mpsnerf_tpu.ops.composite import composite_rays

        rng = np.random.default_rng(7)
        target = rng.uniform(0, 1, (N_RAYS, 3)).astype(np.float32)

        # ---- torch side: same extracted forward, loss kept in-graph
        helpers = load_ref_module("lib.run_nerf_helpers")
        raw2outputs = extract_fn(
            "run_nerf_batch.py", "raw2outputs",
            {
                "torch": torch,
                "global_args": types.SimpleNamespace(occupancy=False),
                "density_actfn": helpers.shifted_softplus,
                "rgb_actfn": helpers.wide_sigmoid,
            },
        )
        mp = MonkeyPatch()
        try:
            ref_forward = _build_ref_forward(
                scene, tail_net, with_viewdirs, mp
            )
            sp = _ref_inputs(scene["item"])
            tp = copy.deepcopy(sp)
            tail_net.zero_grad(set_to_none=True)
            raw = ref_forward(
                sp, tp,
                torch.from_numpy(scene["pts"])[None],
                torch.from_numpy(scene["vd"])[None],
            )  # (1, N, 17), graph attached
            rgb_ref, _, _, _, _, _ = raw2outputs(
                raw[0, :, :4].reshape(N_RAYS, N_SAMPLES, 4)[None],
                torch.from_numpy(scene["z"])[None],
                torch.from_numpy(scene["rd"])[None],
                white_bkgd=False,
            )
            loss_t = torch.mean(
                (rgb_ref[0] - torch.from_numpy(target)) ** 2
            )
            loss_t.backward()
        finally:
            mp.undo()

        gd = {
            name: p.grad.numpy()
            for name, p in tail_net.named_parameters()
            if p.grad is not None
        }
        assert gd, "reference backward produced no gradients"
        conv, _, _ = convert_reference_state_dict(gd)

        # ---- our side: jax.grad of the identical loss
        model, variables, inp = _our_variables(
            scene, tail_net, with_viewdirs
        )
        smpl = scene["smpl"]
        latent = jnp.asarray(scene["latent"])
        pts = jnp.asarray(scene["pts"])
        vd = jnp.asarray(scene["vd"])
        z = jnp.asarray(scene["z"])
        rd = jnp.asarray(scene["rd"])
        tgt = jnp.asarray(target)

        def loss_fn(params):
            out = model.apply(
                {**variables, "params": params}, smpl, inp, inp,
                latent, pts, vd, train=False, method="query",
            )
            comp = composite_rays(
                out.rgb.reshape(N_RAYS, N_SAMPLES, 3),
                out.sigma.reshape(N_RAYS, N_SAMPLES),
                z, rd, occupancy=False, white_bkgd=False,
            )
            return jnp.mean((comp.rgb_map - tgt) ** 2), comp.rgb_map

        (loss_j, _), grads_j = jax.jit(
            jax.value_and_grad(loss_fn, has_aux=True)
        )(variables["params"])
        np.testing.assert_allclose(
            float(loss_j), float(loss_t.detach()), atol=1e-6, rtol=1e-4,
            err_msg="primal losses diverge — grads are not comparable",
        )
        return conv, jax.device_get(grads_j)

    def test_tail_param_grads(self, grads):
        conv, ours = grads
        checked = 0
        for key, ref_sub in conv.items():
            if key == "latent_codes":
                continue  # computed-and-discarded in the reference
            assert key in ours, f"no grads for imported module {key}"
            ref_flat = jax.tree.leaves_with_path(ref_sub)
            our_sub = ours[key]
            for path, ref_g in ref_flat:
                our_g = our_sub
                for p in path:
                    our_g = our_g[p.key]
                scale = max(float(np.abs(ref_g).max()), 1e-8)
                np.testing.assert_allclose(
                    np.asarray(our_g), ref_g, atol=max(1e-4, 1e-3 * scale),
                    err_msg=f"grad mismatch at {key}/"
                    f"{'/'.join(p.key for p in path)}",
                )
                checked += 1
        # every tail module must actually be exercised
        assert checked >= 20, checked

    def test_grads_nonzero(self, grads):
        """A detach that zeroes a whole module would satisfy a sloppy
        allclose if the reference grad were also ~0; require real signal
        through every imported module."""
        conv, ours = grads
        for key in conv:
            if key == "latent_codes":
                continue
            total = sum(
                float(np.abs(g).sum()) for g in jax.tree.leaves(ours[key])
            )
            assert total > 1e-7, f"module {key} received ~zero gradient"
