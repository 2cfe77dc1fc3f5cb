"""End-to-end model + renderer + compaction tests (tiny synthetic scene)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mpsnerf_tpu.data.synthetic import SyntheticHumanDataset
from mpsnerf_tpu.models.mps_nerf import MPSNeRF, MASK_FILL
from mpsnerf_tpu.renderer.render import render_rays
from mpsnerf_tpu.train.trainer import to_device_input
from mpsnerf_tpu.ops.compact import plan_compaction, compact, expand


@pytest.fixture(scope="module")
def scene():
    ds = SyntheticHumanDataset(
        n_poses=1, n_cameras=4, image_size=64, n_rays=48, n_verts=500,
        num_instances=1,
    )
    item = ds.get_item(0, instance_idx=0)
    return ds, ds.smpl_for(0), to_device_input(item)


@pytest.fixture(scope="module")
def model_and_vars(scene):
    _, smpl, inp = scene
    model = MPSNeRF(num_instances=1)
    variables = model.init(
        {"params": jax.random.PRNGKey(0)}, smpl, inp, inp,
        jnp.zeros((8, 3)), jnp.zeros((8, 3)), train=False,
    )
    return model, variables


class TestCompaction:
    def test_roundtrip_no_overflow(self):
        rng = np.random.default_rng(0)
        mask = jnp.asarray((rng.uniform(size=100) < 0.3).astype(np.int32))
        x = jnp.asarray(rng.normal(size=(100, 3)).astype(np.float32))
        plan = plan_compaction(mask, 64)
        back = expand(plan, compact(plan, x), -1.0)
        m = np.asarray(mask) == 1
        np.testing.assert_allclose(np.asarray(back)[m], np.asarray(x)[m])
        assert (np.asarray(back)[~m] == -1.0).all()

    def test_overflow_drops_tail(self):
        mask = jnp.ones((10,), jnp.int32)
        x = jnp.arange(10.0)[:, None]
        plan = plan_compaction(mask, 4)
        back = expand(plan, compact(plan, x), -1.0)
        np.testing.assert_allclose(np.asarray(back)[:4, 0], [0, 1, 2, 3])
        assert (np.asarray(back)[4:] == -1.0).all()
        assert int(plan.n_valid) == 10

    def test_gradient_flows(self):
        mask = jnp.asarray([1, 0, 1, 1, 0], jnp.int32)
        plan = plan_compaction(mask, 4)

        def f(x):
            return jnp.sum(expand(plan, compact(plan, x) ** 2, 0.0))

        g = jax.grad(f)(jnp.arange(5.0))
        np.testing.assert_allclose(np.asarray(g), [0, 0, 4, 6, 0])

    @pytest.mark.parametrize("density,cap,channels", [
        (0.3, 64, 1), (0.3, 64, 4), (0.9, 16, 3), (1.0, 32, 2),
    ])
    def test_expand_scatter_matches_gather(self, density, cap, channels):
        from mpsnerf_tpu.ops.compact import expand_gather, expand_scatter

        rng = np.random.default_rng(1)
        mask = jnp.asarray(
            (rng.uniform(size=100) < density).astype(np.int32)
        )
        plan = plan_compaction(mask, cap)
        buf = jnp.asarray(
            rng.normal(size=(cap, channels)).astype(np.float32)
        )
        a = np.asarray(expand_gather(plan, buf, -5.0))
        b = np.asarray(expand_scatter(plan, buf, -5.0))
        np.testing.assert_allclose(a, b)
        # and after a resize_plan cut (junk gather_idx beyond the cut)
        from mpsnerf_tpu.ops.compact import resize_plan

        small = resize_plan(plan, cap // 2)
        a = np.asarray(expand_gather(small, buf[: cap // 2], -5.0))
        b = np.asarray(expand_scatter(small, buf[: cap // 2], -5.0))
        np.testing.assert_allclose(a, b)

    def test_expand_scatter_gradient_matches_gather(self):
        from mpsnerf_tpu.ops.compact import expand_gather, expand_scatter

        mask = jnp.asarray([1, 0, 1, 1, 0, 1, 1, 0], jnp.int32)
        plan = plan_compaction(mask, 4)  # overflow: 5 valid, cap 4
        buf0 = jnp.arange(8.0).reshape(4, 2)

        def loss(form, buf):
            out = form(plan, buf, 0.0)
            return jnp.sum(out * jnp.arange(out.size).reshape(out.shape))

        ga = jax.grad(lambda b: loss(expand_gather, b))(buf0)
        gb = jax.grad(lambda b: loss(expand_scatter, b))(buf0)
        np.testing.assert_allclose(np.asarray(ga), np.asarray(gb))

    def test_expand_scatter_composed_plan(self):
        """fine∘coarse composed plan == nested gather-expand.

        Mirrors renderer/render.py's fine path: the composed plan's
        slot/take are the coarse stage's, so only expand_scatter is valid
        on it — the test asserts it reproduces the two-level expand.
        """
        from mpsnerf_tpu.ops.compact import (
            Compaction, expand_gather, expand_scatter,
        )

        rng = np.random.default_rng(2)
        n = 200
        coarse_mask = jnp.asarray(
            (rng.uniform(size=n) < 0.4).astype(np.int32)
        )
        cap = 96
        plan = plan_compaction(coarse_mask, cap)
        # fine mask over the coarse buffer (junk slots masked out)
        valid_slots = np.arange(cap) < int(plan.n_valid)
        fine_mask = jnp.asarray(
            ((rng.uniform(size=cap) < 0.6) & valid_slots).astype(np.int32)
        )
        fcap = 64
        plan2 = plan_compaction(fine_mask, fcap)
        buf = jnp.asarray(rng.normal(size=(fcap, 4)).astype(np.float32))

        nested = expand_gather(
            plan, expand_gather(plan2, buf, -80.0), -80.0
        )
        composed = Compaction(
            gather_idx=plan.gather_idx[plan2.gather_idx],
            slot=plan.slot, take=plan.take, n_valid=plan2.n_valid,
        )
        flat = expand_scatter(composed, buf, -80.0)
        np.testing.assert_allclose(np.asarray(nested), np.asarray(flat))


class TestModelForward:
    def test_query_shapes_and_mask(self, scene, model_and_vars):
        _, smpl, inp = scene
        model, variables = model_and_vars
        n = 256
        rng = np.random.default_rng(0)
        verts = np.asarray(inp["vertices"])
        near_body = jnp.asarray(
            verts[rng.integers(0, len(verts), n // 2)]
            + rng.normal(size=(n // 2, 3)) * 0.01,
            jnp.float32,
        )
        far_away = jnp.asarray(
            rng.normal(size=(n - n // 2, 3)) * 0.05 + 10.0, jnp.float32
        )
        pts = jnp.concatenate([near_body, far_away])
        dirs = jnp.ones((n, 3)) / np.sqrt(3)

        raw = model.apply(
            variables, smpl, inp, inp, pts, dirs, train=False,
        )
        assert raw.rgb.shape == (n, 3)
        assert raw.sigma.shape == (n,)
        mask = np.asarray(raw.pts_mask)
        assert mask[: n // 2].mean() > 0.9    # on-body points kept
        assert mask[n // 2:].sum() == 0       # far points masked
        # masked raw filled with -80
        assert (np.asarray(raw.sigma)[n // 2:] == MASK_FILL).all()
        assert (np.asarray(raw.rgb)[n // 2:] == MASK_FILL).all()
        # packed protocol has 23 channels
        assert raw.packed().shape == (n, 23)

    def test_compaction_parity(self, scene, model_and_vars):
        _, smpl, inp = scene
        model, variables = model_and_vars
        m_full = MPSNeRF(num_instances=1, compact_fraction=None)
        k = 0
        args = (
            inp["ray_o_all"][k], inp["ray_d_all"][k],
            inp["near_all"][k][:, 0], inp["far_all"][k][:, 0],
        )
        lat = model.apply(
            variables, inp["img_all"], train=False, method="encode"
        )
        o1 = render_rays(m_full, variables, smpl, inp, inp, lat, *args,
                         jax.random.PRNGKey(5), n_samples=8, perturb=0.0)
        o2 = render_rays(model, variables, smpl, inp, inp, lat, *args,
                         jax.random.PRNGKey(5), n_samples=8, perturb=0.0)
        np.testing.assert_allclose(
            np.asarray(o1.rgb_map), np.asarray(o2.rgb_map), atol=1e-5
        )

    def test_all_miss_rays_render_empty(self, scene, model_and_vars):
        _, smpl, inp = scene
        model, variables = model_and_vars
        lat = model.apply(
            variables, inp["img_all"], train=False, method="encode"
        )
        ro = jnp.full((16, 3), 5.0)
        rd = jnp.ones((16, 3))
        out = render_rays(
            model, variables, smpl, inp, inp, lat, ro, rd,
            jnp.zeros(16), jnp.ones(16), jax.random.PRNGKey(0),
            n_samples=8, perturb=0.0,
        )
        np.testing.assert_allclose(np.asarray(out.acc_map), 0.0, atol=1e-6)
        assert bool(jnp.isfinite(out.rgb_map).all())

    def test_extract_mesh_mode(self, scene, model_and_vars):
        _, smpl, inp = scene
        model, variables = model_and_vars
        lat = model.apply(
            variables, inp["img_all"], train=False, method="encode"
        )
        pts = jnp.asarray(
            np.random.default_rng(0).normal(size=(64, 3)) * 0.2, jnp.float32
        )
        raw = model.apply(
            variables, smpl, inp, inp, lat, pts, jnp.ones((64, 3)),
            train=False, mode="extract_mesh", method=MPSNeRF.query,
        )
        assert raw.sigma.shape == (64,)
        assert (np.asarray(raw.pts_mask) == 1).all()  # no human-region cull
