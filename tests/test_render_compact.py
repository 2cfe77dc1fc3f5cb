"""Global-compaction renderer: pixel parity with the per-chunk mapped path,
overflow reporting, and gradient-free eval semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mpsnerf_tpu.data.synthetic import SyntheticHumanDataset
from mpsnerf_tpu.data import attach_body_grid
from mpsnerf_tpu.models.mps_nerf import MPSNeRF
from mpsnerf_tpu.renderer.render import (
    render_rays_compact,
    render_rays_mapped,
)
from mpsnerf_tpu.train.trainer import to_device_input


@pytest.fixture(scope="module")
def setup():
    ds = SyntheticHumanDataset(
        n_poses=1, n_cameras=4, image_size=64, n_rays=32, n_verts=500,
        num_instances=1, split="test",
    )
    item = ds.get_item(0, instance_idx=0)
    attach_body_grid(item)
    smpl = ds.smpl_for(0)
    inp = to_device_input(item)
    model = MPSNeRF(num_instances=1, compact_fraction=0.5)
    variables = model.init(
        {"params": jax.random.PRNGKey(0)}, smpl, inp, inp,
        jnp.zeros((8, 3)), jnp.zeros((8, 3)), train=False,
    )
    latent = model.apply(
        variables, inp["img_all"], train=False, method=MPSNeRF.encode
    )
    k = 1
    ro = jnp.asarray(item["ray_o_all"][k], jnp.float32)
    rd = jnp.asarray(item["ray_d_all"][k], jnp.float32)
    nr = jnp.asarray(item["near_all"][k], jnp.float32).reshape(-1)
    fr = jnp.asarray(item["far_all"][k], jnp.float32).reshape(-1)
    n = 1024  # chunk-divisible ray subset crossing the body
    sl = slice(1536, 1536 + n)
    return (model, variables, smpl, inp, latent,
            ro[sl], rd[sl], nr[sl], fr[sl])


N_SAMPLES = 8


class TestRenderCompact:
    def test_matches_mapped_renderer(self, setup):
        model, variables, smpl, inp, latent, ro, rd, nr, fr = setup
        key = jax.random.PRNGKey(0)
        rgb_m, disp_m, acc_m = render_rays_mapped(
            model, variables, smpl, inp, inp, latent, ro, rd, nr, fr,
            key, chunk=256, n_samples=N_SAMPLES, perturb=0.0, train=False,
        )
        rgb_c, disp_c, acc_c, nd = jax.jit(
            lambda *a: render_rays_compact(
                model, variables, smpl, inp, inp, latent, *a,
                n_samples=N_SAMPLES, capacity=2048, tile=512, perturb=0.0,
            )
        )(ro, rd, nr, fr, key)
        assert int(nd) == 0
        np.testing.assert_allclose(
            np.asarray(rgb_c), np.asarray(rgb_m), atol=2e-5
        )
        np.testing.assert_allclose(
            np.asarray(acc_c), np.asarray(acc_m), atol=2e-5
        )
        # body rays must actually hit something (non-trivial scene)
        assert float(jnp.max(acc_c)) > 0.1

    def test_plan_prepass_matches_inline(self, setup):
        """Supplying the plan_rays_compact pre-pass plan must be
        pixel-identical to the in-render cull + cumsum."""
        from mpsnerf_tpu.renderer.render import plan_rays_compact

        model, variables, smpl, inp, latent, ro, rd, nr, fr = setup
        key = jax.random.PRNGKey(0)
        base = render_rays_compact(
            model, variables, smpl, inp, inp, latent, ro, rd, nr, fr,
            key, n_samples=N_SAMPLES, capacity=2048, tile=512, perturb=0.0,
        )
        plan = plan_rays_compact(
            smpl, inp, ro, rd, nr, fr, key, n_samples=N_SAMPLES,
        )
        pre = render_rays_compact(
            model, variables, smpl, inp, inp, latent, ro, rd, nr, fr,
            key, n_samples=N_SAMPLES, capacity=2048, tile=512, perturb=0.0,
            plan=plan,
        )
        assert int(base[3]) == 0 and int(pre[3]) == 0
        np.testing.assert_array_equal(np.asarray(pre[0]), np.asarray(base[0]))
        np.testing.assert_array_equal(np.asarray(pre[2]), np.asarray(base[2]))

    def test_fine_stage_matches_single_stage(self, setup):
        """Second-stage exact-mask compaction (fine pre-pass) must be
        pixel-identical to the single-stage path."""
        from mpsnerf_tpu.renderer.render import (
            fine_rays_compact, plan_rays_compact,
        )

        model, variables, smpl, inp, latent, ro, rd, nr, fr = setup
        key = jax.random.PRNGKey(0)
        base = render_rays_compact(
            model, variables, smpl, inp, inp, latent, ro, rd, nr, fr,
            key, n_samples=N_SAMPLES, capacity=2048, tile=512, perturb=0.0,
        )
        plan = plan_rays_compact(
            smpl, inp, ro, rd, nr, fr, key, n_samples=N_SAMPLES,
        )
        fplan, fids = fine_rays_compact(
            smpl, inp, ro, rd, nr, fr, key, n_samples=N_SAMPLES,
            plan=plan, capacity=2048,
        )
        assert 0 < int(fplan.n_valid) <= 1536
        fine = render_rays_compact(
            model, variables, smpl, inp, inp, latent, ro, rd, nr, fr,
            key, n_samples=N_SAMPLES, capacity=2048, tile=512,
            fine_capacity=1536, perturb=0.0,
            plan=plan, fine_plan=fplan, fine_ids=fids,
        )
        assert int(base[3]) == 0 and int(fine[3]) == 0
        np.testing.assert_allclose(
            np.asarray(fine[0]), np.asarray(base[0]), atol=2e-5
        )
        np.testing.assert_allclose(
            np.asarray(fine[2]), np.asarray(base[2]), atol=2e-5
        )

    def test_fine_stage_overflow_reported(self, setup):
        from mpsnerf_tpu.renderer.render import (
            fine_rays_compact, plan_rays_compact,
        )

        model, variables, smpl, inp, latent, ro, rd, nr, fr = setup
        key = jax.random.PRNGKey(0)
        plan = plan_rays_compact(
            smpl, inp, ro, rd, nr, fr, key, n_samples=N_SAMPLES,
        )
        fplan, fids = fine_rays_compact(
            smpl, inp, ro, rd, nr, fr, key, n_samples=N_SAMPLES,
            plan=plan, capacity=2048,
        )
        *_, nd = render_rays_compact(
            model, variables, smpl, inp, inp, latent, ro, rd, nr, fr,
            key, n_samples=N_SAMPLES, capacity=2048, tile=128,
            fine_capacity=128, perturb=0.0,
            plan=plan, fine_plan=fplan, fine_ids=fids,
        )
        assert int(nd) > 0

    def test_overflow_is_reported(self, setup):
        model, variables, smpl, inp, latent, ro, rd, nr, fr = setup
        key = jax.random.PRNGKey(0)
        *_, nd = render_rays_compact(
            model, variables, smpl, inp, inp, latent, ro, rd, nr, fr,
            key, n_samples=N_SAMPLES, capacity=256, tile=256, perturb=0.0,
        )
        assert int(nd) > 0

    def test_capacity_overflow_only_drops_tail(self, setup):
        """Even at overflow the first `capacity` candidates render
        normally — the failure mode is bounded, not corrupting."""
        model, variables, smpl, inp, latent, ro, rd, nr, fr = setup
        key = jax.random.PRNGKey(0)
        rgb_small, *_ = render_rays_compact(
            model, variables, smpl, inp, inp, latent, ro, rd, nr, fr,
            key, n_samples=N_SAMPLES, capacity=256, tile=256, perturb=0.0,
        )
        assert np.isfinite(np.asarray(rgb_small)).all()
