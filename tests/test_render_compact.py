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


class TestHierarchicalSampling:
    """render_rays(n_importance > 0): the hierarchical pass the reference
    accepts but leaves dead (run_nerf_batch.py:401-444 takes N_importance
    and never calls sample_pdf) — wired here, default-off for parity."""

    def test_importance_pass_shapes_and_determinism(self, setup):
        from mpsnerf_tpu.renderer.render import render_rays

        model, variables, smpl, inp, latent, ro, rd, nr, fr = setup
        n, n_imp = 64, 8
        args = (model, variables, smpl, inp, inp, latent,
                ro[:n], rd[:n], nr[:n], fr[:n], jax.random.PRNGKey(3))
        out = render_rays(*args, n_samples=N_SAMPLES, perturb=0.0,
                          n_importance=n_imp)
        assert out.rgb_map.shape == (n, 3)
        assert out.weights.shape == (n, N_SAMPLES + n_imp)
        assert np.isfinite(np.asarray(out.rgb_map)).all()
        # det=(perturb==0): same key -> identical pixels
        out2 = render_rays(*args, n_samples=N_SAMPLES, perturb=0.0,
                           n_importance=n_imp)
        np.testing.assert_array_equal(
            np.asarray(out.rgb_map), np.asarray(out2.rgb_map)
        )

    def test_importance_samples_follow_coarse_weights(self, setup):
        """Fine z values must land inside the coarse pass's high-weight
        interval (the inverse-CDF property, NeRF section 5.2)."""
        from mpsnerf_tpu.ops.composite import sample_pdf

        key = jax.random.PRNGKey(0)
        bins = jnp.linspace(0.0, 1.0, 9)[None].repeat(4, 0)  # (4, 9)
        w = jnp.zeros((4, 8)).at[:, 3].set(1.0)  # all mass in bin 3
        z = sample_pdf(key, bins, w, 16, det=True)
        z = np.asarray(z)
        lo, hi = 3 / 8, 4 / 8
        # the reference's +1e-5 weight epsilon leaks a little mass to the
        # other bins, so the extreme det quantiles (u=0, u=1) land outside
        frac_in = ((z >= lo - 1e-3) & (z <= hi + 1e-3)).mean()
        assert frac_in >= 14 / 16, frac_in

    def test_zero_importance_is_the_default_path(self, setup):
        from mpsnerf_tpu.renderer.render import render_rays

        model, variables, smpl, inp, latent, ro, rd, nr, fr = setup
        n = 64
        args = (model, variables, smpl, inp, inp, latent,
                ro[:n], rd[:n], nr[:n], fr[:n], jax.random.PRNGKey(3))
        a = render_rays(*args, n_samples=N_SAMPLES, perturb=0.0)
        b = render_rays(*args, n_samples=N_SAMPLES, perturb=0.0,
                        n_importance=0)
        np.testing.assert_array_equal(
            np.asarray(a.rgb_map), np.asarray(b.rgb_map)
        )
