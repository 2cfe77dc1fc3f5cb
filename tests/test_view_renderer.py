"""ViewRenderer: shuffled-chunk rendering, masked-ray mode, latent cache."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mpsnerf_tpu.data.synthetic import SyntheticHumanDataset
from mpsnerf_tpu.eval.runner import ViewRenderer
from mpsnerf_tpu.models.mps_nerf import MPSNeRF
from mpsnerf_tpu.train.trainer import to_device_input


@pytest.fixture(scope="module")
def setup():
    ds = SyntheticHumanDataset(
        n_poses=2, n_cameras=4, image_size=64, n_rays=32, n_verts=500,
        num_instances=1, split="test",
    )
    items = [ds.get_item(i, instance_idx=0) for i in range(2)]
    smpl = ds.smpl_for(0)
    inp = to_device_input(items[0])
    model = MPSNeRF(num_instances=1)
    variables = model.init(
        {"params": jax.random.PRNGKey(0)}, smpl, inp, inp,
        jnp.zeros((8, 3)), jnp.zeros((8, 3)), train=False,
    )
    return ds, items, smpl, model, variables


class TestViewRenderer:
    def test_shuffle_matches_unshuffled(self, setup):
        ds, items, smpl, model, variables = setup
        common = dict(chunk=512, n_samples=8, eval_compact_fraction=0.5)
        r_shuf = ViewRenderer(model, lambda g: smpl, shuffle_rays=True,
                              **common)
        r_plain = ViewRenderer(model, lambda g: smpl, shuffle_rays=False,
                               **common)
        a = r_shuf.render_view(variables, items[0], items[0], 1)
        b = r_plain.render_view(variables, items[0], items[0], 1)
        np.testing.assert_allclose(a, b, atol=1e-5)

    def test_global_matches_chunked(self, setup):
        """The global-compaction path and the per-chunk path must produce
        the same image."""
        ds, items, smpl, model, variables = setup
        common = dict(chunk=512, n_samples=8, eval_compact_fraction=0.5)
        r_g = ViewRenderer(model, lambda g: smpl, global_compact=True,
                           **common)
        r_c = ViewRenderer(model, lambda g: smpl, global_compact=False,
                           **common)
        a = r_g.render_view(variables, items[0], items[0], 1)
        b = r_c.render_view(variables, items[0], items[0], 1)
        np.testing.assert_allclose(a, b, atol=2e-5)

    def test_hierarchical_eval_chunk_invariant(self, setup):
        """--N_importance > 0 at eval: forces the chunked path (the
        global plan only covers the stratified ladder), reaches the
        render (image differs from n_importance=0), and is invariant
        to chunk size (perturb=0 => deterministic importance z)."""
        ds, items, smpl, model, variables = setup
        common = dict(n_samples=8, n_importance=4,
                      eval_compact_fraction=0.5, shuffle_rays=False)
        r_a = ViewRenderer(model, lambda g: smpl, chunk=512, **common)
        assert not r_a.global_compact
        r_b = ViewRenderer(model, lambda g: smpl, chunk=2048, **common)
        a = r_a.render_view(variables, items[0], items[0], 1)
        b = r_b.render_view(variables, items[0], items[0], 1)
        np.testing.assert_allclose(a, b, atol=2e-5)
        plain = ViewRenderer(
            model, lambda g: smpl, chunk=512, n_samples=8,
            eval_compact_fraction=0.5, shuffle_rays=False,
            global_compact=False,
        ).render_view(variables, items[0], items[0], 1)
        assert np.abs(a - plain).max() > 1e-4

    def test_masked_ray_mode(self, setup):
        """H36M-style rendering: only mask_at_box rays are rendered;
        unmasked pixels are exactly zero, masked ones match a full
        render."""
        ds, items, smpl, model, variables = setup
        r = ViewRenderer(model, lambda g: smpl, chunk=512, n_samples=8,
                         eval_compact_fraction=0.5)
        k = 1
        mask = np.asarray(items[0]["mask_at_box_all"][k]).reshape(-1)
        out_masked = r.render_view(
            variables, items[0], items[0], k, ray_mask=mask
        )
        out_full = r.render_view(variables, items[0], items[0], k)
        assert (out_masked[~mask] == 0).all()
        np.testing.assert_allclose(
            out_masked[mask], out_full[mask], atol=1e-5
        )

    def test_overflow_guard_falls_back_uncompacted(self, setup):
        """A capacity far below the view's in-body fraction (a 'close-up'
        in miniature) must trip the n_dropped guard and re-render the
        overflowing chunks uncompacted — the result has to match an
        uncompacted reference render, not silently drop samples."""
        ds, items, smpl, model, variables = setup
        k = 1
        # 512 rays x 32 samples = 16384 pts/chunk vs the 1024-pt capacity
        # floor: any chunk with >6.25% in-body samples overflows
        # global_compact off: this exercises the per-chunk path's guard
        # (the global path pre-counts candidates exactly and cannot
        # overflow; its parity is covered by tests/test_render_compact.py)
        r_tight = ViewRenderer(
            model, lambda g: smpl, chunk=512, n_samples=32,
            eval_compact_fraction=1e-6,  # floor cap (1024 pts) << valid pts
            shuffle_rays=False,          # body-dense chunks stay dense
            global_compact=False,
        )
        r_exact = ViewRenderer(
            model.clone(compact_fraction=None), lambda g: smpl,
            chunk=512, n_samples=32,
            eval_compact_fraction=None, shuffle_rays=False,
            global_compact=False,
        )
        out_tight = r_tight.render_view(variables, items[0], items[0], k)
        assert r_tight.n_overflow_chunks > 0
        out_exact = r_exact.render_view(variables, items[0], items[0], k)
        np.testing.assert_allclose(out_tight, out_exact, atol=1e-5)

    def test_latent_cache_per_item(self, setup):
        """Different source items must not share cached latents."""
        ds, items, smpl, model, variables = setup
        r = ViewRenderer(model, lambda g: smpl, chunk=512, n_samples=8)
        r.render_view(variables, items[0], items[0], 1)
        r.render_view(variables, items[1], items[1], 1)
        l0 = items[0]["_latent_cache"]
        l1 = items[1]["_latent_cache"]
        assert float(jnp.abs(l0 - l1).max()) > 0  # distinct encodings

    def test_async_matches_sync_global(self, setup):
        """render_view_async + finish_view == render_view on the global
        path, including overlapped dispatches (two in flight)."""
        ds, items, smpl, model, variables = setup
        r = ViewRenderer(model, lambda g: smpl, chunk=512, n_samples=8,
                         global_compact=True)
        sync0 = r.render_view(variables, items[0], items[0], 1)
        sync1 = r.render_view(variables, items[1], items[1], 2)
        h0 = r.render_view_async(variables, items[0], items[0], 1)
        h1 = r.render_view_async(variables, items[1], items[1], 2)
        np.testing.assert_array_equal(r.finish_view(h0), sync0)
        np.testing.assert_array_equal(r.finish_view(h1), sync1)

    def test_async_matches_sync_chunked(self, setup):
        """The chunked fallback completes eagerly inside the handle."""
        ds, items, smpl, model, variables = setup
        r = ViewRenderer(model, lambda g: smpl, chunk=512, n_samples=8,
                         global_compact=False)
        sync = r.render_view(variables, items[0], items[0], 1)
        h = r.render_view_async(variables, items[0], items[0], 1)
        assert h.done is not None
        np.testing.assert_array_equal(r.finish_view(h), sync)

    def test_device_cache_refresh_source_then_target(self, setup):
        """An item first uploaded as a SOURCE (no body_grid attached)
        must refresh its device cache when later rendered as a TARGET
        (the novel-view pass reuses pose items): a stale cache misses
        body_grid and the jitted plan pre-pass raises KeyError."""
        ds, items, smpl, model, variables = setup
        i0 = ds.get_item(0, instance_idx=0)
        i1 = ds.get_item(1, instance_idx=0)
        r = ViewRenderer(model, lambda g: smpl, chunk=512, n_samples=8,
                         global_compact=True)
        r.render_view(variables, i0, i1, 1)   # i0 cached as source only
        assert "body_grid" not in i0["_device_cache"]
        out = r.render_view(variables, i0, i0, 1)  # i0 now a target
        assert "body_grid" in i0["_device_cache"]
        assert out.shape[1] == 3
