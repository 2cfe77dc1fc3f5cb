"""Stage attribution for the CURRENT bench path (global compaction).

Times the three dispatches of the compact-mode bench separately on the
real chip — plan pre-pass (grid cull + cumsum), fine pre-pass (1-NN +
cumsum), render (tail + expand + composite) — plus model ablations of the
render stage, so round-3 perf work targets the real distribution (the
round-2 attribution predates the fine pre-pass / shared-plan rework).

Sync rule (axon tunnel): only a host fetch is a true sync; every timing
fetches one small array per iteration.
"""

import os
import time

import numpy as np


def timed(fn, *args, n=10, label=""):
    out = fn(*args)
    import jax
    np.asarray(jax.tree.leaves(out)[0])
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0])
    dt = (time.time() - t0) / n * 1e3
    print(f"{label:44s} {dt:8.1f} ms")
    return dt


def main():
    import jax
    import jax.numpy as jnp

    from mpsnerf_tpu.utils.compilation_cache import enable_compilation_cache

    enable_compilation_cache()

    from mpsnerf_tpu.data import attach_body_grid
    from mpsnerf_tpu.data.synthetic import SyntheticHumanDataset
    from mpsnerf_tpu.models.mps_nerf import MPSNeRF
    from mpsnerf_tpu.renderer.render import (
        fine_rays_compact, plan_rays_compact, render_rays_compact,
    )
    from mpsnerf_tpu.train.trainer import to_device_input
    from mpsnerf_tpu.rays.rays import get_rays, get_near_far

    H = W = 512
    N_SAMPLES = 128
    TILE = 16384
    DTYPE = os.environ.get("MPSNERF_BENCH_DTYPE", "bfloat16")

    ds = SyntheticHumanDataset(
        n_poses=1, n_cameras=4, image_size=H, n_rays=64, n_verts=6890,
        num_instances=1, input_views=[0, 1, 2],
    )
    item = ds.get_item(0, instance_idx=0)
    attach_body_grid(item)
    smpl = ds.smpl_for(0)
    inp = to_device_input(item)

    K, R, T = ds.cameras[3]
    ray_o, ray_d = get_rays(H, W, K, R, T)
    ray_o = ray_o.reshape(-1, 3)
    ray_d = ray_d.reshape(-1, 3)
    bounds = np.asarray(item["bounds"])
    near, far, hit = get_near_far(bounds, ray_o.copy(), ray_d.copy())
    near_all = np.zeros(ray_o.shape[0], np.float32)
    far_all = np.ones(ray_o.shape[0], np.float32)
    near_all[hit] = near
    far_all[hit] = far
    sel = np.flatnonzero(hit)

    ro = jnp.asarray(ray_o[sel])
    rd = jnp.asarray(ray_d[sel])
    nr = jnp.asarray(near_all[sel])
    fr = jnp.asarray(far_all[sel])
    key = jax.random.PRNGKey(0)

    n_pts = len(sel) * N_SAMPLES
    print(f"hit rays {len(sel)}  samples {n_pts}")

    @jax.jit
    def plan_fn(a, b, c, d):
        return plan_rays_compact(
            smpl, inp, a, b, c, d, key, n_samples=N_SAMPLES, perturb=0.0
        )

    plan0 = plan_fn(ro, rd, nr, fr)
    n_cand = int(plan0.n_valid)
    capacity = ((n_cand + TILE - 1) // TILE) * TILE
    print(f"candidates {n_cand} capacity {capacity}")

    @jax.jit
    def fine_fn(a, b, c, d, plan):
        return fine_rays_compact(
            smpl, inp, a, b, c, d, key, n_samples=N_SAMPLES,
            plan=plan, capacity=capacity, perturb=0.0,
        )

    fplan0, fids0 = fine_fn(ro, rd, nr, fr, plan0)
    n_fine = int(fplan0.n_valid)
    fine_capacity = ((n_fine + TILE - 1) // TILE) * TILE
    print(f"fine {n_fine} fine_capacity {fine_capacity}")

    # scalar-reduced variants: fetching the raw plan leaves (12M-element
    # arrays) through the tunnel would dominate the timing; a cheap sum
    # depending on every leaf keeps the work while the fetch is 4 bytes
    @jax.jit
    def plan_scalar(a, b, c, d):
        p = plan_fn(a, b, c, d)
        return sum(jnp.sum(x) for x in jax.tree.leaves(p))

    @jax.jit
    def fine_scalar(a, b, c, d, plan):
        fp, fi = fine_fn(a, b, c, d, plan)
        return sum(jnp.sum(x) for x in jax.tree.leaves((fp, fi)))

    t_plan = timed(
        plan_scalar, ro, rd, nr, fr, label="plan pre-pass (grid+cumsum)"
    )
    t_fine = timed(
        fine_scalar, ro, rd, nr, fr, plan0,
        label="fine pre-pass (1-NN+cumsum)",
    )

    def render_variant(label, fine=True, **overrides):
        kw = dict(num_instances=1, compact_fraction=None, compute_dtype=DTYPE)
        kw.update(overrides)
        model = MPSNeRF(**kw)
        variables = jax.jit(model.init, static_argnames=("train",))(
            {"params": jax.random.PRNGKey(0)}, smpl, inp, inp,
            jnp.zeros((8, 3)), jnp.zeros((8, 3)), train=False,
        )
        latent = jax.jit(model.apply, static_argnames=("train", "method"))(
            variables, inp["img_all"], train=False, method="encode",
        )

        fc = fine_capacity if fine else 0

        @jax.jit
        def image_fn(a, b, c, d, k, plan, fplan, fids):
            return render_rays_compact(
                model, variables, smpl, inp, inp, latent, a, b, c, d, k,
                n_samples=N_SAMPLES, capacity=capacity, tile=TILE,
                fine_capacity=fc, perturb=0.0, train=False,
                plan=plan, fine_plan=fplan if fine else None,
                fine_ids=fids if fine else None,
            )

        return timed(
            image_fn, ro, rd, nr, fr, key, plan0, fplan0, fids0, label=label
        )

    def render_chain(label):
        """Full per-image chain (plan -> fine -> render), one rgb fetch —
        the bench's actual per-image structure."""
        kw = dict(num_instances=1, compact_fraction=None, compute_dtype=DTYPE)
        model = MPSNeRF(**kw)
        variables = jax.jit(model.init, static_argnames=("train",))(
            {"params": jax.random.PRNGKey(0)}, smpl, inp, inp,
            jnp.zeros((8, 3)), jnp.zeros((8, 3)), train=False,
        )
        latent = jax.jit(model.apply, static_argnames=("train", "method"))(
            variables, inp["img_all"], train=False, method="encode",
        )

        @jax.jit
        def image_fn(a, b, c, d, k, plan, fplan, fids):
            return render_rays_compact(
                model, variables, smpl, inp, inp, latent, a, b, c, d, k,
                n_samples=N_SAMPLES, capacity=capacity, tile=TILE,
                fine_capacity=fine_capacity, perturb=0.0, train=False,
                plan=plan, fine_plan=fplan, fine_ids=fids,
            )

        def chain(a, b, c, d):
            plan = plan_fn(a, b, c, d)
            fplan, fids = fine_fn(a, b, c, d, plan)
            return image_fn(a, b, c, d, key, plan, fplan, fids)[0]

        return timed(chain, ro, rd, nr, fr, label=label)

    def tail_probe():
        """Isolate the tile lax.map (the model tail) from the render's
        plan plumbing, plus the composite alone."""
        from mpsnerf_tpu.ops.compact import compact, resize_plan
        from mpsnerf_tpu.ops.composite import (
            composite_rays, stratified_z_vals,
        )
        from mpsnerf_tpu.smpl.lbs import PoseTransforms, world_to_smpl

        model = MPSNeRF(
            num_instances=1, compact_fraction=None, compute_dtype=DTYPE
        )
        variables = jax.jit(model.init, static_argnames=("train",))(
            {"params": jax.random.PRNGKey(0)}, smpl, inp, inp,
            jnp.zeros((8, 3)), jnp.zeros((8, 3)), train=False,
        )
        latent = jax.jit(model.apply, static_argnames=("train", "method"))(
            variables, inp["img_all"], train=False, method="encode",
        )

        @jax.jit
        def prep(a, b, c, d, plan, fplan, fids):
            z = stratified_z_vals(
                key, c[:, None], d[:, None], N_SAMPLES, 0.0
            )
            pts = (
                a[:, None, :] + b[:, None, :] * z[..., None]
            ).reshape(-1, 3)
            vdn = b / jnp.linalg.norm(b, axis=-1, keepdims=True)
            vd = jnp.broadcast_to(
                vdn[:, None, :], (b.shape[0], N_SAMPLES, 3)
            ).reshape(-1, 3)
            plan = resize_plan(plan, capacity)
            plan2 = resize_plan(fplan, fine_capacity)
            comp_idx = plan.gather_idx[plan2.gather_idx]
            TILE_ = 16384
            return (
                pts[comp_idx].reshape(-1, TILE_, 3),
                vd[comp_idx].reshape(-1, TILE_, 3),
                compact(plan2, fids).reshape(-1, TILE_),
                z,
            )

        cpts, cvd, cids, z_vals = prep(
            ro, rd, nr, fr, plan0, fplan0, fids0
        )
        jax.block_until_ready((cpts, cvd, cids))

        @jax.jit
        def tail_only(cp, cv, ci):
            def one_fine(args):
                p, v, i = args
                raw = model.apply(
                    variables, smpl, inp, inp, latent, p, v,
                    train=False, nn_ids=i, method="query",
                )
                return raw.rgb, raw.sigma

            rgb_t, sig_t = jax.lax.map(one_fine, (cp, cv, ci))
            return jnp.sum(rgb_t.astype(jnp.float32)) + jnp.sum(
                sig_t.astype(jnp.float32)
            )

        timed(tail_only, cpts, cvd, cids, label="tail lax.map only")

        @jax.jit
        def composite_only(rgb_full, sig_full, z, b):
            out = composite_rays(
                rgb_full.reshape(-1, N_SAMPLES, 3),
                sig_full.reshape(-1, N_SAMPLES),
                z, b,
            )
            return jnp.sum(out.rgb_map)

        rgb_full = jnp.zeros((len(sel) * N_SAMPLES, 3), jnp.float32)
        sig_full = jnp.zeros((len(sel) * N_SAMPLES,), jnp.float32)
        timed(
            composite_only, rgb_full, sig_full, z_vals, rd,
            label="composite only (12.2M full grid)",
        )

    render_chain("CHAIN plan+fine+render (bench structure)")
    tail_probe()
    t_render = render_variant("render (full, fine mode)")
    render_variant("render (no fine: tail 1-NN inline)", fine=False)
    render_variant("render (no transformer)", use_transformer=False)
    render_variant("render (no append_rgb)", append_rgb=False)
    render_variant("render (nerf_depth=2)", nerf_depth=2, nerf_skips=())
    print(f"TOTAL {t_plan + t_fine + t_render:.1f} ms")


if __name__ == "__main__":
    main()
