"""Isolate render_rays_compact's non-tail 'plumbing' costs.

The stage probe shows render(701) = tail map(454) + composite(5) + ~242ms
unaccounted.  This times each plumbing op separately: z_vals+pts+vd
generation, resize_plan at N, comp_idx composition, the compact gathers,
and the fused raw4 scatter-expand.  Scalar-reduced outputs throughout.
"""

import time

import numpy as np


def timed(fn, *args, n=10, label=""):
    import jax
    out = fn(*args)
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
    from mpsnerf_tpu.ops.compact import compact, resize_plan
    from mpsnerf_tpu.ops.composite import stratified_z_vals
    from mpsnerf_tpu.renderer.render import (
        fine_rays_compact, plan_rays_compact,
    )
    from mpsnerf_tpu.train.trainer import to_device_input
    from mpsnerf_tpu.rays.rays import get_rays, get_near_far

    H = W = 512
    N_SAMPLES = 128
    TILE = 16384

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

    plan0 = jax.jit(
        lambda a, b, c, d: plan_rays_compact(
            smpl, inp, a, b, c, d, key, n_samples=N_SAMPLES, perturb=0.0
        )
    )(ro, rd, nr, fr)
    n_cand = int(plan0.n_valid)
    capacity = ((n_cand + TILE - 1) // TILE) * TILE
    fplan0, fids0 = jax.jit(
        lambda a, b, c, d, p: fine_rays_compact(
            smpl, inp, a, b, c, d, key, n_samples=N_SAMPLES,
            plan=p, capacity=capacity, perturb=0.0,
        )
    )(ro, rd, nr, fr, plan0)
    fine_capacity = ((int(fplan0.n_valid) + TILE - 1) // TILE) * TILE
    print(f"capacity {capacity} fine_capacity {fine_capacity}")

    @jax.jit
    def gen(a, b, c, d):
        z = stratified_z_vals(key, c[:, None], d[:, None], N_SAMPLES, 0.0)
        pts = (a[:, None, :] + b[:, None, :] * z[..., None]).reshape(-1, 3)
        vdn = b / jnp.linalg.norm(b, axis=-1, keepdims=True)
        vd = jnp.broadcast_to(
            vdn[:, None, :], (b.shape[0], N_SAMPLES, 3)
        ).reshape(-1, 3)
        return jnp.sum(pts) + jnp.sum(vd)

    timed(gen, ro, rd, nr, fr, label="z_vals + pts + vd")

    @jax.jit
    def resize_both(plan, fplan):
        p = resize_plan(plan, capacity)
        p2 = resize_plan(fplan, fine_capacity)
        return sum(jnp.sum(x) for x in jax.tree.leaves((p, p2)))

    timed(resize_both, plan0, fplan0, label="resize_plan x2 (N-sized ops)")

    @jax.jit
    def compose(plan, fplan):
        p = resize_plan(plan, capacity)
        p2 = resize_plan(fplan, fine_capacity)
        comp_idx = p.gather_idx[p2.gather_idx]
        return jnp.sum(comp_idx)

    timed(compose, plan0, fplan0, label="comp_idx composition")

    @jax.jit
    def gathers(a, b, c, d, plan, fplan, fids):
        z = stratified_z_vals(key, c[:, None], d[:, None], N_SAMPLES, 0.0)
        pts = (a[:, None, :] + b[:, None, :] * z[..., None]).reshape(-1, 3)
        vdn = b / jnp.linalg.norm(b, axis=-1, keepdims=True)
        vd = jnp.broadcast_to(
            vdn[:, None, :], (b.shape[0], N_SAMPLES, 3)
        ).reshape(-1, 3)
        p = resize_plan(plan, capacity)
        p2 = resize_plan(fplan, fine_capacity)
        comp_idx = p.gather_idx[p2.gather_idx]
        cpts = pts[comp_idx]
        cvd = vd[comp_idx]
        cids = compact(p2, fids)
        return jnp.sum(cpts) + jnp.sum(cvd) + jnp.sum(cids)

    timed(
        gathers, ro, rd, nr, fr, plan0, fplan0, fids0,
        label="full input plumbing (gen+resize+gathers)",
    )

    raw4 = jnp.zeros((fine_capacity, 4), jnp.float32)

    @jax.jit
    def scatter_out(plan, fplan, r4):
        from mpsnerf_tpu.ops.compact import Compaction, expand

        p = resize_plan(plan, capacity)
        p2 = resize_plan(fplan, fine_capacity)
        comp_idx = p.gather_idx[p2.gather_idx]
        composed = Compaction(
            gather_idx=comp_idx, slot=p.slot, take=p.take,
            n_valid=p2.n_valid,
        )
        full4 = expand(composed, r4, -80.0)
        return jnp.sum(full4)

    timed(scatter_out, plan0, fplan0, raw4, label="raw4 scatter-expand")

    @jax.jit
    def gather_out(plan, fplan, r4):
        from mpsnerf_tpu.ops.compact import expand_gather

        p = resize_plan(plan, capacity)
        p2 = resize_plan(fplan, fine_capacity)
        inner = expand_gather(p2, r4, -80.0)
        full4 = expand_gather(p, inner, -80.0)
        return jnp.sum(full4)

    timed(gather_out, plan0, fplan0, raw4, label="raw4 nested gather-expand (old)")


if __name__ == "__main__":
    main()  # noqa


def extra():
    import jax
    import jax.numpy as jnp
    # appended probe: per-channel SCALAR scatters (slice scatters lower
    # pathologically on TPU; scalar scatters measured ~6 ns/idx)
    from mpsnerf_tpu.utils.compilation_cache import enable_compilation_cache
    enable_compilation_cache()
    n = 12172416
    k = 1982464
    idx = jnp.sort(
        jax.random.randint(jax.random.PRNGKey(1), (k,), 0, n, jnp.int32)
    )
    vals = jax.random.normal(jax.random.PRNGKey(2), (k, 4), jnp.float32)

    @jax.jit
    def scalar4(idx, vals):
        outs = []
        for c in range(4):
            full = jnp.full((n,), -80.0, jnp.float32)
            outs.append(
                full.at[idx].set(
                    vals[:, c], mode="drop",
                    indices_are_sorted=True, unique_indices=True,
                )
            )
        return sum(jnp.sum(o) for o in outs)

    timed(scalar4, idx, vals, label="4x scalar scatter (sorted)")

    @jax.jit
    def scalar4_unsorted(idx, vals):
        outs = []
        for c in range(4):
            full = jnp.full((n,), -80.0, jnp.float32)
            outs.append(full.at[idx].set(vals[:, c], mode="drop"))
        return sum(jnp.sum(o) for o in outs)

    timed(scalar4_unsorted, idx, vals, label="4x scalar scatter (no hints)")

    @jax.jit
    def slice4(idx, vals):
        full = jnp.full((n, 4), -80.0, jnp.float32)
        return jnp.sum(
            full.at[idx].set(
                vals, mode="drop",
                indices_are_sorted=True, unique_indices=True,
            )
        )

    timed(slice4, idx, vals, label="(K,4) slice scatter")


if __name__ == "__main__":
    extra()
