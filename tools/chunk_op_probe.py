"""On-device attribution of the render chunk's N-scaled glue ops.

Each candidate op is looped 371x (the bench's chunk count) inside ONE jit
via lax.map — same structure as the bench's mapped render — so tunnel
dispatch/fetch overhead amortizes to nothing and the printed times are
real device times per image-equivalent.
"""

import time

import numpy as np


def timed(fn, *args, n=3, label=""):
    out = fn(*args)
    np.asarray(jax_leaves(out)[0])
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    np.asarray(jax_leaves(out)[0])
    dt = (time.time() - t0) / n * 1e3
    print(f"{label:40s} {dt:8.1f} ms/img-equiv")
    return dt


def jax_leaves(out):
    import jax
    return [x for x in jax.tree.leaves(out)]


def main():
    import jax
    import jax.numpy as jnp

    from mpsnerf_tpu.utils.compilation_cache import enable_compilation_cache

    enable_compilation_cache()

    from mpsnerf_tpu.data.synthetic import SyntheticHumanDataset
    from mpsnerf_tpu.data import attach_body_grid
    from mpsnerf_tpu.ops.compact import plan_compaction, compact
    from mpsnerf_tpu.ops.body_grid import grid_lookup
    from mpsnerf_tpu.ops.knn import nearest_vertex_pallas
    from mpsnerf_tpu.ops.composite import composite_rays, stratified_z_vals
    from mpsnerf_tpu.smpl.lbs import (
        PoseTransforms, world_to_smpl, deform_target_to_canonical,
        deform_canonical_to_source,
    )
    from mpsnerf_tpu.train.trainer import to_device_input

    C = 371           # chunks per image at bench config
    N = 32768         # points per chunk
    CAP = 11264
    rng = np.random.default_rng(0)

    ds = SyntheticHumanDataset(
        n_poses=1, n_cameras=4, image_size=512, n_rays=64, n_verts=6890,
        num_instances=1, input_views=[0, 1, 2],
    )
    item = ds.get_item(0, instance_idx=0)
    attach_body_grid(item)
    smpl = ds.smpl_for(0)
    inp = to_device_input(item)
    verts = inp["vertices"]
    tf = jax.jit(lambda p: PoseTransforms.create(smpl, p))(inp["params"])

    bounds = np.asarray(item["bounds"])
    pts_h = rng.uniform(
        bounds[0] - 0.2, bounds[1] + 0.2, (C, N, 3)
    ).astype(np.float32)
    pts = jnp.asarray(pts_h)
    masks = jnp.asarray((rng.random((C, N)) < 0.3).astype(np.int32))
    cpts = pts[:, :CAP, :]
    ids = jnp.asarray(rng.integers(0, 6890, (C, CAP)).astype(np.int32))
    buf3 = jnp.asarray(rng.random((C, CAP, 3)).astype(np.float32))

    def loop(fn):
        # reduce to ONE scalar on device: fetching real outputs over the
        # tunnel runs at ~50-100 MB/s and would dominate every number
        def red(x):
            out = fn(x)
            leaves = jax.tree.leaves(out)
            return sum(jnp.sum(l.astype(jnp.float32)) for l in leaves)
        return jax.jit(lambda xs: jnp.sum(jax.lax.map(red, xs)))

    timed(loop(lambda x: jnp.sum(x, 0)), pts, label="lax.map overhead (sum)")
    timed(loop(lambda x: grid_lookup(inp["body_grid"], x)), pts,
          label="grid_lookup 32768")
    timed(loop(lambda m: plan_compaction(m, CAP).gather_idx), masks,
          label="plan_compaction (cumsum+scatter)")
    timed(loop(lambda m: jnp.cumsum(m) - 1), masks,
          label="  cumsum only")

    def plan_compact_expand(args):
        m, p, b = args
        plan = plan_compaction(m, CAP)
        g = compact(plan, p)
        from mpsnerf_tpu.ops.compact import expand
        return expand(plan, g + b, 0.0)

    timed(loop(plan_compact_expand), (masks, pts, buf3),
          label="plan + compact(3ch) + expand(3ch)")

    timed(loop(lambda q: nearest_vertex_pallas(q, verts)[0]), cpts,
          label="nearest_vertex pallas 11264")
    timed(loop(lambda q: world_to_smpl(q, tf.R, tf.Th)), pts,
          label="world_to_smpl 32768")
    timed(
        loop(lambda a: deform_target_to_canonical(smpl, tf, a[0], a[1], False)),
        (cpts, ids), label="deform t2c 11264",
    )
    timed(
        loop(
            lambda a: deform_canonical_to_source(
                smpl, tf, a[0], a[1], None, False
            )[1]
        ),
        (cpts, ids), label="deform c2s 11264",
    )

    z = jnp.asarray(rng.random((C, 256, 128)).astype(np.float32) + 0.5)
    rgb_raw = jnp.asarray(rng.random((C, 256, 128, 3)).astype(np.float32))
    sig = jnp.asarray(rng.random((C, 256, 128)).astype(np.float32))
    rd = jnp.asarray(rng.random((C, 256, 3)).astype(np.float32))

    timed(
        loop(lambda a: composite_rays(a[0], a[1], a[2], a[3]).rgb_map),
        (rgb_raw, sig, z, rd), label="composite 256x128",
    )

    nr = jnp.asarray(rng.random((C, 256)).astype(np.float32))
    fr = nr + 1.0
    keys = jax.random.split(jax.random.PRNGKey(0), C)
    timed(
        loop(
            lambda a: stratified_z_vals(a[0], a[1][:, None], a[2][:, None],
                                        128, 0.0)
        ),
        (keys, nr, fr), label="stratified_z_vals 256x128",
    )


def tail_probe():
    """Tail-stage attribution at CAP points; loops 64 chunks and the
    printed ms are scaled x371/64 to image-equivalents."""
    import jax
    import jax.numpy as jnp

    from mpsnerf_tpu.utils.compilation_cache import enable_compilation_cache

    enable_compilation_cache()

    from mpsnerf_tpu.data.synthetic import SyntheticHumanDataset
    from mpsnerf_tpu.models.mps_nerf import MPSNeRF
    from mpsnerf_tpu.ops.grid_sample import index_features, grid_sample_2d
    from mpsnerf_tpu.ops.positional import positional_encoding
    from mpsnerf_tpu.train.trainer import to_device_input

    C, CAP = 371, 11264
    rng = np.random.default_rng(0)

    ds = SyntheticHumanDataset(
        n_poses=1, n_cameras=4, image_size=512, n_rays=64, n_verts=6890,
        num_instances=1, input_views=[0, 1, 2],
    )
    item = ds.get_item(0, instance_idx=0)
    smpl = ds.smpl_for(0)
    inp = to_device_input(item)

    model = MPSNeRF(num_instances=1, compact_fraction=CAP / 32768,
                    compute_dtype="bfloat16")
    variables = jax.jit(model.init, static_argnames=("train",))(
        {"params": jax.random.PRNGKey(0)}, smpl, inp, inp,
        jnp.zeros((8, 3)), jnp.zeros((8, 3)), train=False,
    )
    latent = jax.jit(model.apply, static_argnames=("train", "method"))(
        variables, inp["img_all"], train=False, method="encode",
    )

    def loop(fn):
        def red(x):
            out = fn(x)
            return sum(
                jnp.sum(l.astype(jnp.float32)) for l in jax.tree.leaves(out)
            )
        return jax.jit(lambda xs: jnp.sum(jax.lax.map(red, xs)))

    # inputs are generated ON DEVICE (host->device over the tunnel runs
    # ~100 MB/s; multi-GB uploads would dwarf everything) and the loop
    # count is scaled down for the big arrays, results scaled back up
    bounds = np.asarray(item["bounds"])
    lo = jnp.asarray(bounds[0])
    hi = jnp.asarray(bounds[1])
    k0 = jax.random.PRNGKey(0)
    CS = 64
    scale = C / CS
    wpts = lo + (hi - lo) * jax.random.uniform(k0, (CS, CAP, 3))
    uv = 511.0 * jax.random.uniform(k0, (CS, 3, CAP, 2))
    feats = jax.random.uniform(k0, (CS, 3, CAP, 155))
    f1 = jax.random.uniform(k0, (CS, CAP, 155))
    rgb3 = jax.random.uniform(k0, (CS, 3, CAP, 3))
    cpts = wpts

    def timed_s(fn, *args, label=""):
        out = fn(*args)
        np.asarray(jax_leaves(out)[0])
        import time as _t
        t0 = _t.time()
        for _ in range(3):
            out = fn(*args)
        np.asarray(jax_leaves(out)[0])
        dt = (_t.time() - t0) / 3 * 1e3 * scale
        print(f"{label:40s} {dt:8.1f} ms/img-equiv")

    timed_s(loop(lambda u: index_features(latent, u, (512.0, 512.0))), uv,
          label="index_features 128ch (4-corner)")
    timed_s(
        loop(
            lambda u: grid_sample_2d(
                inp["img_all"], 2.0 * u / 512.0 - 1.0
            )
        ),
        uv, label="grid_sample rgb 3ch",
    )
    timed_s(loop(lambda r: positional_encoding(r, 4)), rgb3,
          label="PE(rgb,4) VxNx3")
    timed_s(loop(lambda p: positional_encoding(p, 6)), wpts,
          label="PE(pts,6) Nx3")

    def view_full(p):
        return model.apply(
            variables, inp, latent, p,
            method=lambda m, sp, lat, pp: m._view_features(sp, lat, pp),
        )

    timed_s(loop(view_full), wpts, label="view_features FULL (proj+gather+tf)")

    def tf_only(f):
        return model.apply(
            variables, f,
            method=lambda m, ff: m.transformer(ff),
        )

    timed_s(loop(tf_only), feats, label="transformer (3,CAP,155)")

    def mlp_only(a):
        p, f = a
        return model.apply(
            variables, p, f,
            method=lambda m, pp, ff: m._nerf_mlp(pp, ff, ff, None),
        )

    timed_s(loop(mlp_only), (cpts, f1), label="nerf_mlp CAP")


if __name__ == "__main__":
    import sys
    if len(sys.argv) > 1 and sys.argv[1] == "tail":
        tail_probe()
    else:
        main()
