"""Per-stage timing of the render hot path at bench scale.

Times each pipeline stage standalone on the real chip, at the same shapes
the bench's chunk loop runs (chunk=256 rays x 128 samples = 32768 points,
compaction capacity ~1/3), to attribute the per-chunk wall time.  Each
stage is jitted separately and synced by a host fetch (the only true sync
on the axon backend).
"""

import time

import numpy as np


def timed(fn, *args, n=20, label=""):
    out = fn(*args)
    _ = [np.asarray(x) for x in (out if isinstance(out, tuple) else (out,))]
    t0 = time.time()
    for _i in range(n):
        out = fn(*args)
    _ = [np.asarray(x) for x in (out if isinstance(out, tuple) else (out,))]
    dt = (time.time() - t0) / n * 1e3
    print(f"{label:34s} {dt:8.3f} ms")
    return dt


def main():
    import jax
    import jax.numpy as jnp

    from mpsnerf_tpu.utils.compilation_cache import enable_compilation_cache

    enable_compilation_cache()

    from mpsnerf_tpu.data.synthetic import SyntheticHumanDataset
    from mpsnerf_tpu.data import attach_body_grid
    from mpsnerf_tpu.models.mps_nerf import MPSNeRF
    from mpsnerf_tpu.train.trainer import to_device_input
    from mpsnerf_tpu.ops.compact import plan_compaction, compact
    from mpsnerf_tpu.ops.knn import nearest_vertex_pallas
    from mpsnerf_tpu.ops.body_grid import grid_lookup
    from mpsnerf_tpu.smpl.lbs import (
        PoseTransforms, deform_target_to_canonical,
        deform_canonical_to_source,
    )

    N_PTS = 32768          # chunk 256 x 128 samples
    CAP = 11264            # ceil(0.33 * 32768 / 1024) * 1024
    rng = np.random.default_rng(0)

    ds = SyntheticHumanDataset(
        n_poses=1, n_cameras=4, image_size=512, n_rays=64,
        n_verts=6890, num_instances=1, input_views=[0, 1, 2],
    )
    item = ds.get_item(0, instance_idx=0)
    attach_body_grid(item)
    smpl = ds.smpl_for(0)
    inp = to_device_input(item)

    model = MPSNeRF(num_instances=1, compact_fraction=CAP / N_PTS,
                    compute_dtype="bfloat16")
    variables = jax.jit(model.init, static_argnames=("train",))(
        {"params": jax.random.PRNGKey(0)}, smpl, inp, inp,
        jnp.zeros((8, 3)), jnp.zeros((8, 3)), train=False,
    )
    latent = jax.jit(model.apply, static_argnames=("train", "method"))(
        variables, inp["img_all"], train=False, method="encode",
    )

    verts = inp["vertices"]
    bounds = np.asarray(item["bounds"])
    lo, hi = bounds[0], bounds[1]
    pts = jnp.asarray(
        rng.uniform(lo - 0.1, hi + 0.1, (N_PTS, 3)).astype(np.float32)
    )
    cpts = pts[:CAP]
    vd = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32), (N_PTS, 1))

    mask = jnp.asarray((rng.random(N_PTS) < 0.3).astype(np.int32))

    tf = jax.jit(lambda p: PoseTransforms.create(smpl, p))(inp["params"])
    _, ids_full = nearest_vertex_pallas(cpts, verts)

    # --- standalone stages
    timed(jax.jit(lambda p: grid_lookup(inp["body_grid"], p)), pts,
          label="grid_lookup (32768)")
    timed(jax.jit(lambda m: plan_compaction(m, CAP)), mask,
          label="plan_compaction (32768->11264)")
    timed(
        jax.jit(lambda m, p: compact(plan_compaction(m, CAP), p)),
        mask, pts, label="plan+compact pts",
    )
    timed(jax.jit(lambda q: nearest_vertex_pallas(q, verts)), cpts,
          label="nearest_vertex pallas (11264)")
    timed(
        jax.jit(
            lambda q, i: deform_target_to_canonical(smpl, tf, q, i, False)
        ),
        cpts, ids_full, label="deform t2c (11264)",
    )
    timed(
        jax.jit(
            lambda q, i: deform_canonical_to_source(
                smpl, tf, q, i, None, False
            )
        ),
        cpts, ids_full, label="deform c2s (11264)",
    )

    def view_feats(pts_):
        return model.apply(
            variables, inp, latent, pts_,
            method=lambda m, sp, lat, p: m._view_features(sp, lat, p),
        )

    timed(jax.jit(view_feats), cpts, label="view_features+fusion (11264)")

    def feats_only(pts_):
        return model.apply(
            variables, inp, latent, pts_,
            method=lambda m, sp, lat, p: m._view_features(
                sp, lat, p, fuse=False
            ),
        )

    timed(jax.jit(feats_only), cpts, label="  project+gather only (11264)")

    f1 = jnp.zeros((CAP, 155), jnp.float32)

    def mlp_only(p, f):
        return model.apply(
            variables, p, f,
            method=lambda m, p_, f_: m._nerf_mlp(p_, f_, f_, None),
        )

    timed(jax.jit(mlp_only), cpts, f1, label="nerf_mlp (11264)")

    # --- whole query at chunk scale, then the full render chunk
    def query(p, v):
        return model.apply(
            variables, smpl, inp, inp, latent, p, v,
            train=False, method=MPSNeRF.query,
        ).sigma

    timed(jax.jit(query), pts, vd, label="FULL query (32768)")

    from mpsnerf_tpu.renderer.render import render_rays

    ro = jnp.asarray(rng.uniform(-1, 1, (256, 3)).astype(np.float32))
    rd = jnp.asarray(rng.uniform(-1, 1, (256, 3)).astype(np.float32))
    nr = jnp.full((256,), 0.5, jnp.float32)
    fr = jnp.full((256,), 2.5, jnp.float32)

    def chunk_fn(a, b, c, d):
        out = render_rays(
            model, variables, smpl, inp, inp, latent, a, b, c, d,
            jax.random.PRNGKey(0), 128, perturb=0.0, train=False,
        )
        return out.rgb_map

    timed(jax.jit(chunk_fn), ro, rd, nr, fr, label="FULL render chunk (256)")


if __name__ == "__main__":
    main()
