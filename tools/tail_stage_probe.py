"""Isolated timings of the render tail's op groups at fine-capacity scale.

The round-3 stage probe attributes 455 ms to the tail lax.map with only
~115 ms explained by the transformer ablation.  This times each op group
alone at the bench's fine point count so tail work targets real costs:

  1-NN #2 (canonical-space, per-tile)     — expect ~73 ms (95 @ 2.57M)
  LBS t2c+c2s warps (fused (V,30) table)  — expect ~2 row gathers + VPU
  projection + latent/img patch gathers   — expect ~81 ms (6 idx/pt)
  PE(pts,6) + PE(vd,4) + PE(rgb,4)        — transcendental-bound
  transformer (2 layers, V=3 tokens)      — ~115 ms measured via ablation
  MLP (depth 8, width 256, bf16)          — ~15 ms

Isolated sums need not match the fused render exactly (XLA fuses across
groups), but they bound each group's floor.  Run on the real chip:

    PYTHONPATH=/root/repo:/root/.axon_site python -u tools/tail_stage_probe.py
"""

import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from mpsnerf_tpu.utils.compilation_cache import enable_compilation_cache

    enable_compilation_cache()
    from mpsnerf_tpu.utils.liveness import first_contact_watchdog
    first_contact_watchdog()  # exit 3 instead of stalling the batch

    from mpsnerf_tpu.data.synthetic import SyntheticHumanDataset
    from mpsnerf_tpu.models.mps_nerf import MPSNeRF
    from mpsnerf_tpu.ops.knn import nearest_vertex
    from mpsnerf_tpu.ops.positional import positional_encoding
    from mpsnerf_tpu.smpl.lbs import (
        PoseTransforms, deform_canonical_to_source,
        deform_target_to_canonical,
    )
    from mpsnerf_tpu.train.trainer import to_device_input

    import os
    K = int(os.environ.get("PROBE_K", 1_982_464))  # bench fine_capacity
    TILE = int(os.environ.get("PROBE_TILE", 16384))

    ds = SyntheticHumanDataset(
        n_poses=1, n_cameras=4, image_size=512, n_rays=64, n_verts=6890,
        num_instances=1, input_views=[0, 1, 2],
    )
    item = ds.get_item(0, instance_idx=0)
    smpl = ds.smpl_for(0)
    inp = to_device_input(item)
    model = MPSNeRF(num_instances=1, compute_dtype="bfloat16",
                    compact_fraction=None)
    kq = jax.random.PRNGKey(0)
    pts = jax.random.uniform(kq, (K, 3), jnp.float32, -1.0, 1.0)
    vd = pts / jnp.linalg.norm(pts, axis=-1, keepdims=True)
    ids = jax.random.randint(jax.random.PRNGKey(1), (K,), 0, 6890)
    variables = jax.jit(model.init, static_argnames=("train",))(
        {"params": jax.random.PRNGKey(0)}, smpl, inp, inp,
        jnp.zeros((8, 3)), jnp.zeros((8, 3)), train=False,
    )
    latent = jax.jit(model.apply, static_argnames=("train", "method"))(
        variables, inp["img_all"], train=False, method="encode",
    )

    def timed(fn, *args, n=10, label=""):
        out = fn(*args)
        np.asarray(jax.tree.leaves(out)[0])
        t0 = time.time()
        for _ in range(n):
            out = fn(*args)
        np.asarray(jax.tree.leaves(out)[0])
        print(f"{label:44s} {(time.time() - t0) / n * 1e3:8.1f} ms")

    def tiled(body):
        """lax.map over TILE blocks like the render tail."""
        def f(x3, aux):
            def one(args):
                return body(*args)
            return jax.lax.map(
                one,
                (x3.reshape(-1, TILE, 3), aux.reshape(-1, TILE)),
            )
        return jax.jit(f)

    tvert = inp["t_vertices"]

    # 1-NN #2 (canonical space), tiled like the tail
    timed(
        tiled(lambda p, a: jnp.sum(nearest_vertex(p, tvert)[1] + a[0] * 0)),
        pts, jnp.zeros((K,)), label="1-NN #2 per-tile (canonical)",
    )

    @jax.jit
    def warps(p, i):
        tf_t = PoseTransforms.create(smpl, inp["params"])
        can = deform_target_to_canonical(smpl, tf_t, p, i, True)
        s, w, b = deform_canonical_to_source(smpl, tf_t, can, i, None, True)
        return jnp.sum(s) + jnp.sum(w) + jnp.sum(b)

    timed(warps, pts, ids, label="LBS t2c + c2s (fused table)")

    @jax.jit
    def feats(p):
        def one(args):
            (pp,) = args
            f1, f2, rgb_s = model.apply(
                variables, inp, latent, pp,
                method=lambda m, sp, lat, x: m._view_features(sp, lat, x),
            )
            return jnp.sum(f1) + jnp.sum(f2)

        return jax.lax.map(one, (p.reshape(-1, TILE, 3),))

    timed(feats, pts, label="project + gathers + PE + transformer")

    @jax.jit
    def pe_only(p, v):
        return (
            jnp.sum(positional_encoding(p, 6))
            + jnp.sum(positional_encoding(v, 4))
        )

    timed(pe_only, pts, vd, label="PE(pts,6)+PE(vd,4)")

    @jax.jit
    def mlp_only(p, v):
        fc = int(latent.shape[1]) + 27  # latent channels + rgb PE
        f1 = jnp.zeros((p.shape[0], fc), jnp.float32)

        def one(args):
            pp, vv, ff = args
            rgb, alpha = model.apply(
                variables, pp, ff, ff, vv,
                method=lambda m, a, b, c, d: m._nerf_mlp(a, b, c, d),
            )
            return jnp.sum(rgb) + jnp.sum(alpha)

        return jax.lax.map(
            one,
            (p.reshape(-1, TILE, 3), v.reshape(-1, TILE, 3),
             f1.reshape(f1.shape[0] // TILE, TILE, -1)),
        )

    timed(mlp_only, pts, vd, label="NeRF MLP (depth 8, bf16)")


if __name__ == "__main__":
    main()
