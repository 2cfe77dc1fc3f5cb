"""Attribute render-tail time across ops on the real chip.

Times each hot-path component in isolation on a representative compacted
batch (4096 points — what one 256-ray x 128-sample chunk compacts to at
12.5% capacity), chained through lax.scan so XLA can't overlap or DCE
the reps.  Prints a ms/op table; run on an IDLE machine — concurrent CPU
load inflates dispatch time.
"""

import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from mpsnerf_tpu.data.synthetic import SyntheticHumanDataset
    from mpsnerf_tpu.models.mps_nerf import MPSNeRF
    from mpsnerf_tpu.models.transformer import ViewFusionTransformer
    from mpsnerf_tpu.ops.knn import nearest_vertex
    from mpsnerf_tpu.ops.compact import plan_compaction
    from mpsnerf_tpu.ops.grid_sample import index_features, grid_sample_2d
    from mpsnerf_tpu.ops.positional import positional_encoding
    from mpsnerf_tpu.smpl.lbs import (
        PoseTransforms, deform_target_to_canonical,
        deform_canonical_to_source,
    )
    from mpsnerf_tpu.train.trainer import to_device_input

    K = 4096          # compacted points per chunk
    N_FULL = 32768    # pre-compaction points per chunk (256 rays x 128)
    REPS = 100

    ds = SyntheticHumanDataset(
        n_poses=1, n_cameras=4, image_size=512, n_rays=64, n_verts=6890,
        num_instances=1, input_views=[0, 1, 2],
    )
    item = ds.get_item(0, instance_idx=0)
    smpl = ds.smpl_for(0)
    inp = to_device_input(item)
    rng = np.random.default_rng(0)
    verts = np.asarray(inp["vertices"])
    pts = jnp.asarray(verts[rng.integers(0, len(verts), K)]
                      + rng.normal(scale=0.02, size=(K, 3)), jnp.float32)
    full_pts = jnp.asarray(
        rng.normal(size=(N_FULL, 3)), jnp.float32
    )
    tverts = jnp.asarray(inp["t_vertices"])
    wverts = jnp.asarray(verts)

    model = MPSNeRF(num_instances=1, compact_fraction=None)
    variables = jax.jit(model.init, static_argnames=("train",))(
        {"params": jax.random.PRNGKey(0)}, smpl, inp, inp,
        pts[:8], jnp.ones((8, 3)), train=False,
    )
    latent = jax.jit(model.apply, static_argnames=("train", "method"))(
        variables, inp["img_all"], train=False, method="encode",
    )
    tf = PoseTransforms.create(smpl, jax.tree.map(jnp.asarray,
                                                  item["params"]))

    def timed(name, fn, x0):
        """Run fn REPS times chained through scan; report ms/rep."""

        @jax.jit
        def loop(x):
            def body(carry, _):
                out = fn(x + carry * 0.0)
                # reduce to a scalar to carry the dependency
                s = jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32))
                return s * 1e-20, ()
            c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=REPS)
            return c

        r = loop(x0)
        np.asarray(r)  # compile+run once
        t0 = time.time()
        np.asarray(loop(x0))
        dt = (time.time() - t0) / REPS * 1e3
        print(f"{name:34s} {dt:8.3f} ms")
        return dt

    print(f"per-op time on {jax.devices()[0].platform}, K={K}:")

    timed("1-NN exact (K x 6890)", lambda x: nearest_vertex(x, wverts)[0],
          pts)
    timed("1-NN full-chunk (32768 x 6890)",
          lambda x: nearest_vertex(x, wverts)[0], full_pts)
    timed("compaction plan (32768)",
          lambda x: plan_compaction(
              (x[:, 0] > 0).astype(jnp.int32), K).gather_idx,
          full_pts)

    ids = nearest_vertex(pts, wverts)[1]

    timed("warp t2c",
          lambda x: deform_target_to_canonical(smpl, tf, x, ids, False), pts)
    timed("warp c2s",
          lambda x: deform_canonical_to_source(
              smpl, tf, x, ids, None, False)[0], pts)

    R_all = inp["R_all"]
    T_all = inp["T_all"].reshape(-1, 3, 1)
    K_all = inp["K_all"]

    def project(x):
        cam = jnp.einsum("vij,nj->vni", R_all, x) + T_all.transpose(0, 2, 1)
        pix = jnp.einsum("vij,vnj->vni", K_all, cam)
        return pix[..., :2] / (pix[..., 2:] + 1e-5)

    timed("projection (3 views)", project, pts)
    uv = project(pts)

    timed("index_features (latent gather)",
          lambda x: index_features(latent, uv + x[0, 0] * 0, (512.0, 512.0)),
          pts)
    timed("grid_sample rgb (3 views)",
          lambda x: grid_sample_2d(
              inp["img_all"],
              (2.0 * (uv + x[0, 0] * 0) / 512.0 - 1.0)), pts)
    timed("PE(xyz, 6)", lambda x: positional_encoding(x, 6), pts)

    feats = jnp.zeros((3, K, 155), jnp.float32)
    tr32 = ViewFusionTransformer(dim=155)
    tr16 = ViewFusionTransformer(dim=155, dtype=jnp.bfloat16)
    tv = tr32.init(jax.random.PRNGKey(0), feats)
    timed("transformer fp32 (3 x K x 155)",
          lambda x: tr32.apply(tv, x), feats)
    timed("transformer bf16",
          lambda x: tr16.apply(tv, x), feats)

    # the NeRF MLP in isolation (fp32 vs bf16)
    def mk_mlp(dtype):
        m = MPSNeRF(num_instances=1, compact_fraction=None,
                    compute_dtype=dtype)

        def run(x):
            f1 = jnp.zeros((x.shape[0], 155), jnp.float32)
            return m.apply(variables, x, f1, f1, x,
                           method="_nerf_mlp")[0]
        return run

    timed("nerf mlp fp32 (K x 8 x 256)", mk_mlp("float32"), pts)
    timed("nerf mlp bf16", mk_mlp("bfloat16"), pts)

    # full query fp32 vs bf16 on the compacted batch
    for dt_name in ("float32", "bfloat16"):
        m = MPSNeRF(num_instances=1, compact_fraction=None,
                    compute_dtype=dt_name)

        def q(x, m=m):
            raw = m.apply(variables, smpl, inp, inp, latent, x,
                          jnp.ones_like(x), train=False,
                          method="query")
            return raw.sigma
        timed(f"full query {dt_name} (K pts)", q, pts)


if __name__ == "__main__":
    main()
