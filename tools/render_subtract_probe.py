"""Subtractive whole-image render timing (attribution without a profiler).

Renders the bench's exact culled 512x512x128 workload under ablated model
configurations and prints seconds/image for each.  Differences against the
full configuration attribute time to pipeline stages without per-call
tunnel-round-trip pollution (the lax.map keeps everything on device; one
fetch per image).
"""

import os
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from mpsnerf_tpu.utils.compilation_cache import enable_compilation_cache

    enable_compilation_cache()

    from mpsnerf_tpu.data.synthetic import SyntheticHumanDataset
    from mpsnerf_tpu.data import attach_body_grid
    from mpsnerf_tpu.models.mps_nerf import MPSNeRF
    from mpsnerf_tpu.renderer.render import render_rays_mapped
    from mpsnerf_tpu.train.trainer import to_device_input
    from mpsnerf_tpu.rays.rays import get_rays, get_near_far

    H = W = 512
    N_SAMPLES = 128
    CHUNK = int(os.environ.get("MPSNERF_BENCH_CHUNK", "256"))

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
    n_rays = len(sel)
    n_pad = ((n_rays + CHUNK - 1) // CHUNK) * CHUNK

    def pad(x):
        x = x[sel]
        return np.concatenate(
            [x, np.zeros((n_pad - len(x),) + x.shape[1:], x.dtype)]
        )

    perm = np.random.default_rng(0).permutation(n_pad)
    ro = jnp.asarray(pad(ray_o)[perm])
    rd = jnp.asarray(pad(ray_d)[perm])
    nr = jnp.asarray(pad(near_all)[perm])
    fr = jnp.asarray(pad(far_all)[perm])
    key = jax.random.PRNGKey(0)

    hit_frac = n_rays / ray_o.shape[0]
    cf_full = min(0.5, max(0.125, 2.0 * 0.06 / hit_frac))

    configs = [
        ("full (bench config)", {}, cf_full),
        ("tail @ 1/11 capacity", {}, 1024 / (CHUNK * N_SAMPLES)),
        ("no transformer (mean fuse)", {"use_transformer": False}, cf_full),
        ("no append_rgb", {"append_rgb": False}, cf_full),
        ("nerf_depth=2", {"nerf_depth": 2, "nerf_skips": ()}, cf_full),
        ("no body_grid (exact 1NN all)", {}, cf_full),
        ("fp32 compute", {"compute_dtype": "float32"}, cf_full),
    ]

    for label, overrides, cf in configs:
        use_inp = inp
        if label.startswith("no body_grid"):
            it2 = dict(item)
            it2.pop("body_grid", None)
            use_inp = to_device_input(it2)
        kw = dict(
            num_instances=1, compact_fraction=cf, compute_dtype="bfloat16"
        )
        kw.update(overrides)
        model = MPSNeRF(**kw)
        variables = jax.jit(model.init, static_argnames=("train",))(
            {"params": jax.random.PRNGKey(0)}, smpl, use_inp, use_inp,
            jnp.zeros((8, 3)), jnp.zeros((8, 3)), train=False,
        )
        latent = jax.jit(model.apply, static_argnames=("train", "method"))(
            variables, use_inp["img_all"], train=False, method="encode",
        )

        @jax.jit
        def image_fn(a, b, c, d, k):
            return render_rays_mapped(
                model, variables, smpl, use_inp, use_inp, latent,
                a, b, c, d, k, chunk=CHUNK, n_samples=N_SAMPLES,
                perturb=0.0, train=False,
            )

        def run():
            out = image_fn(ro, rd, nr, fr, key)
            return np.asarray(out[0])

        run()
        t0 = time.time()
        n_img = 2
        for _ in range(n_img):
            run()
        dt = (time.time() - t0) / n_img
        print(f"{label:32s} {dt*1e3:8.1f} ms/img   "
              f"({ray_o.shape[0]/dt:9.0f} rays/s)")


if __name__ == "__main__":
    main()
