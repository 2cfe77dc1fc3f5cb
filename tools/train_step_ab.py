"""A/B the train step: plain vs smooth variant, patch-gather vs 4-corner.

Isolates whether the 2x2-patch lax.gather's VJP (a patch scatter-add)
regressed the train step, and how much of the step cost is the smooth
double-backprop variant.
"""

import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from mpsnerf_tpu.utils.compilation_cache import enable_compilation_cache

    enable_compilation_cache()

    import mpsnerf_tpu.models.mps_nerf as M
    from mpsnerf_tpu.data.synthetic import SyntheticHumanDataset
    from mpsnerf_tpu.data import attach_body_grid
    from mpsnerf_tpu.ops import grid_sample as GS
    from mpsnerf_tpu.train.trainer import (
        TrainConfig, create_train_state, make_train_step, to_device_input,
    )

    ds = SyntheticHumanDataset(
        n_poses=1, n_cameras=4, image_size=512, n_rays=1000, n_verts=6890,
        num_instances=1, input_views=[0, 1, 2],
    )
    item = ds.get_item(0, instance_idx=0)
    attach_body_grid(item)
    smpl = ds.smpl_for(0)
    inp = to_device_input(item)

    for gather_impl in ("patch", "4corner"):
        if gather_impl == "4corner":
            M.index_features_patch = GS.index_features
            M.grid_sample_2d_patch = GS.grid_sample_2d
        else:
            M.index_features_patch = GS.index_features_patch
            M.grid_sample_2d_patch = GS.grid_sample_2d_patch

        model = M.MPSNeRF(
            num_instances=1, compact_fraction=0.5, compute_dtype="bfloat16"
        )
        variables = jax.jit(model.init, static_argnames=("train",))(
            {"params": jax.random.PRNGKey(0)}, smpl, inp, inp,
            jnp.zeros((8, 3)), jnp.zeros((8, 3)), train=False,
        )
        cfg = TrainConfig(n_samples=128, smooth_loss=True, smooth_interval=4)
        state = create_train_state(model, variables, cfg)

        for smooth in (False, True):
            fn = jax.jit(make_train_step(model, cfg, smooth=smooth))
            k = 0
            args = (
                smpl, inp, inp,
                inp["ray_o_all"][k], inp["ray_d_all"][k],
                inp["near_all"][k][:, 0], inp["far_all"][k][:, 0],
                inp["rgb_all"][k], inp["bkgd_msk_all"][k],
            )
            st, terms, psnr = fn(state, *args, jax.random.PRNGKey(1))
            float(psnr)  # sync
            t0 = time.time()
            n = 5
            cur = st
            for _ in range(n):
                cur, terms, psnr = fn(cur, *args, jax.random.PRNGKey(2))
            float(psnr)
            dt = (time.time() - t0) / n * 1e3
            print(f"{gather_impl:8s} smooth={str(smooth):5s} "
                  f"{dt:8.1f} ms/view-step")


if __name__ == "__main__":
    main()
