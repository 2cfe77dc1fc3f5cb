"""Train-step timing at the shipped workload scale.

N_rand=1000 rays x 128 samples, 3x512^2 input views, 6890-vert SMPL
(configs/canonical_transformer.txt scale).  Compares compute dtypes and
the body-grid candidate cull.  Run on an IDLE machine.
"""

import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from mpsnerf_tpu.data.synthetic import SyntheticHumanDataset
    from mpsnerf_tpu.data import attach_body_grid
    from mpsnerf_tpu.models.mps_nerf import MPSNeRF
    from mpsnerf_tpu.train.trainer import Trainer, TrainConfig, to_device_input
    from mpsnerf_tpu.utils.compilation_cache import enable_compilation_cache

    enable_compilation_cache()

    ds = SyntheticHumanDataset(
        n_poses=1, n_cameras=4, image_size=512, n_rays=1000, n_verts=6890,
        num_instances=1, input_views=[0, 1, 2],
    )
    item = ds.get_item(0, instance_idx=0)
    smpl = ds.smpl_for(0)

    import os
    dtypes = os.environ.get("MPSNERF_PROBE_DTYPES", "float32,bfloat16").split(",")
    for dtype in dtypes:
        for grid in (False, True):
            it = dict(item)
            it.pop("body_grid", None)
            if grid:
                attach_body_grid(it)
            inp = to_device_input(it)
            model = MPSNeRF(
                num_instances=1, compact_fraction=0.5, compute_dtype=dtype
            )
            variables = jax.jit(model.init, static_argnames=("train",))(
                {"params": jax.random.PRNGKey(0)}, smpl, inp, inp,
                jnp.zeros((8, 3)), jnp.zeros((8, 3)), train=False,
            )
            cfg = TrainConfig(n_samples=128, smooth_loss=True,
                              smooth_interval=4)
            trainer = Trainer(model, cfg, variables)
            key = jax.random.PRNGKey(1)

            # warm-up: compiles both step variants (1 item = 4 view-steps,
            # incl. one smooth step)
            key, sub = jax.random.split(key)
            trainer.train_item(smpl, inp, inp, sub)

            t0 = time.time()
            n_items = 3
            for _ in range(n_items):
                key, sub = jax.random.split(key)
                logs = trainer.train_item(smpl, inp, inp, sub)
            n_views = int(np.asarray(inp["rgb_all"].shape[0]))
            dt = (time.time() - t0) / (n_items * n_views) * 1e3
            print(
                f"dtype={dtype:9s} body_grid={str(grid):5s} "
                f"{dt:7.1f} ms/view-step  (loss {logs['loss']:.4f})"
            )


if __name__ == "__main__":
    main()
