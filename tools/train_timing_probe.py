"""Per-rep train-step timing distribution — diagnose bench train variance.

Replicates bench.py's train-step block exactly (same synthetic scene,
same Trainer configuration) but times each rep individually with a hard
device sync per rep, plus an async-chained variant (bench.py's method:
sync only at the end).  Distinguishes a real regression from tunnel-RPC
noise in the driver-visible train_step_ms_plain number.
"""

import json
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
    from mpsnerf_tpu.train.trainer import Trainer, TrainConfig, to_device_input

    ds = SyntheticHumanDataset(
        n_poses=1, n_cameras=4, image_size=512, n_rays=1000, n_verts=6890,
        num_instances=1, input_views=[0, 1, 2],
    )
    item = ds.get_item(0, instance_idx=0)
    attach_body_grid(item)
    smpl = ds.smpl_for(0)
    inp = to_device_input(item)

    model = MPSNeRF(num_instances=1, compact_fraction=0.5)
    variables = jax.jit(model.init, static_argnames=("train",))(
        {"params": jax.random.PRNGKey(0)}, smpl, inp, inp,
        jnp.zeros((8, 3)), jnp.zeros((8, 3)), train=False,
    )
    cfg = TrainConfig(n_samples=128, smooth_loss=True)
    trainer = Trainer(model, cfg, variables)

    n_rand = 1000
    t_args = (
        smpl, inp, inp,
        jnp.zeros((n_rand, 3), jnp.float32),
        jnp.ones((n_rand, 3), jnp.float32) / np.sqrt(3.0),
        jnp.zeros((n_rand,), jnp.float32),
        jnp.full((n_rand,), 4.0, jnp.float32),
        jnp.zeros((n_rand, 3), jnp.float32),
        jnp.zeros((n_rand, 1), jnp.float32),
        jax.random.PRNGKey(1),
    )

    out = {}
    for name, fn in (("plain", trainer._step_plain),
                     ("smooth", trainer._step_smooth)):
        state, terms, _ = fn(trainer.state, *t_args)  # compile
        trainer.state = state
        np.asarray(terms.total)

        # per-rep, hard sync each rep
        reps = int(os.environ.get("MPSNERF_PROBE_REPS", "12"))
        times = []
        for _ in range(reps):
            t0 = time.time()
            state, terms, _ = fn(trainer.state, *t_args)
            trainer.state = state
            np.asarray(terms.total)
            times.append((time.time() - t0) * 1000.0)
        times = np.array(times)

        # async-chained (bench.py method): sync only at the end
        t0 = time.time()
        for _ in range(reps):
            state, terms, _ = fn(trainer.state, *t_args)
            trainer.state = state
        np.asarray(terms.total)
        chained = (time.time() - t0) / reps * 1000.0

        out[name] = {
            "per_rep_ms": [round(t, 1) for t in times.tolist()],
            "median_ms": round(float(np.median(times)), 1),
            "min_ms": round(float(times.min()), 1),
            "max_ms": round(float(times.max()), 1),
            "chained_ms": round(chained, 1),
        }
        print(name, json.dumps(out[name]))

    print(json.dumps(out))


if __name__ == "__main__":
    main()
