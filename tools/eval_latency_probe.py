"""Eval-runner latency artifact: per-image wall time through ViewRenderer.

Exercises the PRODUCT eval path (ViewRenderer with the global-compaction
renderer, capacity buckets, latent cache) on the synthetic 512x512 scene —
the same workload bench.py measures at the raw-renderer level — and
records per-view latency + throughput to artifacts/eval_latency.json.
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
    from mpsnerf_tpu.utils.liveness import first_contact_watchdog
    first_contact_watchdog()  # exit 3 instead of stalling the batch

    from mpsnerf_tpu.data.synthetic import SyntheticHumanDataset
    from mpsnerf_tpu.eval.runner import ViewRenderer
    from mpsnerf_tpu.models.mps_nerf import MPSNeRF
    from mpsnerf_tpu.train.trainer import to_device_input

    SIZE = 512
    # split="test" is ESSENTIAL: the train split samples only n_rays rays
    # per view, so the round-2 revision of this probe silently measured
    # 64-ray views (pure dispatch overhead) while claiming 512x512
    ds = SyntheticHumanDataset(
        n_poses=2, n_cameras=6, image_size=SIZE, n_rays=64, n_verts=6890,
        num_instances=1, input_views=[0, 2, 4], split="test",
    )
    items = [ds.get_item(i, instance_idx=0) for i in range(2)]
    smpl = ds.smpl_for(0)
    inp = to_device_input(items[0])
    model = MPSNeRF(num_instances=1, compute_dtype="bfloat16")
    variables = jax.jit(model.init, static_argnames=("train",))(
        {"params": jax.random.PRNGKey(0)}, smpl, inp, inp,
        jnp.zeros((8, 3)), jnp.zeros((8, 3)), train=False,
    )

    r = ViewRenderer(model, lambda g: smpl, n_samples=128)

    # pre-warm: compiles count_fn + the predicted capacity bucket AND its
    # ladder neighbour, so a mid-protocol bucket change doesn't recompile
    # inside the timed loop (round-2 artifact had one 4970 ms outlier)
    caps = r.prewarm(variables, items[0], items[0], k=1)
    r.render_view(variables, items[0], items[0], 1)

    times = []
    views = [1, 3, 5]
    seq = [(it, k) for it in items for k in views]
    t0 = time.time()
    for it, k in seq:
        tv = time.time()
        rgb = r.render_view(variables, it, it, k)
        times.append(time.time() - tv)
        assert np.isfinite(rgb).all()
    total = time.time() - t0
    n_views = len(seq)

    # pipelined protocol loop (what _eval_pass runs with render_async):
    # view i's fetch + host post-processing overlap view i+1's device
    # render, so the steady-state stage time is what a real protocol pays
    pipe_times = []
    tp0 = time.time()
    pending = None
    for it, k in seq:
        tv = time.time()
        h = r.render_view_async(variables, it, it, k)
        if pending is not None:
            ph, ptv = pending
            rgb = r.finish_view(ph)
            assert np.isfinite(rgb).all()
            pipe_times.append(time.time() - ptv)
        pending = (h, tv)
    rgb = r.finish_view(pending[0])
    pipe_times.append(time.time() - pending[1])
    pipe_total = time.time() - tp0


    med = float(np.median(times))
    out = {
        "workload": f"{SIZE}x{SIZE}x128 full-image novel view, 3 input "
                    "views, ViewRenderer (global compaction)",
        "views_rendered": n_views,
        "prewarmed_capacities": caps,
        "per_view_ms": [round(t * 1e3, 1) for t in times],
        # median is the steady-state number; max/median flags any
        # remaining in-loop recompile (should be < 1.5 after prewarm)
        "median_view_ms": round(med * 1e3, 1),
        "max_over_median": round(float(np.max(times)) / med, 2),
        "mean_view_ms": round(np.mean(times) * 1e3, 1),
        "rays_per_sec": round(SIZE * SIZE * n_views / total, 1),
        "pipelined_total_ms": round(pipe_total * 1e3, 1),
        "pipelined_view_ms": round(pipe_total / n_views * 1e3, 1),
        # per-view stage latencies keep the recompile-outlier check
        # meaningful in the pipelined loop too
        "pipelined_per_view_ms": [round(t * 1e3, 1) for t in pipe_times],
        "pipelined_median_view_ms": round(
            float(np.median(pipe_times)) * 1e3, 1
        ),
        "pipelined_max_over_median": round(
            float(np.max(pipe_times)) / float(np.median(pipe_times)), 2
        ),
        "pipelined_rays_per_sec": round(
            SIZE * SIZE * n_views / pipe_total, 1
        ),
        "overflow_retries": r.n_overflow_chunks,
    }
    os.makedirs("artifacts", exist_ok=True)
    with open("artifacts/eval_latency.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
