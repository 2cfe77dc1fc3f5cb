"""Benchmark: full-image render throughput on one TPU chip.

Workload (BASELINE.md speed target): 512x512 novel-view render, 128
samples/ray, 3 input views at 512x512, full 6890-vertex SMPL — the
reference's eval path (``lib/all_test.py:128-132`` prints per-image time on
one GPU; the north star is >=3x an A100's rays/sec/chip on v5e).

Baseline constant — derivation (the reference publishes no numbers, so we
bound it by FLOP count at 100% A100 peak, which over-credits the reference
and therefore under-states our multiple):

  The reference's forward runs ``knn_points`` over ALL sample points
  against the 6890 SMPL vertices before masking
  (lib/skinnning_batch.py:357): 512x512 rays x 128 samples = 33.55M
  points x 6890 verts x 8 FLOPs/distance = 1.85 PFLOP per image, in fp32
  on CUDA cores (pytorch3d's kernel is not a tensor-core matmul).  At the
  A100's 19.5 TFLOP/s fp32 peak that KNN alone takes >= 94.8 s/image,
  capping the reference at <= 2,765 rays/s even at 100% efficiency with
  every other op free (the 2 masked KNNs add ~0.2 PFLOP; MLP/transformer/
  ResNet are <1% of the total even at TF32 rates).  We still grant the
  reference 10,000 rays/s — a >3.6x allowance covering hypothetical
  masked-ray configs (H36M-style, ~3x fewer points) and sub-6890 vertex
  tricks it does not actually ship — and take 3x that (30,000) as the
  parity bar, so ``vs_baseline = rays_per_sec / 30000`` >= 1.0 meets the
  BASELINE.json speed target with margin to spare.

Prints ONE JSON line:
  {"metric": "render_rays_per_sec_512x512x128", "value": N,
   "unit": "rays/s/chip", "vs_baseline": N}
"""

import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from mpsnerf_tpu.utils.compilation_cache import enable_compilation_cache

    enable_compilation_cache()

    # device-liveness watchdog: a wedged tunnel hangs the FIRST device
    # op (the axon backend initializes lazily — sitecustomize only
    # registers the plugin; pytest survives a wedge because conftest
    # forces the CPU platform before any op).  A watchdog THREAD rather
    # than SIGALRM: a Python signal handler only runs between
    # bytecodes, and the hang is inside a blocking C PJRT call that
    # never returns to the interpreter — os._exit works from any
    # thread.  VALIDATED against the real 2026-08-17 wedge: prints the
    # diagnostic line and exits 3 at t=600 s.  Never trips on slow
    # compiles (the real programs compile AFTER this, unwatched).
    import os
    import threading

    alive = threading.Event()

    def _watch():
        if not alive.wait(600):
            print(json.dumps({
                "metric": "render_rays_per_sec_512x512x128",
                "value": 0.0, "unit": "rays/s/chip", "vs_baseline": 0.0,
                "error": "device unresponsive: trivial op did not "
                         "complete in 600 s (wedged tunnel / stale "
                         "device claim?)",
            }))
            sys.stdout.flush()
            os._exit(3)

    threading.Thread(target=_watch, daemon=True).start()
    try:
        np.asarray(jnp.sum(jnp.arange(8.0)))  # first device contact
    except Exception as e:  # fail-FAST mode (observed 2026-08-18): the
        # backend raises UNAVAILABLE at the first op instead of hanging.
        # The tunnel demonstrably FLAPS (alive 13:52, dead 14:07 the same
        # day), so retry for a bounded window before reporting failure —
        # round 3's official bench regressed to 0.0 on exactly such an
        # outage.  Retries re-exec the interpreter: a failed plugin init
        # can leave poisoned backend state in-process, and a fresh
        # process is the only clean probe.  The hang mode above does NOT
        # retry: a wedge never clears quickly and each attempt burns the
        # full 600 s watchdog.
        deadline = os.environ.get("MPSNERF_BENCH_RETRY_DEADLINE")
        if deadline is None:
            retry_s = float(os.environ.get("MPSNERF_BENCH_RETRY_S", "600"))
            deadline = str(time.time() + retry_s)
        if time.time() < float(deadline):
            print(f"device unavailable ({e!r:.200}); retrying in 60 s "
                  f"(until t={float(deadline):.0f})", file=sys.stderr)
            sys.stderr.flush()
            time.sleep(60)
            env = dict(os.environ, MPSNERF_BENCH_RETRY_DEADLINE=deadline)
            os.execve(sys.executable, [sys.executable] + sys.argv, env)
        print(json.dumps({
            "metric": "render_rays_per_sec_512x512x128",
            "value": 0.0, "unit": "rays/s/chip", "vs_baseline": 0.0,
            "error": f"device unavailable at first contact "
                     f"(retried until deadline): {e!r:.300}",
        }))
        sys.stdout.flush()
        os._exit(3)
    alive.set()

    from mpsnerf_tpu.data.synthetic import SyntheticHumanDataset
    from mpsnerf_tpu.models.mps_nerf import MPSNeRF
    from mpsnerf_tpu.renderer.render import render_rays
    from mpsnerf_tpu.train.trainer import to_device_input
    from mpsnerf_tpu.rays.rays import get_rays, get_near_far


    H = W = 512
    N_SAMPLES = 128
    # small on-device chunks win: swept {128..8192}, 256 peaks (better
    # VMEM locality for the compacted tail; the lax.map loop amortizes)
    CHUNK = int(os.environ.get("MPSNERF_BENCH_CHUNK", "256"))
    N_INPUT_VIEWS = 3
    # bf16 MLP/transformer matmuls are the TPU-native fast path; the
    # deviation on composited pixels is < 1/255 (tests/test_bf16.py).
    # Set MPSNERF_BENCH_DTYPE=float32 for the bit-parity configuration.
    DTYPE = os.environ.get("MPSNERF_BENCH_DTYPE", "bfloat16")

    from mpsnerf_tpu.data import attach_body_grid

    ds = SyntheticHumanDataset(
        n_poses=1, n_cameras=N_INPUT_VIEWS + 1, image_size=H, n_rays=64,
        n_verts=6890, num_instances=1,
        input_views=list(range(N_INPUT_VIEWS)),
    )
    item = ds.get_item(0, instance_idx=0)
    attach_body_grid(item)  # O(1) candidate cull for the hot 1-NN
    smpl = ds.smpl_for(0)
    inp = to_device_input(item)

    # target camera: the held-out view
    K, R, T = ds.cameras[N_INPUT_VIEWS]
    ray_o, ray_d = get_rays(H, W, K, R, T)
    ray_o = ray_o.reshape(-1, 3)
    ray_d = ray_d.reshape(-1, 3)
    bounds = np.asarray(item["bounds"])
    near, far, hit = get_near_far(bounds, ray_o.copy(), ray_d.copy())
    near_all = np.zeros(ray_o.shape[0], np.float32)
    far_all = np.ones(ray_o.shape[0], np.float32)
    near_all[hit] = near
    far_all[hit] = far

    # box cull: rays that miss the SMPL AABB provably composite to the
    # exact background (every sample fails the 5 cm mask -> raw = -80 ->
    # alpha ~ 0 -> rgb_map = 0), so only AABB-hit rays run the pipeline —
    # the same pre-masking the reference itself applies on H36M
    # (all_test.py:384-387).  The output image is identical; the metric
    # stays full-image rays / wall time.
    BOX_CULL = os.environ.get("MPSNERF_BENCH_CULL", "1") == "1"
    n_img_rays = ray_o.shape[0]
    if BOX_CULL:
        sel = np.flatnonzero(hit)
    else:
        sel = np.arange(n_img_rays)
    hit_frac = len(sel) / n_img_rays

    # compaction capacity: ~6% of ALL image samples lie within 5 cm of
    # the body at 512x512 (measured).  Culling concentrates the valid
    # samples into the hit rays, so the per-chunk valid fraction scales
    # by 1/hit_frac; rays are shuffled below so every chunk sits near
    # that mean, and ~2x headroom never drops points.
    frac = min(0.5, max(0.125, 2.0 * 0.06 / hit_frac))
    cf = float(os.environ.get("MPSNERF_BENCH_COMPACT", frac))
    model = MPSNeRF(
        num_instances=1, compact_fraction=cf, compute_dtype=DTYPE
    )
    variables = jax.jit(model.init, static_argnames=("train",))(
        {"params": jax.random.PRNGKey(0)}, smpl, inp, inp,
        jnp.zeros((8, 3)), jnp.zeros((8, 3)), train=False,
    )

    latent = jax.jit(model.apply, static_argnames=("train", "method"))(
        variables, inp["img_all"], train=False, method="encode",
    )

    # MPSNERF_BENCH_MODE: "compact" (global candidate compaction, default)
    # or "mapped" (per-chunk lax.map renderer)
    MODE = os.environ.get("MPSNERF_BENCH_MODE", "compact")
    n_rays = len(sel)
    key = jax.random.PRNGKey(0)

    if MODE == "compact":
        from mpsnerf_tpu.renderer.render import (
            fine_rays_compact, plan_rays_compact, render_rays_compact,
        )

        TILE = int(os.environ.get("MPSNERF_BENCH_TILE", "16384"))
        ro = jnp.asarray(ray_o[sel])
        rd = jnp.asarray(ray_d[sel])
        nr = jnp.asarray(near_all[sel])
        fr = jnp.asarray(far_all[sel])

        @jax.jit
        def plan_fn(a, b, c, d):
            return plan_rays_compact(
                smpl, inp, a, b, c, d, key, n_samples=N_SAMPLES,
                perturb=0.0,
            )

        # exact capacities from one setup pre-pass: the plans cover the
        # EXACT deterministic sample set the render uses (same key,
        # perturb=0), so no headroom is needed — the warm-up's
        # n_dropped == 0 assert would catch any drift
        plan0 = plan_fn(ro, rd, nr, fr)
        n_cand = int(plan0.n_valid)
        capacity = ((n_cand + TILE - 1) // TILE) * TILE

        @jax.jit
        def fine_fn(a, b, c, d, plan):
            return fine_rays_compact(
                smpl, inp, a, b, c, d, key, n_samples=N_SAMPLES,
                plan=plan, capacity=capacity, perturb=0.0,
            )

        # second-stage exact-mask compaction (default on, matching the
        # eval runner): the 1-NN mask/ids come from the fine pre-pass,
        # the tail runs only on true 5 cm body points and skips its
        # internal 1-NN (235.9k vs 231.4k rays/s measured at 512^2)
        USE_FINE = os.environ.get("MPSNERF_BENCH_FINE", "1") == "1"
        if USE_FINE:
            fplan0, _ = fine_fn(ro, rd, nr, fr, plan0)
            n_fine = int(fplan0.n_valid)
            fine_capacity = ((n_fine + TILE - 1) // TILE) * TILE
        else:
            fine_capacity = 0

        @jax.jit
        def image_fn(a, b, c, d, k, plan, fplan, fids):
            return render_rays_compact(
                model, variables, smpl, inp, inp, latent, a, b, c, d, k,
                n_samples=N_SAMPLES, capacity=capacity, tile=TILE,
                fine_capacity=fine_capacity, perturb=0.0, train=False,
                plan=plan, fine_plan=fplan, fine_ids=fids,
            )

        def render_full():
            # the pre-passes are real per-view work (the eval runner pays
            # them per view) — inside the timed region
            plan = plan_fn(ro, rd, nr, fr)
            fplan = fids = None
            if USE_FINE:
                fplan, fids = fine_fn(ro, rd, nr, fr, plan)
            out = image_fn(ro, rd, nr, fr, key, plan, fplan, fids)
            rgb = np.asarray(out[0])
            img = np.zeros((n_img_rays, 3), np.float32)
            img[sel] = rgb
            return img, out[3]

    else:
        from mpsnerf_tpu.renderer.render import render_rays_mapped

        capacity = -1

        @jax.jit
        def image_fn(ro, rd, nr, fr, key):
            return render_rays_mapped(
                model, variables, smpl, inp, inp, latent, ro, rd, nr, fr,
                key, chunk=CHUNK, n_samples=N_SAMPLES, perturb=0.0,
                train=False, with_dropped=True,
            )

        n_pad = ((n_rays + CHUNK - 1) // CHUNK) * CHUNK

        def pad(x):
            x = x[sel]
            return np.concatenate(
                [x, np.zeros((n_pad - len(x),) + x.shape[1:], x.dtype)]
            )

        # shuffle rays so per-chunk in-body fractions equal the image mean
        # (contiguous body chunks would overflow the compaction capacity)
        perm = np.random.default_rng(0).permutation(n_pad)
        inv_perm = np.argsort(perm)
        ro = jnp.asarray(pad(ray_o)[perm])
        rd = jnp.asarray(pad(ray_d)[perm])
        nr = jnp.asarray(pad(near_all)[perm])
        fr = jnp.asarray(pad(far_all)[perm])

        def render_full():
            out = image_fn(ro, rd, nr, fr, key)
            # fetch real values: on the tunneled backend block_until_ready
            # returns before execution completes — only a host transfer of
            # the result is a true synchronization point (and users fetch
            # images anyway, so the transfer belongs in the measurement)
            rgb = np.asarray(out[0])
            # assemble the FULL image (unshuffle + scatter into background)
            # — part of the work a user's render pays, so part of the timing
            img = np.zeros((n_img_rays, 3), np.float32)
            img[sel] = rgb[inv_perm][:n_rays]
            return img, out[3]

    _, n_dropped = render_full()  # warm-up / compile
    # the measured image must be exact: no compacted point dropped
    if MODE == "compact":
        hint = (
            "plan pre-pass disagreed with the render — check "
            "plan_rays_compact"
        )
    else:
        hint = f"raise MPSNERF_BENCH_COMPACT above {cf}"
    assert int(n_dropped) == 0, (
        f"compaction overflow ({int(n_dropped)} pts) — {hint}"
    )

    n_images = 3
    t0 = time.time()
    for _ in range(n_images):
        outs = render_full()
    dt = (time.time() - t0) / n_images

    rays_per_sec = n_img_rays / dt

    # --- train-step timing: catches hot-path regressions the render
    # metric can't see (round 2's 10x VJP regression, commit 14f0201) ---
    train_ms = {}
    if os.environ.get("MPSNERF_BENCH_TRAIN", "1") == "1":
        from mpsnerf_tpu.train.trainer import Trainer, TrainConfig

        # shipped train configuration: fp32, 50% compaction, N_rand~1000
        model_t = MPSNeRF(num_instances=1, compact_fraction=0.5)
        cfg_t = TrainConfig(smooth_loss=True)
        trainer = Trainer(model_t, cfg_t, variables)
        n_rand = 1000
        tsel = sel[:n_rand]
        t_args = (
            smpl, inp, inp,
            jnp.asarray(ray_o[tsel]), jnp.asarray(ray_d[tsel]),
            jnp.asarray(near_all[tsel]), jnp.asarray(far_all[tsel]),
            jnp.zeros((n_rand, 3), jnp.float32),
            jnp.zeros((n_rand, 1), jnp.float32),
            jax.random.PRNGKey(1),
        )
        # reps sized so each timed window is ~1 s: the tunnel adds
        # ~100-150 ms RPC latency per SYNC (measured round 5,
        # tools/train_timing_probe.py).  TWO chained windows, report the
        # MIN: one tunnel stall inside a single window produced the
        # 192.8-vs-85.8 ms same-HEAD spread of 2026-08-19 — the min of
        # two windows is the step cost, the max is the flap
        for name, fn, reps in (
            ("plain", trainer._step_plain, 5),
            ("smooth", trainer._step_smooth, 3),
        ):
            state, terms, _ = fn(trainer.state, *t_args)  # compile
            trainer.state = state
            np.asarray(terms.total)  # true sync on the tunneled backend
            windows = []
            for _ in range(2):
                t0 = time.time()
                for _ in range(reps):
                    state, terms, _ = fn(trainer.state, *t_args)
                    trainer.state = state
                np.asarray(terms.total)
                windows.append((time.time() - t0) / reps * 1000.0)
            train_ms[f"train_step_ms_{name}"] = round(min(windows), 1)

    print(
        json.dumps(
            {
                "metric": "render_rays_per_sec_512x512x128",
                "value": round(rays_per_sec, 1),
                "unit": "rays/s/chip",
                "vs_baseline": round(rays_per_sec / 30000.0, 3),
                "hit_rays": int(n_rays),
                # throughput over the rays that actually execute (no cull
                # credit) — comparable across cull on/off configurations
                "hit_rays_per_sec": round(n_rays / dt, 1),
                "compute_dtype": DTYPE,
                "mode": MODE,
                "chunk": CHUNK,
                "capacity": capacity,
                "compact_fraction": round(cf, 4),
                **train_ms,
            }
        )
    )


if __name__ == "__main__":
    main()
