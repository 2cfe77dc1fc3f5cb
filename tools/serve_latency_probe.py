#!/usr/bin/env python
"""Measure the serving bundle's request latency on the real chip.

Run with the tunneled TPU live:

    PYTHONPATH=/root/repo:/root/.axon_site python -u tools/serve_latency_probe.py

Measures, at the bench workload (512x512 view, 128 samples, 6890-vert
synthetic subject, bf16):

  * export time (model -> bundle on disk) and bundle size
  * ServedRenderer.render_view per-view latency (chunked exported graph)
  * the same view through the HTTP server on localhost (adds request
    parse + npy response; the device dicts re-upload once per fresh
    item, mirroring a real first request vs steady-state)
  * ViewRenderer (global-compaction eval path) per-view latency for
    reference

Writes artifacts/serve_latency.json.  Timing discipline per
tools/WEDGE_RUNBOOK.md: fetching the image IS the sync point here
(serving returns pixels to a client, so the fetch is part of the
product latency, unlike kernel probes).
"""

import io
import json
import os
import sys
import time
import urllib.request

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from mpsnerf_tpu.data import attach_body_grid
    from mpsnerf_tpu.data.synthetic import SyntheticHumanDataset
    from mpsnerf_tpu.eval.runner import ViewRenderer
    from mpsnerf_tpu.models.mps_nerf import MPSNeRF
    from mpsnerf_tpu.serve import export_serving_bundle, load_serving_bundle
    from mpsnerf_tpu.serve.server import BundleServer, items_to_npz_bytes
    from mpsnerf_tpu.train.trainer import to_device_input
    from mpsnerf_tpu.utils.compilation_cache import enable_compilation_cache

    enable_compilation_cache()
    from mpsnerf_tpu.utils.liveness import first_contact_watchdog
    first_contact_watchdog()  # exit 3 instead of stalling the batch

    H = W = int(os.environ.get("MPSNERF_SERVE_PROBE_RES", "512"))
    N_SAMPLES = int(os.environ.get("MPSNERF_SERVE_PROBE_SAMPLES", "128"))
    CHUNK = int(os.environ.get("MPSNERF_SERVE_PROBE_CHUNK", "4096"))
    DTYPE = os.environ.get("MPSNERF_BENCH_DTYPE", "bfloat16")
    N_REQ = int(os.environ.get("MPSNERF_SERVE_PROBE_REQS", "4"))

    print(f"probe: {H}x{W}x{N_SAMPLES}, chunk={CHUNK}, dtype={DTYPE}")
    ds = SyntheticHumanDataset(
        n_poses=1, n_cameras=4, image_size=H, n_rays=64, n_verts=6890,
        num_instances=1, input_views=[0, 1, 2], split="test",
    )
    item = ds.get_item(0, instance_idx=0)
    attach_body_grid(item)
    smpl = ds.smpl_for(0)
    inp = to_device_input(item)
    model = MPSNeRF(num_instances=1, compute_dtype=DTYPE)
    variables = jax.jit(model.init, static_argnames=("train",))(
        {"params": jax.random.PRNGKey(0)}, smpl, inp, inp,
        jnp.zeros((8, 3)), jnp.zeros((8, 3)), train=False,
    )
    gender = int(np.asarray(item["gender"]))

    out = {"res": H, "n_samples": N_SAMPLES, "chunk": CHUNK,
           "dtype": DTYPE, "backend": jax.default_backend()}

    bundle_dir = "/tmp/serve_probe_bundle"
    t0 = time.perf_counter()
    export_serving_bundle(
        bundle_dir, model, variables, {gender: smpl}, dict(item),
        dict(item), chunk=CHUNK, n_samples=N_SAMPLES,
    )
    out["export_s"] = time.perf_counter() - t0
    out["bundle_mb"] = sum(
        os.path.getsize(os.path.join(bundle_dir, f))
        for f in os.listdir(bundle_dir)
    ) / 1e6
    print(f"export: {out['export_s']:.1f}s, {out['bundle_mb']:.1f} MB")

    served = load_serving_bundle(bundle_dir)
    n_rays = H * W

    def timed_views(fn, n):
        ts = []
        for i in range(n):
            t = time.perf_counter()
            rgb = fn(i)
            assert rgb.shape == (n_rays, 3)
            ts.append(time.perf_counter() - t)
            print(f"  view {i}: {ts[-1]*1e3:.0f} ms "
                  f"({n_rays/ts[-1]/1e3:.1f}k rays/s)")
        return ts

    print("served direct (first request compiles):")
    req_item = dict(item)  # latent/device caches live on the dict
    direct = timed_views(
        lambda i: served.render_view(req_item, req_item, 3), N_REQ
    )
    out["served_direct_ms"] = [t * 1e3 for t in direct]
    out["served_steady_rays_per_s"] = n_rays / min(direct)
    out["served_global"] = bool(served.manifest.get("has_global"))
    out["served_global_fallbacks"] = served.n_global_fallbacks

    if served.manifest.get("has_global"):
        print("served chunked (use_global=0, the dense graph):")
        chunked = timed_views(
            lambda i: served.render_view(req_item, req_item, 3,
                                         use_global=False), N_REQ
        )
        out["served_chunked_ms"] = [t * 1e3 for t in chunked]

    print("served over HTTP (localhost):")
    srv = BundleServer(served).start()
    try:
        host, port = srv.address
        body = items_to_npz_bytes(item, item)
        out["request_mb"] = len(body) / 1e6

        def http_view(i):
            req = urllib.request.Request(
                f"http://{host}:{port}/render?view=3", data=body,
                method="POST",
            )
            with urllib.request.urlopen(req) as r:
                return np.load(io.BytesIO(r.read()))

        http = timed_views(http_view, N_REQ)
        out["served_http_ms"] = [t * 1e3 for t in http]
    finally:
        srv.stop()

    print("eval ViewRenderer (global compaction) reference:")
    vr = ViewRenderer(model, lambda g: smpl, chunk=CHUNK,
                      n_samples=N_SAMPLES)
    vr.prewarm(variables, item, item, k=3)
    ev = timed_views(
        lambda i: vr.render_view(variables, item, item, 3), N_REQ
    )
    out["eval_renderer_ms"] = [t * 1e3 for t in ev]

    os.makedirs("artifacts", exist_ok=True)
    with open("artifacts/serve_latency.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
