#!/usr/bin/env python
"""Serve /mesh and /animate end-to-end on the real chip — the acceptance
test that the exported mesh-occupancy and animation graphs compile and
answer requests on TPU (they are exercised on the CPU mesh by
tests/test_serve.py, but XLA:TPU is a different compiler).

    PYTHONPATH=/root/repo:/root/.axon_site python -u tools/serve_mesh_anim_probe.py

Reuses the bundle exported by tools/serve_latency_probe.py when present
(same workload: 512x512, 128 samples, 6890-vert synthetic subject) or
exports a fresh one.  Times the FIRST request (compile + run) and a
repeat request per route, and appends the rows to
artifacts/serve_latency.json.
"""

import io
import json
import os
import sys
import time
import urllib.request

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BUNDLE_DIR = os.environ.get("MPSNERF_SERVE_PROBE_BUNDLE",
                            "/tmp/serve_probe_bundle")


def _make_bundle():
    import jax
    import jax.numpy as jnp

    from mpsnerf_tpu.data import attach_body_grid
    from mpsnerf_tpu.data.synthetic import SyntheticHumanDataset
    from mpsnerf_tpu.models.mps_nerf import MPSNeRF
    from mpsnerf_tpu.serve import export_serving_bundle
    from mpsnerf_tpu.train.trainer import to_device_input

    H = int(os.environ.get("MPSNERF_SERVE_PROBE_RES", "512"))
    ds = SyntheticHumanDataset(
        n_poses=1, n_cameras=4, image_size=H, n_rays=64, n_verts=6890,
        num_instances=1, input_views=[0, 1, 2], split="test",
    )
    item = ds.get_item(0, instance_idx=0)
    attach_body_grid(item)
    if not os.path.exists(os.path.join(BUNDLE_DIR, "manifest.json")):
        # only the export needs model/variables — the cached-bundle fast
        # path must not pay a full init compile over the tunnel
        smpl = ds.smpl_for(0)
        inp = to_device_input(item)
        model = MPSNeRF(
            num_instances=1,
            compute_dtype=os.environ.get("MPSNERF_BENCH_DTYPE", "bfloat16"),
        )
        variables = jax.jit(model.init, static_argnames=("train",))(
            {"params": jax.random.PRNGKey(0)}, smpl, inp, inp,
            jnp.zeros((8, 3)), jnp.zeros((8, 3)), train=False,
        )
        gender = int(np.asarray(item["gender"]))
        export_serving_bundle(
            BUNDLE_DIR, model, variables, {gender: smpl}, dict(item),
            dict(item), chunk=4096, n_samples=128,
        )
    return item


def main():
    import jax

    from mpsnerf_tpu.serve import load_serving_bundle
    from mpsnerf_tpu.serve.server import BundleServer, items_to_npz_bytes
    from mpsnerf_tpu.utils.compilation_cache import enable_compilation_cache

    enable_compilation_cache()
    from mpsnerf_tpu.utils.liveness import first_contact_watchdog
    first_contact_watchdog()

    item = _make_bundle()
    served = load_serving_bundle(BUNDLE_DIR)
    assert served.manifest.get("has_mesh") and served.manifest.get(
        "has_anim"
    ), "bundle lacks mesh/anim graphs — re-export"

    out = {"backend": jax.default_backend()}
    srv = BundleServer(served).start()
    try:
        host, port = srv.address
        body = items_to_npz_bytes(item, item)

        def post(route):
            t0 = time.perf_counter()
            req = urllib.request.Request(
                f"http://{host}:{port}{route}", data=body, method="POST",
            )
            with urllib.request.urlopen(req) as r:
                payload = r.read()
            return time.perf_counter() - t0, payload

        n = int(os.environ.get("MPSNERF_SERVE_PROBE_MESH_N", "128"))
        for route, key, check in (
            (f"/mesh?n={n}", "mesh",
             lambda p: len(np.load(io.BytesIO(p))["verts"]) > 100),
            ("/animate?view=1&fast=1", "animate",
             lambda p: np.isfinite(np.load(io.BytesIO(p))).all()),
        ):
            t_first, payload = post(route)
            assert check(payload), route
            t_repeat, payload = post(route)
            assert check(payload), route
            out[f"{key}_first_request_s"] = round(t_first, 2)
            out[f"{key}_repeat_request_s"] = round(t_repeat, 2)
            print(f"{route}: first {t_first:.1f}s (compile+run), "
                  f"repeat {t_repeat:.1f}s")
    finally:
        srv.stop()

    path = "artifacts/serve_latency.json"
    merged = {}
    if os.path.exists(path):
        merged = json.load(open(path))
    merged.update({f"served_{k}": v for k, v in out.items()
                   if k != "backend"})
    os.makedirs("artifacts", exist_ok=True)
    with open(path, "w") as f:
        json.dump(merged, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
