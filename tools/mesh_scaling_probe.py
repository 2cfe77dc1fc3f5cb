"""Multi-chip scaling knobs, measured on the virtual CPU mesh
(VERDICT r3 task 7) so real multi-chip hardware day is turnkey.

For every (data, ray) factorization of an 8-device mesh this records,
per training step:
  * the collective ops XLA inserted (kind, dtype/shape, bytes) — parsed
    from the compiled HLO, i.e. exactly what would ride ICI;
  * wall-clock step-time RATIOS across mesh shapes (absolutes on a
    1-CPU host are meaningless; the ratio isolates the sharding's
    arithmetic/communication split from host speed);
and asserts that the pod-scale ``make_sharded_render`` path compiles
with ZERO collectives — each device renders its ray slice
independently and only the host-side image fetch crosses the mesh
(SURVEY §2.2 ray/sample-axis sharding).

Usage (standalone; forces an 8-device virtual CPU mesh):
    PYTHONPATH=/root/repo python -u tools/mesh_scaling_probe.py
Writes artifacts/mesh_scaling.json.
"""

import json
import os
import re
import sys
import time

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# the axon sitecustomize force-sets jax_platforms="axon,cpu" via
# jax.config, so the env var alone does NOT win — this probe must never
# touch the real chip
jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

N_DEVICES = 8
DTYPE_BYTES = {
    "f32": 4, "f16": 2, "bf16": 2, "f64": 8,
    "s32": 4, "u32": 4, "s8": 1, "u8": 1, "pred": 1, "s64": 8, "u64": 8,
}

# one HLO instruction: "  %x = f32[128,3]{...} all-reduce(...)" — capture
# every result shape (tuples list several) plus the op kind
_COLLECTIVE_RE = re.compile(
    r"(all-reduce|all-gather|reduce-scatter|collective-permute|"
    r"all-to-all)"
)
_SHAPE_RE = re.compile(r"(f32|f16|bf16|f64|s32|u32|s8|u8|s64|u64|pred)"
                       r"\[([0-9,]*)\]")


def collective_stats(compiled_text: str):
    """(per-kind op counts, total bytes moved) from compiled HLO."""
    counts, total_bytes, ops = {}, 0, []
    for line in compiled_text.splitlines():
        line = line.strip()
        m = _COLLECTIVE_RE.search(line)
        if not m or "=" not in line:
            continue
        # only the instruction's RESULT shapes (left of the op name)
        lhs = line.split(m.group(1))[0]
        kind = m.group(1)
        if kind + "-start" in line or kind + "-done" in line:
            kind = kind  # async pairs still count once via -start only
        if f"{m.group(1)}-done" in line:
            continue
        nbytes = 0
        for dt, dims in _SHAPE_RE.findall(lhs):
            n = 1
            for d in dims.split(","):
                if d:
                    n *= int(d)
            nbytes += n * DTYPE_BYTES[dt]
        counts[kind] = counts.get(kind, 0) + 1
        total_bytes += nbytes
        ops.append({"kind": kind, "bytes": nbytes})
    return counts, total_bytes, ops


def build_scene(n_rays):
    import __graft_entry__ as g

    return g._build_scene(n_verts=300, image_size=32, n_rays=n_rays)


def main():
    from mpsnerf_tpu.models.mps_nerf import MPSNeRF
    from mpsnerf_tpu.parallel.mesh import (
        DATA_AXIS, RAY_AXIS, make_2d_mesh, make_batched_train_step,
        make_mesh, make_sharded_render, replicate_to_mesh,
    )
    from mpsnerf_tpu.train.trainer import TrainConfig, create_train_state
    from mpsnerf_tpu.utils.compilation_cache import enable_compilation_cache

    enable_compilation_cache()
    devices = jax.devices()[:N_DEVICES]
    assert len(devices) == N_DEVICES, len(devices)

    n_rays_per_dev = 16
    n_samples = 8
    result = {"n_rays_per_dev": n_rays_per_dev, "n_samples": n_samples,
              "shapes": {}}

    # one scene at the largest per-item ray count; every shape slices it
    ds, smpl, inp = build_scene(n_rays_per_dev * N_DEVICES)
    model = MPSNeRF(num_instances=1)
    variables = model.init(
        {"params": jax.random.PRNGKey(0)}, smpl, inp, inp,
        jnp.zeros((8, 3)), jnp.zeros((8, 3)), train=False,
    )
    cfg = TrainConfig(n_samples=n_samples, perturb=0.0, smooth_loss=False)
    n_params = sum(
        int(np.prod(p.shape)) for p in jax.tree.leaves(variables["params"])
    )
    result["n_params"] = n_params

    times = {}
    for data_sz in (1, 2, 4, 8):
        ray_sz = N_DEVICES // data_sz
        mesh = make_2d_mesh(data_sz, ray_sz, devices)
        state = create_train_state(model, variables, cfg)
        step_fn = make_batched_train_step(model, cfg, mesh, smooth=False)

        def shard(tree, spec):
            return jax.device_put(tree, NamedSharding(mesh, spec))

        def stack(trees):
            return jax.tree.map(lambda *xs: jnp.stack(xs, 0), *trees)

        k = 0
        n_rays = n_rays_per_dev * ray_sz
        rays = (
            inp["ray_o_all"][k][:n_rays], inp["ray_d_all"][k][:n_rays],
            inp["near_all"][k][:n_rays, 0], inp["far_all"][k][:n_rays, 0],
            inp["rgb_all"][k][:n_rays], inp["bkgd_msk_all"][k][:n_rays],
        )
        smpl_b = shard(stack([jax.tree.map(jnp.asarray, smpl)] * data_sz),
                       P(DATA_AXIS))
        inp_b = shard(stack([inp] * data_sz), P(DATA_AXIS))
        rays_b = [shard(stack([r] * data_sz), P(DATA_AXIS, RAY_AXIS))
                  for r in rays]
        keys = shard(stack([jax.random.PRNGKey(i) for i in range(data_sz)]),
                     P(DATA_AXIS))
        args = (replicate_to_mesh(state, mesh), smpl_b, inp_b, inp_b,
                *rays_b, keys)

        lowered = step_fn.lower(*args)
        compiled = lowered.compile()
        counts, nbytes, _ = collective_stats(compiled.as_text())

        # warm + time (device-side sync via concrete fetch of the loss)
        out = compiled(*args)
        float(out[1].total)
        t0 = time.perf_counter()
        n_iter = 5
        for _ in range(n_iter):
            out = compiled(*args)
        float(out[1].total)
        dt = (time.perf_counter() - t0) / n_iter
        times[(data_sz, ray_sz)] = dt
        result["shapes"][f"data{data_sz}xray{ray_sz}"] = {
            "collectives": counts,
            "collective_bytes_per_step": nbytes,
            "step_time_s_virtual_cpu": round(dt, 4),
            "global_rays_per_step": n_rays * data_sz,
        }
        print(f"(data={data_sz}, ray={ray_sz}): collectives={counts}, "
              f"{nbytes/1e6:.2f} MB/step, {dt*1e3:.0f} ms/step "
              f"(virtual, ratio-use only)", flush=True)

    base = times[(1, N_DEVICES)]
    for key, dt in times.items():
        result["shapes"][f"data{key[0]}xray{key[1]}"]["step_time_ratio"] = (
            round(dt / base, 3)
        )

    # ---- pod-scale sharded render: must compile with ZERO collectives
    mesh1d = make_mesh(devices)
    render = make_sharded_render(model, mesh1d, n_samples=n_samples)
    n_rays = n_rays_per_dev * N_DEVICES
    ray_sharding = NamedSharding(mesh1d, P(RAY_AXIS))
    rargs = (
        replicate_to_mesh(variables, mesh1d),
        replicate_to_mesh(jax.tree.map(jnp.asarray, smpl), mesh1d),
        replicate_to_mesh(inp, mesh1d), replicate_to_mesh(inp, mesh1d),
        replicate_to_mesh(
            model.apply(variables, inp["img_all"], train=False,
                        method="encode"), mesh1d),
        jax.device_put(inp["ray_o_all"][0][:n_rays], ray_sharding),
        jax.device_put(inp["ray_d_all"][0][:n_rays], ray_sharding),
        jax.device_put(inp["near_all"][0][:n_rays, 0], ray_sharding),
        jax.device_put(inp["far_all"][0][:n_rays, 0], ray_sharding),
        replicate_to_mesh(jax.random.PRNGKey(0), mesh1d),
    )
    rcompiled = render.lower(*rargs).compile()
    rcounts, rbytes, _ = collective_stats(rcompiled.as_text())
    rgb, disp, acc = rcompiled(*rargs)
    assert np.isfinite(np.asarray(rgb)).all()
    result["sharded_render"] = {
        "collectives": rcounts, "collective_bytes": rbytes,
    }
    assert not rcounts, (
        f"sharded render must be collective-free (host image fetch is the "
        f"only cross-chip traffic), found {rcounts}"
    )
    print(f"sharded render: ZERO collectives in compiled HLO "
          f"({n_rays} rays over {N_DEVICES} devices) — "
          f"only the host image fetch crosses the mesh", flush=True)

    out_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "artifacts", "mesh_scaling.json",
    )
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(result, f, indent=2)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
