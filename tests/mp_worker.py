"""Worker process for tests/test_multiprocess.py — NOT a pytest module.

Runs one batched train step on a (data=2, ray=4) mesh whose DATA axis
spans TWO OS processes (4 virtual CPU devices each), i.e. the gradient
pmean crosses the process boundary — the simulated-DCN equivalent of the
reference's DDP-over-NCCL (run_nerf_batch.py:26-28,344-348).  Asserts
the cross-process loss equals the same batch on one local device and
prints ``MP_OK <loss>`` for the parent test to collect.

Usage: python tests/mp_worker.py <process_id> <coordinator_port>
"""

import os
import sys

# `python tests/mp_worker.py` puts tests/ (not the repo root) on sys.path
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PID = int(sys.argv[1])
PORT = sys.argv[2]

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=4"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(
    coordinator_address=f"localhost:{PORT}", num_processes=2,
    process_id=PID, local_device_ids=[0, 1, 2, 3],
)

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P  # noqa: E402

from mpsnerf_tpu.data.synthetic import SyntheticHumanDataset  # noqa: E402
from mpsnerf_tpu.models.mps_nerf import MPSNeRF  # noqa: E402
from mpsnerf_tpu.parallel.mesh import (  # noqa: E402
    DATA_AXIS, RAY_AXIS, make_batched_train_step,
)
from mpsnerf_tpu.train.trainer import (  # noqa: E402
    TrainConfig, create_train_state, make_train_step, to_device_input,
)

assert len(jax.devices()) == 8, jax.devices()
assert jax.process_count() == 2
mesh = Mesh(np.array(jax.devices()).reshape(2, 4), (DATA_AXIS, RAY_AXIS))
# the data axis must actually span the two processes
row_procs = {d.process_index for d in mesh.devices[0]}
assert len({mesh.devices[0][0].process_index,
            mesh.devices[1][0].process_index}) == 2, mesh.devices

# deterministic scene — both processes build identical host data
N_RAYS = 32
ds = SyntheticHumanDataset(
    n_poses=1, n_cameras=4, image_size=32, n_rays=N_RAYS, n_verts=400,
    num_instances=1, seed=0,
)
item = ds.get_item(0, instance_idx=0)
smpl = ds.smpl_for(0)
inp = to_device_input(item)

model = MPSNeRF(num_instances=1)
variables = model.init(
    {"params": jax.random.PRNGKey(0)}, smpl, inp, inp,
    jnp.zeros((8, 3)), jnp.zeros((8, 3)), train=False,
)
cfg = TrainConfig(n_samples=8, perturb=0.0, smooth_loss=False)
state = create_train_state(model, variables, cfg)


def to_global(tree, spec):
    """Host-replicated pytree -> global arrays on the 2-process mesh.
    The callback is invoked per ADDRESSABLE shard, so each process
    supplies its own slice of the (identical) host data."""
    sh_cache = {}

    def conv(x):
        x = np.asarray(x)
        sh = sh_cache.setdefault(spec, NamedSharding(mesh, spec))
        return jax.make_array_from_callback(x.shape, sh, lambda idx: x[idx])

    return jax.tree.map(conv, tree)


def stack2(tree):
    return jax.tree.map(lambda x: jnp.stack([x, x], axis=0), tree)


k = 0
rays = (
    item["ray_o_all"][k], item["ray_d_all"][k],
    item["near_all"][k][:, 0], item["far_all"][k][:, 0],
    item["rgb_all"][k], item["bkgd_msk_all"][k],
)
host_smpl = jax.device_get(jax.tree.map(jnp.asarray, smpl))
host_inp = jax.device_get(inp)

smpl_b = to_global(stack2(host_smpl), P(DATA_AXIS))
inp_b = to_global(stack2(host_inp), P(DATA_AXIS))
rays_b = [
    to_global(np.stack([r, r], axis=0), P(DATA_AXIS, RAY_AXIS))
    for r in rays
]
keys_b = to_global(
    np.stack([np.asarray(jax.random.PRNGKey(7))] * 2, axis=0),
    P(DATA_AXIS),
)
state_g = to_global(jax.device_get(state), P())

step_fn = make_batched_train_step(model, cfg, mesh, smooth=False)
new_state, terms, psnr = step_fn(
    state_g, smpl_b, inp_b, inp_b, *rays_b, keys_b
)
loss_mp = float(np.asarray(terms.total.addressable_data(0)))

# single-LOCAL-device oracle on the identical batch
single_fn = jax.jit(make_train_step(model, cfg, smooth=False))
_, terms_s, _ = single_fn(
    state, smpl, inp, inp, *[jnp.asarray(r) for r in rays],
    jax.random.PRNGKey(7),
)
loss_one = float(terms_s.total)

assert np.isfinite(loss_mp), loss_mp
np.testing.assert_allclose(
    loss_mp, loss_one, atol=1e-5, rtol=1e-5,
    err_msg="cross-process loss != single-device loss on the same batch",
)
print(f"MP_OK {loss_mp:.6f}", flush=True)
