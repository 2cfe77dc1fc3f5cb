"""Device-mesh parallelism: the DataParallel/DDP/NCCL replacement.

Reference mechanisms being replaced (SURVEY §2.2):
  * ``nn.DataParallel`` scatter (``run_nerf_batch.py:350``)
  * DDP over NCCL + SyncBatchNorm (``run_nerf_batch.py:26-28,344-348``)
  * chunked ray batching (``run_nerf_batch.py:85-97``)

TPU-native design: one ``jax.sharding.Mesh`` with a ``ray`` axis.  The ray
batch (the workload's "sequence" axis — N_rand rays x N_samples points)
shards across devices; parameters are replicated; gradients are combined
with ``lax.pmean`` over ICI inside ``shard_map``.  BatchNorm statistics
sync over the same axis (the SyncBatchNorm equivalent).  No communication
code appears in model logic.

Multi-host: the same mesh spans hosts via ``jax.distributed.initialize``;
per-host data sharding keys off ``jax.process_index()`` in the input
pipeline.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mpsnerf_tpu.models.mps_nerf import MPSNeRF
from mpsnerf_tpu.train.trainer import TrainConfig, make_train_step

RAY_AXIS = "ray"


def initialize_distributed(coordinator: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> None:
    """Multi-host bootstrap — the ``dist.init_process_group('nccl')``
    equivalent (ref run_nerf_batch.py:26-28).  After this, ``jax.devices()``
    spans all hosts and the same mesh/shard_map code scales across them;
    per-host data sharding keys off ``jax.process_index()``."""
    kwargs = {}
    if coordinator is not None:
        kwargs = dict(
            coordinator_address=coordinator,
            num_processes=num_processes,
            process_id=process_id,
        )
    jax.distributed.initialize(**kwargs)


def make_mesh(devices: Optional[Sequence] = None, axis: str = RAY_AXIS) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis,))


def replicate_to_mesh(tree, mesh: Mesh):
    """Place a pytree fully replicated on the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def shard_rays_to_mesh(tree, mesh: Mesh):
    """Shard leading (ray) dimension of every leaf across the mesh."""
    sharding = NamedSharding(mesh, P(RAY_AXIS))
    return jax.device_put(tree, sharding)


def make_sharded_train_step(model: MPSNeRF, cfg: TrainConfig, mesh: Mesh,
                            smooth: bool = False):
    """Jitted view-step with rays sharded over the mesh ``ray`` axis.

    The returned function has the same signature as the single-device step
    from :func:`make_train_step`; rays/targets must be shardable (leading
    dim divisible by mesh size).
    """
    step = make_train_step(model, cfg, smooth=smooth, axis_name=RAY_AXIS)

    rep = P()
    ray = P(RAY_AXIS)
    sharded = jax.shard_map(
        step,
        mesh=mesh,
        in_specs=(rep, rep, rep, rep, ray, ray, ray, ray, ray, ray, rep),
        out_specs=(rep, rep, rep),
        check_vma=False,
    )
    return jax.jit(sharded)


def make_sharded_render(model, mesh: Mesh, n_samples: int, chunk: int = 0,
                        white_bkgd: bool = False):
    """Pod-scale inference: rays shard over the mesh, each device renders
    its slice with zero cross-chip traffic (the "sequence parallelism" of
    this workload — SURVEY §5); only the final image gather crosses ICI.

    Returns a jitted ``fn(variables, smpl, sp, tp, latent, ro, rd, nr,
    fr, key) -> (rgb, disp, acc)`` with ray args sharded on ``ray``.
    ``chunk`` > 0 additionally lax.maps over per-device sub-chunks.
    """
    from mpsnerf_tpu.renderer.render import render_rays, render_rays_mapped

    def local_render(variables, smpl, sp, tp, latent, ro, rd, nr, fr, key):
        if chunk and ro.shape[0] > chunk:
            return render_rays_mapped(
                model, variables, smpl, sp, tp, latent, ro, rd, nr, fr,
                key, chunk=chunk, n_samples=n_samples, perturb=0.0,
                train=False, white_bkgd=white_bkgd,
            )
        out = render_rays(
            model, variables, smpl, sp, tp, latent, ro, rd, nr, fr, key,
            n_samples=n_samples, perturb=0.0, train=False,
            white_bkgd=white_bkgd,
        )
        return out.rgb_map, out.disp_map, out.acc_map

    rep = P()
    ray = P(RAY_AXIS)
    sharded = jax.shard_map(
        local_render,
        mesh=mesh,
        in_specs=(rep, rep, rep, rep, rep, ray, ray, ray, ray, rep),
        out_specs=(ray, ray, ray),
        check_vma=False,
    )
    return jax.jit(sharded)
