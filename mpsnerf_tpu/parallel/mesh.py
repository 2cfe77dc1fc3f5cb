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
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mpsnerf_tpu.models.mps_nerf import MPSNeRF
from mpsnerf_tpu.train.trainer import TrainConfig, make_train_step

RAY_AXIS = "ray"
DATA_AXIS = "data"


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


def make_2d_mesh(data: int, ray: int,
                 devices: Optional[Sequence] = None) -> Mesh:
    """(data, ray) mesh: subjects batch over ``data`` (the DataParallel
    axis — each device group gets whole items, ref run_nerf_batch.py:350),
    rays shard over ``ray`` within each item."""
    devices = devices if devices is not None else jax.devices()
    assert len(devices) >= data * ray, (len(devices), data, ray)
    arr = np.asarray(devices[: data * ray]).reshape(data, ray)
    return Mesh(arr, (DATA_AXIS, RAY_AXIS))


def make_batched_train_step(model, cfg, mesh: Mesh, smooth: bool = False):
    """Item-batched view-step over a 2D (data, ray) mesh.

    Inputs carry a leading item-batch dim (stacked smpl pytrees, sp/tp
    dicts, per-item rays) sharded on ``data``; rays additionally shard on
    ``ray``.  One gradient of the item-mean loss, pmean'd over both axes —
    the DataParallel/DDP-over-NCCL replacement at full generality
    (SURVEY §7 step 9: mesh (data, ray)).
    """
    from mpsnerf_tpu.train.trainer import (
        adam_apply, make_loss_fn, make_optimizer,
    )
    from mpsnerf_tpu.train.losses import mse2psnr

    loss_one = make_loss_fn(model, cfg, smooth)
    tx = make_optimizer(cfg)

    def batched(state, smpl, sp, tp, ro, rd, nr, fr, tgt, bm, key):
        def total_loss(params):
            def item(args):
                return loss_one(params, state.batch_stats, *args)

            totals, (terms, new_bs, _) = jax.lax.map(
                item, (smpl, sp, tp, ro, rd, nr, fr, tgt, bm, key)
            )
            aux = (
                jax.tree.map(lambda x: jnp.mean(x, axis=0), terms),
                jax.tree.map(lambda x: jnp.mean(x, axis=0), new_bs),
            )
            return jnp.mean(totals), aux

        grads, (terms, new_bs) = jax.grad(total_loss, has_aux=True)(
            state.params
        )
        grads = jax.lax.pmean(jax.lax.pmean(grads, DATA_AXIS), RAY_AXIS)
        terms = jax.tree.map(
            lambda x: jax.lax.pmean(
                jax.lax.pmean(x, DATA_AXIS), RAY_AXIS
            ),
            terms,
        )
        new_bs = jax.tree.map(
            lambda x: jax.lax.pmean(
                jax.lax.pmean(x, DATA_AXIS), RAY_AXIS
            ),
            new_bs,
        )

        new_params, new_opt = adam_apply(tx, cfg, state, grads)
        psnr = mse2psnr(jnp.maximum(terms.img, 1e-10))
        new_state = state.replace(
            step=state.step + 1, params=new_params,
            batch_stats=new_bs, opt_state=new_opt,
        )
        return new_state, terms, psnr

    rep = P()
    data = P(DATA_AXIS)
    data_ray = P(DATA_AXIS, RAY_AXIS)
    sharded = jax.shard_map(
        batched,
        mesh=mesh,
        in_specs=(rep, data, data, data, data_ray, data_ray, data_ray,
                  data_ray, data_ray, data_ray, data),
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
