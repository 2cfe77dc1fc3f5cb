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
        # see trainer.py: true-MSE PSNR even when pair loss is zeroed
        psnr = mse2psnr(jnp.maximum(terms.img_raw, 1e-10))
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


class MeshTrainer:
    """Host-side loop driver for multi-device training — the CLI-facing
    DataParallel/DDP replacement (ref run_nerf_batch.py:344-350).

    Items batch over the mesh ``data`` axis, rays shard over ``ray``;
    parameters/optimizer state are replicated.  Mirrors
    :class:`mpsnerf_tpu.train.trainer.Trainer`'s cadence: one optimizer
    step per output view per item batch, two compiled variants for the
    smooth-loss interval.
    """

    def __init__(self, model, cfg, variables, mesh: Mesh,
                 start_step: int = 0):
        from mpsnerf_tpu.train.trainer import create_train_state

        self.model = model
        self.cfg = cfg
        self.mesh = mesh
        self.data_size = mesh.shape[DATA_AXIS]
        self.ray_size = mesh.shape[RAY_AXIS]
        self.state = replicate_to_mesh(
            create_train_state(model, variables, cfg, start_step), mesh
        )
        self._step_plain = make_batched_train_step(
            model, cfg, mesh, smooth=False
        )
        self._step_smooth = (
            make_batched_train_step(model, cfg, mesh, smooth=True)
            if cfg.smooth_loss
            else self._step_plain
        )
        self._rep = NamedSharding(mesh, P())
        self._data = NamedSharding(mesh, P(DATA_AXIS))
        self._data_ray = NamedSharding(mesh, P(DATA_AXIS, RAY_AXIS))

    @property
    def global_step(self) -> int:
        return int(self.state.step)

    def load_opt_state(self, opt_state) -> None:
        self.state = self.state.replace(
            opt_state=jax.device_put(opt_state, self._rep)
        )

    def _stack(self, trees):
        return jax.tree.map(lambda *xs: jnp.stack(xs, axis=0), *trees)

    def train_items(self, smpls, sps, tps, key) -> dict:
        """One step per view over a batch of ``data_size`` loader items.

        ``smpls``/``sps``/``tps``: length-``data_size`` lists (device
        pytrees, e.g. from ``to_device_input``).  Returns averaged scalars
        with the same keys as ``Trainer.train_item``.
        """
        assert len(sps) == self.data_size, (len(sps), self.data_size)
        n_views = int(np.asarray(tps[0]["rgb_all"].shape[0]))
        smpl_b = jax.device_put(
            self._stack([jax.tree.map(jnp.asarray, s) for s in smpls]),
            self._data,
        )
        sp_b = jax.device_put(self._stack(sps), self._data)
        same = all(t is s for t, s in zip(tps, sps))
        tp_b = sp_b if same else jax.device_put(self._stack(tps), self._data)

        logs = []
        for k in range(n_views):
            step = self.global_step
            smooth_now = (
                self.cfg.smooth_loss
                and step % self.cfg.smooth_interval == 0
            )
            fn = self._step_smooth if smooth_now else self._step_plain
            key, *subs = jax.random.split(key, self.data_size + 1)
            rays = [
                jax.device_put(
                    self._stack([t[name][k] for t in tps]), self._data_ray
                )
                for name in ("ray_o_all", "ray_d_all")
            ]
            nearfar = [
                jax.device_put(
                    self._stack([t[name][k][:, 0] for t in tps]),
                    self._data_ray,
                )
                for name in ("near_all", "far_all")
            ]
            tgt = [
                jax.device_put(
                    self._stack([t[name][k] for t in tps]), self._data_ray
                )
                for name in ("rgb_all", "bkgd_msk_all")
            ]
            keys = jax.device_put(jnp.stack(subs), self._data)
            self.state, terms, psnr = fn(
                self.state, smpl_b, sp_b, tp_b, *rays, *nearfar, *tgt, keys
            )
            logs.append((terms, psnr))
        from mpsnerf_tpu.train.trainer import summarize_item_logs

        return summarize_item_logs(logs, int(self.state.step))


def make_sharded_render(model, mesh: Mesh, n_samples: int, chunk: int = 0,
                        white_bkgd: bool = False, capacity: int = 0,
                        tile: int = 16384):
    """Pod-scale inference: rays shard over the mesh, each device renders
    its slice with zero cross-chip traffic (the "sequence parallelism" of
    this workload — SURVEY §5); only the final image gather crosses ICI.

    Returns a jitted ``fn(variables, smpl, sp, tp, latent, ro, rd, nr,
    fr, key) -> (rgb, disp, acc)`` with ray args sharded on ``ray``.
    ``chunk`` > 0 additionally lax.maps over per-device sub-chunks.

    ``capacity`` > 0 selects the global-compaction renderer
    (:func:`render_rays_compact`) on each device: the PER-DEVICE candidate
    buffer (a multiple of ``tile``); shard shuffled rays so per-device
    candidate counts concentrate at the mean.  The third output becomes
    the per-device max ``n_dropped`` (0 = every shard was exact).
    """
    from mpsnerf_tpu.renderer.render import (
        render_rays, render_rays_compact, render_rays_mapped,
    )

    def local_render(variables, smpl, sp, tp, latent, ro, rd, nr, fr, key):
        if capacity > 0:
            rgb, disp, acc, nd = render_rays_compact(
                model, variables, smpl, sp, tp, latent, ro, rd, nr, fr,
                key, n_samples=n_samples, capacity=capacity, tile=tile,
                perturb=0.0, train=False, white_bkgd=white_bkgd,
            )
            # nd: (1,) per device -> (n_devices,) global
            return rgb, disp, acc, nd.reshape(1)
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
        out_specs=(
            (ray, ray, ray, ray) if capacity > 0 else (ray, ray, ray)
        ),
        check_vma=False,
    )
    return jax.jit(sharded)
