"""Training: jitted per-view optimization step + host-side epoch loop.

Behavioral reference: ``train`` at ``/root/reference/run_nerf_batch.py:447-650``:
one optimizer step per output view per loader item (``skip_step`` view-steps
increment ``global_step``), Adam(lr=5e-4, betas=(0.9, 0.999)), exponential
LR decay ``lr * 0.5^(step/decay_steps)``, checkpoint every ``i_weights``,
eval every ``i_testset``.

TPU-first restructuring:
  * the whole view-step (encode -> sample -> double forward (smooth) ->
    composite -> losses -> grads -> Adam update) is ONE jitted function;
    two compiled variants (with / without the smooth double-backprop term)
    are selected by the host step counter, mirroring the reference's
    ``intv_flag`` (run_nerf_batch.py:61) without retracing.
  * randomness is keyed (no global RNG).
  * the optimizer never leaves the device; the host loop only feeds data.

Known deviation (documented): the reference recomputes the LR once per
loader item from the pre-increment global step; here the LR is computed
from ``state.step`` per optimizer step (see :func:`lr_at_step` — this also
makes checkpoint resume continue at the decayed LR).  Relative LR
difference within an item is < 0.5^(V/decay): ~0.06% at shipped configs.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from mpsnerf_tpu.models.mps_nerf import MPSNeRF, RawOutput
from mpsnerf_tpu.ops.composite import composite_rays, stratified_z_vals
from mpsnerf_tpu.smpl.model import SMPLModel
from mpsnerf_tpu.train.losses import LossTerms, compute_losses, mse2psnr


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    lrate: float = 5e-4
    decay_steps: int = 30000
    n_samples: int = 128
    # hierarchical pass (NeRF §5.2): extra importance samples from the
    # coarse weights.  0 = reference parity (it accepts --N_importance
    # but never consumes it, run_nerf_batch.py:401-444)
    n_importance: int = 0
    perturb: float = 1.0
    occupancy: bool = False
    white_bkgd: bool = False
    acc_loss: bool = True
    correction_loss: bool = False
    consistency_loss: bool = False
    density_loss: bool = False
    smooth_loss: bool = True
    smooth_interval: int = 4
    pair_mode: bool = False  # H36M_P/THuman_P extended img loss


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any

    @property
    def variables(self):
        return {"params": self.params, "batch_stats": self.batch_stats}


def lr_schedule(lrate: float, decay_steps: int):
    return lambda count: lrate * (0.5 ** (count / decay_steps))


def lr_at_step(cfg: TrainConfig, step) -> jnp.ndarray:
    """The reference LR rule ``lrate * 0.5^(step/decay_steps)``
    (run_nerf_batch.py:578), driven by the train state's own step counter —
    a restored checkpoint therefore resumes at the decayed LR (the Adam
    moments still restart fresh, matching the reference's resume)."""
    return cfg.lrate * 0.5 ** (
        jnp.asarray(step, jnp.float32) / cfg.decay_steps
    )


def make_optimizer(cfg: TrainConfig):
    # moments only; the LR is applied separately from ``state.step`` via
    # :func:`lr_at_step` so the decay survives checkpoint resume (optax's
    # internal schedule count would restart at 0 on ``tx.init``)
    return optax.scale_by_adam(b1=0.9, b2=0.999)


def adam_apply(tx, cfg: TrainConfig, state: "TrainState", grads):
    """One Adam update at the LR for ``state.step``; returns
    ``(new_params, new_opt_state)``."""
    updates, new_opt = tx.update(grads, state.opt_state, state.params)
    neg_lr = -lr_at_step(cfg, state.step)
    updates = jax.tree.map(lambda u: neg_lr * u, updates)
    return optax.apply_updates(state.params, updates), new_opt


def create_train_state(
    model: MPSNeRF, variables: Dict, cfg: TrainConfig, step: int = 0
) -> TrainState:
    tx = make_optimizer(cfg)
    # deep-copy the leaves: the train step donates the state's buffers, so
    # the state must own them (the caller's ``variables`` stay live)
    params = jax.tree.map(
        lambda x: jnp.array(x, copy=True), variables["params"]
    )
    return TrainState(
        step=jnp.asarray(step, jnp.int32),
        params=params,
        batch_stats=jax.tree.map(
            lambda x: jnp.array(x, copy=True),
            variables.get("batch_stats", {}),
        ),
        opt_state=tx.init(params),
    )


def make_train_step(
    model: MPSNeRF,
    cfg: TrainConfig,
    smooth: bool,
    axis_name: Optional[str] = None,
) -> Callable:
    """Build the jitted view-step.

    Args (of the returned fn):
      state, smpl, sp_input, tp_input,
      rays_o/rays_d (R,3), near/far (R,), target_rgb (R,3), bkgd_msk (R,1),
      key.
    Returns ``(new_state, LossTerms, psnr)``.

    When ``axis_name`` is set the function is meant to run inside
    ``shard_map`` with rays sharded on that axis: gradients and losses are
    ``pmean``-ed (the DDP/NCCL-allreduce equivalent over ICI).
    """
    tx = make_optimizer(cfg)
    loss_builder = make_loss_fn(model, cfg, smooth)

    def step_fn(state: TrainState, smpl: SMPLModel, sp_input, tp_input,
                rays_o, rays_d, near, far, target_rgb, bkgd_msk, key):
        def loss_fn(params):
            return loss_builder(
                params, state.batch_stats, smpl, sp_input, tp_input,
                rays_o, rays_d, near, far, target_rgb, bkgd_msk, key,
            )

        grads, (terms, new_bs, rgb_map) = jax.grad(
            loss_fn, has_aux=True
        )(state.params)

        if axis_name is not None:
            grads = jax.lax.pmean(grads, axis_name)
            terms = jax.tree.map(
                lambda x: jax.lax.pmean(x, axis_name), terms
            )
            new_bs = jax.tree.map(
                lambda x: jax.lax.pmean(x, axis_name), new_bs
            )

        new_params, new_opt = adam_apply(tx, cfg, state, grads)
        # pair mode zeroes terms.img on cross-pose items; log the true MSE's
        # PSNR like the reference (run_nerf_batch.py:559-560)
        psnr = mse2psnr(jnp.maximum(terms.img_raw, 1e-10))
        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_bs,
            opt_state=new_opt,
        )
        return new_state, terms, psnr

    return step_fn


def make_loss_fn(model: MPSNeRF, cfg: TrainConfig, smooth: bool):
    """The view-step loss as a pure function — shared by the single-item
    and item-batched (DataParallel) steps.

    Signature: ``(params, batch_stats, smpl, sp, tp, rays_o, rays_d, near,
    far, target_rgb, bkgd_msk, key) -> (total, (terms, new_bs, rgb_map))``.
    """

    def loss_fn(params, batch_stats, smpl, sp_input, tp_input,
                rays_o, rays_d, near, far, target_rgb, bkgd_msk, key):
        key_z, key_delta, key_imp = jax.random.split(key, 3)
        variables = {"params": params, "batch_stats": batch_stats}
        latent, mutated = model.apply(
            variables, sp_input["img_all"], train=True,
            mutable=["batch_stats"], method="encode",
        )
        # the 3D encoder (correction field) carries BatchNorm too —
        # thread its running-stat updates through the query calls
        bs = {"stats": mutated["batch_stats"]}

        r = rays_o.shape[0]
        z_vals = stratified_z_vals(
            key_z, near[:, None], far[:, None], cfg.n_samples, cfg.perturb
        )
        viewdirs = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)

        def query(p, normals):
            vd = jnp.broadcast_to(
                viewdirs[:, None, :], (r, p.shape[0] // r, 3)
            ).reshape(-1, 3)
            out, mut = model.apply(
                {"params": params, "batch_stats": bs["stats"]},
                smpl, sp_input, tp_input, latent, p, vd,
                train=True, compute_normals=normals,
                method="query", mutable=["batch_stats"],
            )
            bs["stats"] = mut["batch_stats"]
            return out

        n_s = cfg.n_samples
        if cfg.n_importance > 0:
            # hierarchical pass under grad: coarse weights place the
            # importance samples; the loss renders the sorted union
            from mpsnerf_tpu.ops.composite import sample_pdf

            pts_c = (rays_o[:, None, :]
                     + rays_d[:, None, :] * z_vals[..., None])
            coarse_raw: RawOutput = query(pts_c.reshape(-1, 3), False)
            coarse = composite_rays(
                coarse_raw.rgb.reshape(r, n_s, 3),
                coarse_raw.sigma.reshape(r, n_s),
                z_vals, rays_d,
                occupancy=cfg.occupancy, white_bkgd=cfg.white_bkgd,
            )
            mids = 0.5 * (z_vals[..., 1:] + z_vals[..., :-1])
            z_fine = sample_pdf(
                key_imp, mids, coarse.weights[..., 1:-1],
                cfg.n_importance, det=(cfg.perturb == 0.0),
            )
            z_vals = jnp.sort(jnp.concatenate(
                [z_vals, jax.lax.stop_gradient(z_fine)], -1), -1)
            n_s = n_s + cfg.n_importance

        pts = rays_o[:, None, :] + rays_d[:, None, :] * z_vals[..., None]
        pts_flat = pts.reshape(-1, 3)

        raw: RawOutput = query(pts_flat, smooth)
        if cfg.n_importance > 0:
            # a truncated coarse pass corrupts fine sample placement —
            # surface its overflow alongside the fine query's
            raw = raw._replace(
                n_dropped=raw.n_dropped + coarse_raw.n_dropped
            )
        raw_perturbed = None
        if smooth:
            # ref run_nerf_batch.py:64-67: Normal(0, 0.01) world jitter
            delta = 0.01 * jax.random.normal(
                key_delta, pts_flat.shape, pts_flat.dtype
            )
            raw_perturbed = query(pts_flat + delta, smooth)

        out = composite_rays(
            raw.rgb.reshape(r, n_s, 3),
            raw.sigma.reshape(r, n_s),
            z_vals,
            rays_d,
            occupancy=cfg.occupancy,
            white_bkgd=cfg.white_bkgd,
        )

        pose_match = None
        if cfg.pair_mode:
            pose_match = (
                sp_input["pose_index"].reshape(())
                == tp_input["pose_index"].reshape(())
            )
        terms = compute_losses(
            out.rgb_map, out.acc_map, target_rgb, bkgd_msk,
            raw, raw_perturbed,
            use_acc_loss=cfg.acc_loss,
            use_correction_loss=cfg.correction_loss,
            use_consistency_loss=cfg.consistency_loss,
            use_density_loss=cfg.density_loss,
            pose_match=pose_match,
        )
        return terms.total, (terms, bs["stats"], out.rgb_map)

    return loss_fn


def to_device_input(item: Dict) -> Dict:
    """Host dict -> jnp pytree (nested params dict included)."""
    out = {}
    for k, v in item.items():
        if isinstance(v, dict):
            out[k] = {kk: jnp.asarray(vv) for kk, vv in v.items()}
        elif isinstance(v, tuple):  # NamedTuple (e.g. SparseConvPlan)
            out[k] = jax.tree.map(jnp.asarray, v)
        else:
            out[k] = jnp.asarray(v)
    return out


def check_train_overflow(n_dropped: float, step: int) -> None:
    """Make compaction overflow in a train step LOUD.

    The compacted forward silently truncates in-body points past the
    ``compact_fraction`` capacity (RawOutput.n_dropped counts them) —
    gradients from such a step come from an incomplete point set, which
    the reference never does (every in-body point contributes,
    lib/skinnning_batch.py:354-368).  Policy via
    ``MPSNERF_TRAIN_OVERFLOW``: ``warn`` (default) prints once per
    offending item; ``raise`` aborts the run; ``ignore`` disables.
    """
    if n_dropped <= 0:
        return
    import os
    import sys

    policy = os.environ.get("MPSNERF_TRAIN_OVERFLOW", "warn")
    # g-format, not int(): a mesh trainer reports the pmean over shards,
    # so one shard's 7 dropped points arrive here as 0.875
    msg = (
        f"[TRAIN] step {step}: compaction overflow — {float(n_dropped):g} "
        f"in-body points dropped (mesh runs report the cross-shard mean); "
        f"gradients are truncated. Raise the "
        f"model's compact_fraction (or set MPSNERF_TRAIN_OVERFLOW=raise "
        f"to abort / =ignore to silence)."
    )
    if policy == "raise":
        raise RuntimeError(msg)
    if policy != "ignore":
        print(msg, file=sys.stderr)


def summarize_item_logs(logs, step: int) -> Dict:
    """Average one item's per-view ``(terms, psnr)`` pairs into the
    [TRAIN]-line dict and run the overflow check.  Shared by
    :class:`Trainer` and ``parallel.mesh.MeshTrainer`` so a new
    ``LossTerms`` field can't be logged by one and dropped by the other.
    ``n_dropped`` is the max over views: on a mesh the terms are already
    pmean'd, so the value is the cross-shard MEAN drop count — any
    value > 0 still means some shard's gradient was truncated."""
    mean = lambda xs: float(np.mean([float(x) for x in xs]))
    out = {
        "loss": mean([t.total for t, _ in logs]),
        "img_loss": mean([t.img_raw for t, _ in logs]),
        "acc_loss": mean([t.acc for t, _ in logs]),
        "psnr": mean([p for _, p in logs]),
        "normal_smooth_loss": mean([t.normal_smooth for t, _ in logs]),
        "smpl_normal_loss": mean([t.smpl_normal for t, _ in logs]),
        "n_dropped": max(float(t.n_dropped) for t, _ in logs),
    }
    check_train_overflow(out["n_dropped"], step)
    return out


class Trainer:
    """Host-side loop driving the jitted view-steps.

    Mirrors the reference's cadence: per loader item, one optimizer step per
    output view; ``global_step`` counts view-steps.
    """

    def __init__(self, model: MPSNeRF, cfg: TrainConfig, variables,
                 start_step: int = 0):
        self.model = model
        self.cfg = cfg
        self.state = create_train_state(model, variables, cfg, start_step)
        # donate the state: its buffers (params, Adam moments) are consumed
        # by each step, halving the train-state HBM footprint
        self._step_plain = jax.jit(
            make_train_step(model, cfg, smooth=False), donate_argnums=(0,)
        )
        self._step_smooth = (
            jax.jit(
                make_train_step(model, cfg, smooth=True), donate_argnums=(0,)
            )
            if cfg.smooth_loss
            else self._step_plain
        )

    @property
    def global_step(self) -> int:
        return int(self.state.step)

    def load_opt_state(self, opt_state) -> None:
        self.state = self.state.replace(opt_state=opt_state)

    def train_item(self, smpl: SMPLModel, sp_input, tp_input, key) -> Dict:
        """One loader item: V view-steps.  Returns averaged scalars."""
        n_views = int(np.asarray(tp_input["rgb_all"].shape[0]))
        logs = []
        for k in range(n_views):
            step = self.global_step
            smooth_now = (
                self.cfg.smooth_loss
                and step % self.cfg.smooth_interval == 0
            )
            fn = self._step_smooth if smooth_now else self._step_plain
            key, sub = jax.random.split(key)
            self.state, terms, psnr = fn(
                self.state, smpl, sp_input, tp_input,
                tp_input["ray_o_all"][k], tp_input["ray_d_all"][k],
                tp_input["near_all"][k][:, 0], tp_input["far_all"][k][:, 0],
                tp_input["rgb_all"][k], tp_input["bkgd_msk_all"][k],
                sub,
            )
            logs.append((terms, psnr))
        return summarize_item_logs(logs, self.global_step)
