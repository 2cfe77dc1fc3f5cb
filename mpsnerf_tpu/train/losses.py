"""Loss assembly for the training step.

Behavioral reference: ``/root/reference/run_nerf_batch.py:549-557``
(image/acc/correction/consistency/density losses) and the smooth-loss block
at ``run_nerf_batch.py:60-79``.

Masked terms: the reference compacts points by ``pts_mask`` and takes plain
means; the static-shape equivalent is a mask-weighted mean over the full
array (identical value — masked entries are exact zeros in both operands).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from mpsnerf_tpu.ops.composite import shifted_softplus
from mpsnerf_tpu.models.mps_nerf import RawOutput


def img2mse(x: jnp.ndarray, y) -> jnp.ndarray:
    return jnp.mean((x - y) ** 2)


def mse2psnr(mse: jnp.ndarray) -> jnp.ndarray:
    return -10.0 * jnp.log(mse) / jnp.log(10.0)


def masked_mse(x: jnp.ndarray, y, mask: jnp.ndarray) -> jnp.ndarray:
    """Mean of (x-y)^2 over rows where mask==1 (rows have C channels)."""
    m = mask.reshape(mask.shape + (1,) * (x.ndim - mask.ndim))
    denom = jnp.maximum(jnp.sum(m) * (x.size / mask.size), 1.0)
    return jnp.sum(((x - y) ** 2) * m) / denom


class LossTerms(NamedTuple):
    total: jnp.ndarray
    img: jnp.ndarray
    # true image MSE regardless of pair-mode pose gating; the reference logs
    # this even when the gated loss is zero (run_nerf_batch.py:559-560), so
    # cross-pose items report their real PSNR instead of mse2psnr(0)
    img_raw: jnp.ndarray
    acc: jnp.ndarray
    correction: jnp.ndarray
    consistency: jnp.ndarray
    density: jnp.ndarray
    normal_smooth: jnp.ndarray
    smpl_normal: jnp.ndarray
    # in-body points lost to compaction-capacity overflow in this step's
    # forward(s) — float so the batched/pmean'd steps can average it; any
    # value > 0 means the gradient came from a silently truncated point
    # set (made loud by trainer.check_train_overflow)
    n_dropped: jnp.ndarray = 0.0


def compute_losses(
    rgb_map: jnp.ndarray,
    acc_map: jnp.ndarray,
    target_rgb: jnp.ndarray,
    bkgd_msk: jnp.ndarray,
    raw: RawOutput,
    raw_perturbed: RawOutput | None,
    *,
    use_acc_loss: bool = True,
    use_correction_loss: bool = False,
    use_consistency_loss: bool = False,
    use_density_loss: bool = False,
    pose_match: jnp.ndarray | None = None,
) -> LossTerms:
    zero = jnp.asarray(0.0, rgb_map.dtype)

    img_raw = img2mse(rgb_map, target_rgb)
    if pose_match is None:
        img = img_raw
    else:
        # pair training: supervise rgb only when source pose == target pose
        # (ref extended_img2mse, run_nerf_helpers.py:22-30)
        img = jnp.where(pose_match, img_raw, zero)

    acc = img2mse(bkgd_msk.reshape(acc_map.shape), acc_map) if use_acc_loss else zero

    mask = raw.pts_mask.astype(rgb_map.dtype)
    correction = (
        masked_mse(raw.correction, 0.0, mask) + masked_mse(raw.correction_, 0.0, mask)
        if use_correction_loss
        else zero
    )
    consistency = (
        masked_mse(raw.smpl_query_pts, raw.smpl_src_pts, mask)
        if use_consistency_loss
        else zero
    )
    if use_density_loss:
        # 0.005 * L1(exp(-softplus(sigma-1)), 1) over masked samples
        dens = jnp.exp(-shifted_softplus(raw.sigma))
        m = mask
        density = 0.005 * jnp.sum(jnp.abs(dens - 1.0) * m) / jnp.maximum(
            jnp.sum(m), 1.0
        )
    else:
        density = zero

    if raw_perturbed is not None:
        normal_smooth = img2mse(raw_perturbed.occ_normal, raw.occ_normal)
        smpl_normal = img2mse(raw.nearest_smpl_normal, -raw.occ_normal)
        other = 0.1 * normal_smooth + 0.1 * smpl_normal
    else:
        normal_smooth = zero
        smpl_normal = zero
        other = zero

    n_dropped = raw.n_dropped.astype(jnp.float32)
    if raw_perturbed is not None:
        n_dropped = n_dropped + raw_perturbed.n_dropped.astype(jnp.float32)

    total = img + correction + acc + consistency + density + other
    return LossTerms(
        total=total,
        img=img,
        img_raw=img_raw,
        acc=acc,
        correction=correction,
        consistency=consistency,
        density=density,
        normal_smooth=normal_smooth,
        smpl_normal=smpl_normal,
        n_dropped=n_dropped,
    )
