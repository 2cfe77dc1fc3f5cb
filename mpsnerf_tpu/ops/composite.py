"""Volume rendering: alpha compositing of per-sample (rgb, sigma).

Behavioral reference: ``/root/reference/run_nerf_batch.py:369-398``
(``raw2outputs``) with the shifted-softplus density and wide-sigmoid rgb
activations defined at ``lib/run_nerf_helpers.py:18-19``.

The transmittance is an exclusive ``cumprod`` (a single associative scan
XLA maps onto the VPU — NOT the exp(cumsum(log)) form, whose fused
gradient emits NaN when alpha saturates; see the in-function note);
everything fuses into one kernel under jit, so no hand-written Pallas is
needed for speed-of-light here.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


def shifted_softplus(x: jnp.ndarray) -> jnp.ndarray:
    """softplus(x - 1) — density activation (ref run_nerf_helpers.py:18)."""
    return jax.nn.softplus(x - 1.0)


def wide_sigmoid(x: jnp.ndarray) -> jnp.ndarray:
    """(1 + 2e-4) * sigmoid(x) - 1e-4 — rgb activation (ref :19)."""
    return (1.0 + 2.0 * 1e-4) * jax.nn.sigmoid(x) - 1e-4


class RenderOutputs(NamedTuple):
    rgb_map: jnp.ndarray    # (R, 3)
    disp_map: jnp.ndarray   # (R,)
    acc_map: jnp.ndarray    # (R,)
    weights: jnp.ndarray    # (R, S)
    depth_map: jnp.ndarray  # (R,)
    transmittance: jnp.ndarray  # (R, S)


def composite_rays(
    raw_rgb: jnp.ndarray,    # (R, S, 3) pre-activation rgb
    raw_sigma: jnp.ndarray,  # (R, S) pre-activation density
    z_vals: jnp.ndarray,     # (R, S)
    rays_d: jnp.ndarray,     # (R, 3)
    occupancy: bool = False,
    white_bkgd: bool = False,
) -> RenderOutputs:
    """Alpha-composite samples along each ray (``raw2outputs`` equivalent)."""
    rgb = wide_sigmoid(raw_rgb)

    if not occupancy:
        dists = z_vals[..., 1:] - z_vals[..., :-1]
        dists = jnp.concatenate(
            [dists, jnp.full_like(dists[..., :1], 1e10)], axis=-1
        )
        dists = dists * jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
        alpha = 1.0 - jnp.exp(-shifted_softplus(raw_sigma) * dists)
    else:
        alpha = wide_sigmoid(raw_sigma)

    # T_i = prod_{j<i} (1 - alpha_j + 1e-10), exclusive cumprod (an
    # associative scan on the VPU).  NOTE: the exp(cumsum(log)) form is
    # mathematically equivalent but XLA's fused gradient emits NaN when
    # alpha saturates to exactly 1 (jit-only; eager is fine) — keep cumprod.
    ones = jnp.ones_like(alpha[..., :1])
    trans = jnp.cumprod(
        jnp.concatenate([ones, 1.0 - alpha + 1e-10], axis=-1), axis=-1
    )[..., :-1]
    weights = alpha * trans

    rgb_map = jnp.sum(weights[..., None] * rgb, axis=-2)
    depth_map = jnp.sum(weights * z_vals, axis=-1)
    acc_map = jnp.sum(weights, axis=-1)
    disp_map = 1.0 / jnp.maximum(1e-10, depth_map / jnp.maximum(acc_map, 1e-10))

    if white_bkgd:
        rgb_map = rgb_map + (1.0 - acc_map[..., None])

    return RenderOutputs(rgb_map, disp_map, acc_map, weights, depth_map, trans)


def stratified_z_vals(
    key, near: jnp.ndarray, far: jnp.ndarray, n_samples: int, perturb: float
) -> jnp.ndarray:
    """Stratified depth samples per ray (ref run_nerf_batch.py:411-422).

    near/far: (R, 1).  Returns (R, S).  ``perturb > 0`` jitters each bin with
    keyed uniform noise (the reference used torch's global RNG).
    """
    t = jnp.linspace(0.0, 1.0, n_samples, dtype=near.dtype)
    z = near * (1.0 - t) + far * t  # (R, S)
    if perturb > 0.0:
        mids = 0.5 * (z[..., 1:] + z[..., :-1])
        upper = jnp.concatenate([mids, z[..., -1:]], axis=-1)
        lower = jnp.concatenate([z[..., :1], mids], axis=-1)
        u = jax.random.uniform(key, z.shape, dtype=z.dtype)
        z = lower + (upper - lower) * u
    return z


def sample_pdf(
    key, bins: jnp.ndarray, weights: jnp.ndarray, n_samples: int, det: bool = False
) -> jnp.ndarray:
    """Hierarchical inverse-CDF sampling (ref run_nerf_helpers.py:548-591).

    Consumed by ``renderer.render_rays(n_importance > 0)``; the shipped
    configs keep N_importance=0 (reference parity — its render_rays never
    calls this).  bins: (R, B), weights: (R, B-1) -> (R, n_samples).
    """
    weights = weights + 1e-5
    pdf = weights / jnp.sum(weights, axis=-1, keepdims=True)
    cdf = jnp.cumsum(pdf, axis=-1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], axis=-1)

    if det:
        u = jnp.linspace(0.0, 1.0, n_samples, dtype=cdf.dtype)
        u = jnp.broadcast_to(u, cdf.shape[:-1] + (n_samples,))
    else:
        u = jax.random.uniform(key, cdf.shape[:-1] + (n_samples,), dtype=cdf.dtype)

    inds = jax.vmap(lambda c, uu: jnp.searchsorted(c, uu, side="right"))(cdf, u)
    below = jnp.maximum(0, inds - 1)
    above = jnp.minimum(cdf.shape[-1] - 1, inds)

    cdf_lo = jnp.take_along_axis(cdf, below, axis=-1)
    cdf_hi = jnp.take_along_axis(cdf, above, axis=-1)
    bin_lo = jnp.take_along_axis(bins, below, axis=-1)
    bin_hi = jnp.take_along_axis(bins, above, axis=-1)

    denom = cdf_hi - cdf_lo
    denom = jnp.where(denom < 1e-5, 1.0, denom)
    t = (u - cdf_lo) / denom
    return bin_lo + t * (bin_hi - bin_lo)
