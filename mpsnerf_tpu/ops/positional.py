"""NeRF frequency positional encoding.

Behavioral reference: ``/root/reference/lib/run_nerf_helpers.py:313-353``
(``PositionalEncoding``): frequencies ``pi * 2^k``, channel layout
``[x, sin(f0 x), cos(f0 x), sin(f1 x), cos(f1 x), ...]`` where each entry is
the full d_in-vector.  num_freqs=6 -> 39 channels for xyz; 4 -> 27 for
viewdirs/rgb.

Pure function — fuses into the surrounding MLP under jit, so no custom
kernel is needed here (the MXU matmuls dominate).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def pe_dim(num_freqs: int, d_in: int = 3, include_input: bool = True) -> int:
    return num_freqs * 2 * d_in + (d_in if include_input else 0)


def positional_encoding(
    x: jnp.ndarray,
    num_freqs: int,
    freq_factor: float = np.pi,
    include_input: bool = True,
) -> jnp.ndarray:
    """Encode (..., D) -> (..., pe_dim)."""
    freqs = freq_factor * (2.0 ** np.arange(num_freqs))  # (F,)
    # (..., F, D): x scaled by each frequency
    xb = x[..., None, :] * jnp.asarray(freqs, x.dtype)[:, None]
    # interleave [sin, cos] per frequency -> (..., F, 2, D)
    enc = jnp.stack([jnp.sin(xb), jnp.cos(xb)], axis=-2)
    enc = enc.reshape(x.shape[:-1] + (num_freqs * 2 * x.shape[-1],))
    if include_input:
        enc = jnp.concatenate([x, enc], axis=-1)
    return enc
