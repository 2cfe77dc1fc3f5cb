"""Classic NeRF MLP + the legacy log-sampled embedder.

Behavioral reference: ``NeRF``/``DenseLayer`` at
``lib/run_nerf_helpers.py:356-500`` and ``Embedder``/``get_embedder``
(:367-415).  Present in the reference but unused by the trained configs
(N_importance = 0); kept for API parity and as a plain-NeRF baseline.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np
import flax.linen as nn

from mpsnerf_tpu.models.layers import TorchLinear


def get_embedder(multires: int, i: int = 0):
    """Legacy log-sampled positional embedding: freqs 2^0..2^(m-1)
    (no pi factor — unlike ops.positional_encoding), channel layout
    [x, sin(f0 x), cos(f0 x), ...].  Returns ``(fn, out_dim)``."""
    if i == -1:
        return (lambda x: x), 3

    freqs = 2.0 ** np.linspace(0.0, multires - 1, multires)

    def embed(x):
        outs = [x]
        for f in freqs:
            outs.append(jnp.sin(x * f))
            outs.append(jnp.cos(x * f))
        return jnp.concatenate(outs, axis=-1)

    return embed, 3 * (2 * multires + 1)


class VanillaNeRF(nn.Module):
    """8x256 NeRF with a skip at layer 4 and the official view branch."""

    depth: int = 8
    width: int = 256
    input_ch: int = 3
    input_ch_views: int = 3
    output_ch: int = 4
    skips: Tuple[int, ...] = (4,)
    use_viewdirs: bool = False

    @nn.compact
    def __call__(self, x):
        pts = x[..., : self.input_ch]
        views = x[..., self.input_ch : self.input_ch + self.input_ch_views]

        h = pts
        for i in range(self.depth):
            h = nn.relu(TorchLinear(self.width, name=f"pts_linear_{i}")(h))
            if i in self.skips:
                h = jnp.concatenate([pts, h], axis=-1)

        if self.use_viewdirs:
            alpha = TorchLinear(1, name="alpha_linear")(h)
            feature = TorchLinear(self.width, name="feature_linear")(h)
            h = jnp.concatenate([feature, views], axis=-1)
            h = nn.relu(TorchLinear(self.width // 2, name="views_linear")(h))
            rgb = TorchLinear(3, name="rgb_linear")(h)
            return jnp.concatenate([rgb, alpha], axis=-1)
        return TorchLinear(self.output_ch, name="output_linear")(h)
