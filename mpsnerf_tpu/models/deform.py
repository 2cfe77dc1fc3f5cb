"""Deformation fields: correction MLP and skinning-weight field.

Behavioral reference: ``/root/reference/lib/skinnning_batch.py:77-106``
(``DeformField``): D-layer 256-wide relu MLP with a skip at layer 4; the
correction variant zero-inits its output layer (so training starts from the
pure LBS warp), the weights variant applies a 24-way softmax.
"""

from __future__ import annotations

import jax.numpy as jnp
import flax.linen as nn

from mpsnerf_tpu.models.layers import TorchLinear


class DeformField(nn.Module):
    depth: int = 8
    width: int = 256
    out_ch: int = 3
    skips: tuple = (4,)
    deform_type: str = "weights"  # "weights" | "correction"

    @nn.compact
    def __call__(self, x):
        h = x
        for i in range(self.depth):
            h = TorchLinear(self.width, name=f"fc{i}")(h)
            h = nn.relu(h)
            if i in self.skips:
                h = jnp.concatenate([x, h], axis=-1)
        out = TorchLinear(
            self.out_ch,
            zero_init=(self.deform_type == "correction"),
            name="out",
        )(h)
        if self.deform_type == "weights":
            out = nn.softmax(out, axis=-1)
        return out
