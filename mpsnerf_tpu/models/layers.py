"""Shared layer primitives with PyTorch-compatible initialization.

The reference trains from torch defaults (kaiming-uniform weights, uniform
fan-in bias); reproducing the init distribution keeps optimization behavior
comparable.  All matmuls take bf16-friendly shapes and run on the MXU.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
import flax.linen as nn
from jax.nn.initializers import uniform as _uniform


def torch_linear_init(scale_by_fan_in: bool = True):
    """U(-1/sqrt(fan_in), 1/sqrt(fan_in)) — torch nn.Linear default."""

    def init(key, shape, dtype=jnp.float32):
        fan_in = shape[0] if len(shape) == 2 else int(np.prod(shape[:-1]))
        bound = 1.0 / np.sqrt(fan_in) if scale_by_fan_in else 0.0
        return _uniform(2.0 * bound)(key, shape, dtype) - bound

    return init


class TorchLinear(nn.Module):
    """nn.Dense with torch's default init (and a fan-in-correct bias).

    ``dtype`` is the COMPUTE dtype (params stay float32): with
    ``jnp.bfloat16`` the matmul runs at the MXU's bf16 rate — inputs and
    the kernel are cast on the fly, exactly flax's mixed-precision
    convention.  ``None`` computes in the input dtype (fp32 paths stay
    bit-identical to the pre-dtype revision).
    """

    features: int
    use_bias: bool = True
    zero_init: bool = False
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        fan_in = x.shape[-1]
        if self.zero_init:
            kernel_init = nn.initializers.zeros
            bias_init = nn.initializers.zeros
        else:
            kernel_init = torch_linear_init()
            bound = 1.0 / np.sqrt(fan_in)

            def bias_init(key, shape, dtype=jnp.float32):
                return _uniform(2.0 * bound)(key, shape, dtype) - bound

        return nn.Dense(
            self.features,
            use_bias=self.use_bias,
            kernel_init=kernel_init,
            bias_init=bias_init,
            dtype=self.dtype,
            param_dtype=jnp.float32,
        )(x)
