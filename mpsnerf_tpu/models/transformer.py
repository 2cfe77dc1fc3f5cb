"""Multi-view fusion transformer.

Behavioral reference: ``/root/reference/lib/transformer.py:13-86`` — depth-2,
4-head, dim_head-64 pre-norm transformer with residuals; the "sequence" is
the V input views of each query point.  With append_rgb the token dim is
128 + 27 = 155.

TPU-first: the attention over V<=12 tokens is tiny — the win is batching the
N points as the batch dimension so QKV projections are large (N*V, dim)
MXU matmuls.  einsum formulation; no flash attention needed at V<=12.
"""

from __future__ import annotations

import jax.numpy as jnp
import flax.linen as nn

from mpsnerf_tpu.models.layers import TorchLinear


class _Attention(nn.Module):
    dim: int
    heads: int = 4
    dim_head: int = 64

    @nn.compact
    def __call__(self, x):  # x: (N, V, D)
        inner = self.heads * self.dim_head
        qkv = TorchLinear(inner * 3, use_bias=False, name="to_qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads(t):  # (N, V, inner) -> (N, H, V, dh)
            n, s, _ = t.shape
            return t.reshape(n, s, self.heads, self.dim_head).transpose(0, 2, 1, 3)

        q, k, v = heads(q), heads(k), heads(v)
        attn = jnp.einsum("nhid,nhjd->nhij", q, k) * (self.dim_head ** -0.5)
        attn = nn.softmax(attn, axis=-1)
        out = jnp.einsum("nhij,nhjd->nhid", attn, v)
        n, h, s, d = out.shape
        out = out.transpose(0, 2, 1, 3).reshape(n, s, h * d)
        if not (self.heads == 1 and self.dim_head == self.dim):
            out = TorchLinear(self.dim, name="to_out")(out)
        return out


class _FeedForward(nn.Module):
    dim: int
    hidden_dim: int

    @nn.compact
    def __call__(self, x):
        x = TorchLinear(self.hidden_dim, name="fc1")(x)
        x = nn.gelu(x)
        return TorchLinear(self.dim, name="fc2")(x)


class ViewFusionTransformer(nn.Module):
    """PreNorm + residual transformer over the view axis.

    Input/output: (N, V, dim) — N query points, V views.
    """

    dim: int = 128
    depth: int = 2
    heads: int = 4
    dim_head: int = 64
    mlp_dim: int = 128

    @nn.compact
    def __call__(self, x):
        for i in range(self.depth):
            y = nn.LayerNorm(name=f"norm_attn_{i}")(x)
            x = x + _Attention(
                self.dim, self.heads, self.dim_head, name=f"attn_{i}"
            )(y)
            y = nn.LayerNorm(name=f"norm_ff_{i}")(x)
            x = x + _FeedForward(self.dim, self.mlp_dim, name=f"ff_{i}")(y)
        return x
