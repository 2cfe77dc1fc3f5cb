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
    """Attention over the (tiny, static) view axis.

    Input layout is (V, N, D) — V <= 12 views, N ~1e5 points.  The naive
    (N, V, D) einsum formulation relayouts the huge N axis around the tiny
    V axis and runs ~15x off speed-of-light on TPU (measured); here V is
    unrolled so every array stays (N, lanes)-shaped: the V*V attention
    logits are plain reductions and the value mix is V weighted adds.
    """

    dim: int
    heads: int = 4
    dim_head: int = 64
    dtype: object = None  # compute dtype (params stay fp32)

    @nn.compact
    def __call__(self, x, out_views=None):  # x: (V, N, D)
        v_views, n, _ = x.shape
        out_v = out_views or v_views
        inner = self.heads * self.dim_head
        qkv = TorchLinear(
            inner * 3, use_bias=False, dtype=self.dtype, name="to_qkv"
        )(x)
        scale = self.dim_head ** -0.5

        # per-view slices, kept (N, inner)
        qs = [qkv[i, :, 0 * inner : 1 * inner] for i in range(v_views)]
        ks = [qkv[i, :, 1 * inner : 2 * inner] for i in range(v_views)]
        vs = [qkv[i, :, 2 * inner : 3 * inner] for i in range(v_views)]

        def head(t, h):
            return t[:, h * self.dim_head : (h + 1) * self.dim_head]

        # queries only for the first out_v views (keys/values still mix
        # every view): callers that read only views [:out_v] of the
        # output skip the unread rows' attention mix + out-projection
        outs = []
        for i in range(out_v):
            head_outs = []
            for h in range(self.heads):
                qi = head(qs[i], h)
                logits = [
                    jnp.sum(qi * head(ks[j], h), axis=-1) * scale
                    for j in range(v_views)
                ]  # V x (N,)
                m = logits[0]
                for l in logits[1:]:
                    m = jnp.maximum(m, l)
                exps = [jnp.exp(l - m) for l in logits]
                denom = sum(exps)
                mix = sum(
                    (e / denom)[:, None] * head(vs[j], h)
                    for j, e in enumerate(exps)
                )  # (N, dh)
                head_outs.append(mix)
            outs.append(jnp.concatenate(head_outs, axis=-1))  # (N, inner)
        out = jnp.stack(outs, axis=0)  # (V, N, inner)
        if not (self.heads == 1 and self.dim_head == self.dim):
            out = TorchLinear(self.dim, dtype=self.dtype, name="to_out")(out)
        return out


class _FeedForward(nn.Module):
    dim: int
    hidden_dim: int
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        x = TorchLinear(self.hidden_dim, dtype=self.dtype, name="fc1")(x)
        # exact (erf) GELU — torch nn.GELU default; flax defaults to the
        # tanh approximation, which differs by up to ~1e-3
        x = nn.gelu(x, approximate=False)
        return TorchLinear(self.dim, dtype=self.dtype, name="fc2")(x)


class ViewFusionTransformer(nn.Module):
    """PreNorm + residual transformer over the view axis.

    Input/output: (V, N, dim) — V views (the "sequence"), N query points
    (the batch).  View-major layout keeps the huge N axis contiguous.
    """

    dim: int = 128
    depth: int = 2
    heads: int = 4
    dim_head: int = 64
    mlp_dim: int = 128
    dtype: object = None  # compute dtype; LayerNorm stats stay fp32

    @nn.compact
    def __call__(self, x, out_views=None):
        """``out_views``: callers that read only the first ``out_views``
        rows of the output (the model reads fused[0]/fused[1] only) can
        say so — the LAST layer then computes attention queries, the
        out-projection, and the feed-forward for those rows alone.
        Earlier layers stay full (their outputs feed every view's keys/
        values).  The kept rows are bit-identical to the full forward
        (same params, same math; XLA cannot DCE the dead rows itself
        through the matmuls)."""
        for i in range(self.depth):
            last = i == self.depth - 1
            ov = out_views if (last and out_views) else None
            # torch nn.LayerNorm eps (reference parity; flax default is 1e-6)
            y = nn.LayerNorm(
                epsilon=1e-5, dtype=self.dtype, name=f"norm_attn_{i}"
            )(x)
            x = (x[:ov] if ov else x) + _Attention(
                self.dim, self.heads, self.dim_head, dtype=self.dtype,
                name=f"attn_{i}",
            )(y, out_views=ov)
            y = nn.LayerNorm(
                epsilon=1e-5, dtype=self.dtype, name=f"norm_ff_{i}"
            )(x)
            x = x + _FeedForward(
                self.dim, self.mlp_dim, dtype=self.dtype, name=f"ff_{i}"
            )(y)
        return x
