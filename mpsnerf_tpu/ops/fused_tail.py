"""Fused render tail: view-fusion transformer + NeRF MLP in ONE Pallas kernel.

The tail's matmul FLOPs are ~50 ms/image at bf16 peak, but the XLA path
spends ~450 ms (measured, tools/transformer_probe.py + chunk_op_probe.py):
LayerNorm/softmax glue, small unrolled VPU ops, and activation round trips
through HBM between every layer.  This kernel keeps the ~1.1M tail
parameters RESIDENT IN VMEM across the whole image render and pushes each
block of points through PE -> 2 transformer layers -> 8-layer MLP -> heads
without touching HBM in between.

Replaces (behavioral reference):
  * ``Transformer`` — /root/reference/lib/transformer.py:73-86
  * the NeRF-MLP tail of ``SKinningBatch.forward`` —
    /root/reference/lib/skinnning_batch.py:448-473

Semantics match the model's XLA path (``models/transformer.py`` +
``MPSNeRF._nerf_mlp``) at the bf16 compute dtype: matmuls take bf16
inputs, the residual stream / LayerNorm statistics / softmax stay fp32.
``tail_reference`` is the line-for-line XLA twin used for (a) parity
tests and (b) the backward pass: the kernel is wrapped in a custom VJP
whose bwd differentiates the reference implementation, so training is
bit-identical to the unfused path while eval runs the kernel.

Flagship-config only (use_trans=1, append_rgb=1, with_viewdirs=0,
pe_condition=1, no blend head); the model falls back to the unfused path
for other variants.

STATUS (measured on v5e): standalone the kernel is ~4% faster than the
XLA tail (304 vs 317 ms/img-equiv at 2.8M pts; head-mask-matmul
formulation, block 512 — larger blocks exceed VMEM).  End-to-end it is
currently SLOWER (187k vs 214k rays/s) because the model must
materialize the (V, K, C) per-view feature stack as a kernel input,
while XLA fuses the feature gathers directly into the transformer.  The
model therefore gates it behind MPSNERF_FUSED_TAIL=1 (off by default);
the kernel + reference twin + parity/grad tests remain the foundation
for a future fully-fused tail (gathers in-kernel via DMA).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NUM_FREQS = 6          # PE(can_pts, 6) -> 39 ch (ref run_nerf_helpers.py:313)
LN_EPS = 1e-5          # torch nn.LayerNorm default (reference parity)


@struct.dataclass
class TailWeights:
    """Per-layer tensors, all fp32 (cast at the matmul like flax Dense).

    Transformer (depth 2): ln_a_{s,b}, w_qkv, w_out/b_out, ln_f_{s,b},
    w_fc1/b_fc1, w_fc2/b_fc2 per layer.  MLP: pts (8), alpha, feature,
    views, rgb.  ``heads``/``dim_head``/``nerf_skips`` are static pytree
    metadata (used in Python loops at trace time).
    """

    ln_a_s: tuple   # 2 x (D,)
    ln_a_b: tuple
    w_qkv: tuple    # 2 x (D, 3*inner)
    w_out: tuple    # 2 x (inner, D)
    b_out: tuple
    ln_f_s: tuple
    ln_f_b: tuple
    w_fc1: tuple    # 2 x (D, mlp_dim)
    b_fc1: tuple
    w_fc2: tuple    # 2 x (mlp_dim, D)
    b_fc2: tuple
    w_pts: tuple    # 8 x (in_i, 256)
    b_pts: tuple
    w_alpha: jnp.ndarray
    b_alpha: jnp.ndarray
    w_feat: jnp.ndarray
    b_feat: jnp.ndarray
    w_views: jnp.ndarray
    b_views: jnp.ndarray
    w_rgb: jnp.ndarray
    b_rgb: jnp.ndarray
    heads: int = struct.field(pytree_node=False, default=4)
    dim_head: int = struct.field(pytree_node=False, default=64)
    nerf_skips: tuple = struct.field(pytree_node=False, default=(4,))


def _dense_params(tree):
    sub = tree["Dense_0"] if "Dense_0" in tree else tree
    return sub["kernel"], sub.get("bias")


def extract_tail_weights(params, depth=2, nerf_depth=8,
                         heads=4, dim_head=64, nerf_skips=(4,)):
    """Pull the transformer+MLP tensors out of a flax param tree (the
    MPSNeRF layout: ``transformer/{norm,attn,ff}_*``, ``pts_linear_i``,
    ``alpha_linear``...)."""
    tf = params["transformer"]

    def seq(fmt, n, f):
        return tuple(f(tf[fmt.format(i)]) for i in range(n))

    w_alpha, b_alpha = _dense_params(params["alpha_linear"])
    w_feat, b_feat = _dense_params(params["feature_linear"])
    w_views, b_views = _dense_params(params["views_linear"])
    w_rgb, b_rgb = _dense_params(params["rgb_linear"])
    return TailWeights(
        ln_a_s=seq("norm_attn_{}", depth, lambda t: t["scale"]),
        ln_a_b=seq("norm_attn_{}", depth, lambda t: t["bias"]),
        w_qkv=seq("attn_{}", depth,
                  lambda t: _dense_params(t["to_qkv"])[0]),
        w_out=seq("attn_{}", depth,
                  lambda t: _dense_params(t["to_out"])[0]),
        b_out=seq("attn_{}", depth,
                  lambda t: _dense_params(t["to_out"])[1]),
        ln_f_s=seq("norm_ff_{}", depth, lambda t: t["scale"]),
        ln_f_b=seq("norm_ff_{}", depth, lambda t: t["bias"]),
        w_fc1=seq("ff_{}", depth, lambda t: _dense_params(t["fc1"])[0]),
        b_fc1=seq("ff_{}", depth, lambda t: _dense_params(t["fc1"])[1]),
        w_fc2=seq("ff_{}", depth, lambda t: _dense_params(t["fc2"])[0]),
        b_fc2=seq("ff_{}", depth, lambda t: _dense_params(t["fc2"])[1]),
        w_pts=tuple(
            _dense_params(params[f"pts_linear_{i}"])[0]
            for i in range(nerf_depth)
        ),
        b_pts=tuple(
            _dense_params(params[f"pts_linear_{i}"])[1]
            for i in range(nerf_depth)
        ),
        w_alpha=w_alpha, b_alpha=b_alpha,
        w_feat=w_feat, b_feat=b_feat,
        w_views=w_views, b_views=b_views,
        w_rgb=w_rgb, b_rgb=b_rgb,
        heads=heads, dim_head=dim_head, nerf_skips=tuple(nerf_skips),
    )


# ---------------------------------------------------------------------------
# XLA reference (parity oracle + backward pass)
# ---------------------------------------------------------------------------

def _ln(x, scale, bias):
    # flax LayerNorm semantics at dtype=bf16: stats in fp32, the
    # normalized value and affine params cast to the compute dtype
    xf = x.astype(jnp.float32)
    m = xf.mean(-1, keepdims=True)
    v = ((xf - m) ** 2).mean(-1, keepdims=True)
    y = (xf - m) * jax.lax.rsqrt(v + LN_EPS)
    y = y.astype(jnp.bfloat16)
    return y * scale.astype(jnp.bfloat16) + bias.astype(jnp.bfloat16)


def _bf16_dense(x, w, b=None):
    y = jnp.dot(
        x.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
        preferred_element_type=jnp.bfloat16,
    )
    if b is not None:
        y = y + b.astype(jnp.bfloat16)
    return y


def tail_reference(w: TailWeights, feats, can_pts):
    """XLA twin of the kernel: feats (V, N, D) fp32, can_pts (N, 3) fp32
    -> (rgb (N, 3) fp32 pre-activation, alpha (N,) fp32)."""
    v_views = feats.shape[0]
    inner = w.heads * w.dim_head
    scale = w.dim_head ** -0.5

    x = feats  # residual stream fp32 (matches models/transformer.py)
    for li in range(len(w.w_qkv)):
        y = _ln(x, w.ln_a_s[li], w.ln_a_b[li])
        qkv = _bf16_dense(y, w.w_qkv[li])  # (V, N, 3*inner) bf16
        outs = []
        for i in range(v_views):
            head_outs = []
            for h in range(w.heads):
                sl = slice(h * w.dim_head, (h + 1) * w.dim_head)
                qi = qkv[i, :, 0 * inner:1 * inner][:, sl]
                logits = [
                    jnp.sum(
                        (qi * qkv[j, :, inner:2 * inner][:, sl]).astype(
                            jnp.float32
                        ),
                        axis=-1,
                    ) * scale
                    for j in range(v_views)
                ]
                m = logits[0]
                for l in logits[1:]:
                    m = jnp.maximum(m, l)
                exps = [jnp.exp(l - m) for l in logits]
                denom = sum(exps)
                mix = sum(
                    ((e / denom).astype(jnp.bfloat16))[:, None]
                    * qkv[j, :, 2 * inner:3 * inner][:, sl]
                    for j, e in enumerate(exps)
                )
                head_outs.append(mix)
            outs.append(jnp.concatenate(head_outs, axis=-1))
        attn = jnp.stack(outs, axis=0)
        attn = _bf16_dense(attn, w.w_out[li], w.b_out[li])
        x = x + attn.astype(jnp.float32)

        y = _ln(x, w.ln_f_s[li], w.ln_f_b[li])
        hdn = _bf16_dense(y, w.w_fc1[li], w.b_fc1[li])
        hdn = jax.nn.gelu(hdn, approximate=False)
        hdn = _bf16_dense(hdn, w.w_fc2[li], w.b_fc2[li])
        x = x + hdn.astype(jnp.float32)

    f1 = x[0]
    f2 = x[1] if v_views > 1 else x[0]

    # PE(can_pts, 6): [x, sin(f0 x), cos(f0 x), ...] (ops/positional.py)
    freqs = np.pi * (2.0 ** np.arange(NUM_FREQS))
    xb = can_pts[:, None, :] * jnp.asarray(freqs, can_pts.dtype)[:, None]
    pe = jnp.stack([jnp.sin(xb), jnp.cos(xb)], axis=-2).reshape(
        can_pts.shape[0], NUM_FREQS * 2 * 3
    )
    pe = jnp.concatenate([can_pts, pe], axis=-1)  # (N, 39)

    xin = jnp.concatenate([pe, f1.astype(jnp.float32)], axis=-1).astype(
        jnp.bfloat16
    )
    h = xin
    for i in range(len(w.w_pts)):
        h = jax.nn.relu(_bf16_dense(h, w.w_pts[i], w.b_pts[i]))
        if i in w.nerf_skips:
            h = jnp.concatenate([xin, h], axis=-1)
    alpha = _bf16_dense(h, w.w_alpha, w.b_alpha)[:, 0]
    feat = _bf16_dense(h, w.w_feat, w.b_feat)
    h2 = jnp.concatenate([feat, f2.astype(jnp.bfloat16)], axis=-1)
    h2 = jax.nn.relu(_bf16_dense(h2, w.w_views, w.b_views))
    rgb = _bf16_dense(h2, w.w_rgb, w.b_rgb)
    return rgb.astype(jnp.float32), alpha.astype(jnp.float32)


# ---------------------------------------------------------------------------
# Pallas kernel
# ---------------------------------------------------------------------------

def _kernel(feats_ref, pts_ref, *wrefs_and_out, v_views, heads, dim_head,
            depth, nerf_depth, nerf_skips):
    out_ref = wrefs_and_out[-1]
    wrefs = wrefs_and_out[:-1]
    it = iter(wrefs)

    def nxt():
        return next(it)[:]

    ln_a = [(nxt(), nxt()) for _ in range(depth)]
    w_qkv = [nxt() for _ in range(depth)]
    w_out = [(nxt(), nxt()) for _ in range(depth)]
    ln_f = [(nxt(), nxt()) for _ in range(depth)]
    w_fc1 = [(nxt(), nxt()) for _ in range(depth)]
    w_fc2 = [(nxt(), nxt()) for _ in range(depth)]
    w_pts = [(nxt(), nxt()) for _ in range(nerf_depth)]
    w_alpha = (nxt(), nxt())
    w_feat = (nxt(), nxt())
    w_views = (nxt(), nxt())
    w_rgb = (nxt(), nxt())

    inner = heads * dim_head
    scale = dim_head ** -0.5

    def ln(x, sb):
        s, b = sb
        m = jnp.mean(x, axis=-1, keepdims=True)
        v = jnp.mean((x - m) * (x - m), axis=-1, keepdims=True)
        y = ((x - m) * jax.lax.rsqrt(v + LN_EPS)).astype(jnp.bfloat16)
        return y * s.astype(jnp.bfloat16) + b.astype(jnp.bfloat16)

    def dense(x, wgt, b=None):
        # Mosaic mandates a 32-bit accumulator for bf16 matmuls; the
        # result is rounded back to bf16 like the XLA path's output dtype
        y = jnp.dot(
            x.astype(jnp.bfloat16), wgt.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        ).astype(jnp.bfloat16)
        if b is not None:
            y = y + b.astype(jnp.bfloat16)
        return y

    def gelu_exact(x):
        # Mosaic has no erf/erfc lowering; Abramowitz-Stegun 7.1.26
        # (max abs err 1.5e-7 in fp32 — far below bf16 resolution, so
        # this matches jax.nn.gelu(approximate=False) after rounding)
        xf = x.astype(jnp.float32)
        z = xf * np.float32(1.0 / np.sqrt(2.0))
        s = jnp.sign(z)
        az = jnp.abs(z)
        t = 1.0 / (1.0 + 0.3275911 * az)
        poly = t * (
            0.254829592
            + t * (-0.284496736
                   + t * (1.421413741
                          + t * (-1.453152027 + t * 1.061405429)))
        )
        erf = s * (1.0 - poly * jnp.exp(-az * az))
        return (0.5 * xf * (1.0 + erf)).astype(jnp.bfloat16)

    xs = [feats_ref[i].astype(jnp.float32) for i in range(v_views)]

    # head-indicator matrices: per-head reductions/broadcasts as tiny
    # matmuls (MXU) instead of sublane slicing (VPU relayouts).
    # hmask (inner, H): column h is 1 on head h's channels.  Built from
    # iota in-kernel (pallas_call rejects captured host constants).
    ch = jax.lax.broadcasted_iota(jnp.int32, (inner, heads), 0) // dim_head
    hh = jax.lax.broadcasted_iota(jnp.int32, (inner, heads), 1)
    hmask = (ch == hh).astype(jnp.bfloat16)   # (inner, H)
    hmask_t = hmask.T                          # (H, inner)

    for li in range(depth):
        ys = [ln(x, ln_a[li]) for x in xs]
        qkvs = [dense(y, w_qkv[li]) for y in ys]
        qs = [t[:, :inner] for t in qkvs]
        ks = [t[:, inner:2 * inner] for t in qkvs]
        vs = [t[:, 2 * inner:] for t in qkvs]
        # logits[i][j]: (TN, H) = (q_i * k_j) @ hmask
        logits = [
            [
                jnp.dot(
                    qs[i] * ks[j], hmask,
                    preferred_element_type=jnp.float32,
                ) * scale
                for j in range(v_views)
            ]
            for i in range(v_views)
        ]
        attns = []
        for i in range(v_views):
            m = logits[i][0]
            for l in logits[i][1:]:
                m = jnp.maximum(m, l)
            exps = [jnp.exp(l - m) for l in logits[i]]
            denom = sum(exps)
            # broadcast per-head weights back to channels via hmask_t and
            # mix values: sum_j (a_ij expanded) * v_j
            mix = sum(
                jnp.dot(
                    (e / denom).astype(jnp.bfloat16), hmask_t,
                    preferred_element_type=jnp.float32,
                ).astype(jnp.bfloat16) * vs[j]
                for j, e in enumerate(exps)
            )
            attns.append(mix)
        xs = [
            x + dense(a, *w_out[li]).astype(jnp.float32)
            for x, a in zip(xs, attns)
        ]
        ys = [ln(x, ln_f[li]) for x in xs]
        xs = [
            x + dense(
                gelu_exact(dense(y, *w_fc1[li])),
                *w_fc2[li],
            ).astype(jnp.float32)
            for x, y in zip(xs, ys)
        ]

    f1 = xs[0]
    f2 = xs[1] if v_views > 1 else xs[0]

    pts = pts_ref[:]
    pe_parts = [pts]
    for k in range(NUM_FREQS):
        xb = pts * (np.pi * (2.0 ** k))
        pe_parts.append(jnp.sin(xb))
        pe_parts.append(jnp.cos(xb))
    pe = jnp.concatenate(pe_parts, axis=-1)  # (TN, 39)

    xin = jnp.concatenate(
        [pe, f1], axis=-1
    ).astype(jnp.bfloat16)
    h = xin
    for i in range(nerf_depth):
        h = jnp.maximum(dense(h, *w_pts[i]), 0)
        if i in nerf_skips:
            h = jnp.concatenate([xin, h], axis=-1)
    alpha = dense(h, *w_alpha)
    feat = dense(h, *w_feat)
    h2 = jnp.concatenate([feat, f2.astype(jnp.bfloat16)], axis=-1)
    h2 = jnp.maximum(dense(h2, *w_views), 0)
    rgb = dense(h2, *w_rgb)
    out = jnp.concatenate([rgb, alpha], axis=-1).astype(jnp.float32)
    out_ref[:, :] = out


def _tail_fused_impl(w: TailWeights, feats, can_pts, block=None,
                     interpret=False):
    import os

    if block is None:
        block = int(os.environ.get("MPSNERF_FUSED_BLOCK", "512"))
    v_views, n, d = feats.shape
    assert n % block == 0, (n, block)
    depth = len(w.w_qkv)
    nerf_depth = len(w.w_pts)

    # ordered exactly as _kernel consumes them.  Matmul weights are
    # pre-cast to bf16 HERE (once per call) so the kernel neither stores
    # fp32 copies in VMEM nor casts per grid step; LN params stay fp32.
    def bf(a):
        return a.astype(jnp.bfloat16)

    weight_arrays = []
    for li in range(depth):
        weight_arrays += [w.ln_a_s[li].reshape(1, -1),
                          w.ln_a_b[li].reshape(1, -1)]
    weight_arrays += [bf(w.w_qkv[li]) for li in range(depth)]
    for li in range(depth):
        weight_arrays += [bf(w.w_out[li]), bf(w.b_out[li]).reshape(1, -1)]
    for li in range(depth):
        weight_arrays += [w.ln_f_s[li].reshape(1, -1),
                          w.ln_f_b[li].reshape(1, -1)]
    for li in range(depth):
        weight_arrays += [bf(w.w_fc1[li]), bf(w.b_fc1[li]).reshape(1, -1)]
    for li in range(depth):
        weight_arrays += [bf(w.w_fc2[li]), bf(w.b_fc2[li]).reshape(1, -1)]
    for i in range(nerf_depth):
        weight_arrays += [bf(w.w_pts[i]), bf(w.b_pts[i]).reshape(1, -1)]
    weight_arrays += [
        bf(w.w_alpha), bf(w.b_alpha).reshape(1, -1),
        bf(w.w_feat), bf(w.b_feat).reshape(1, -1),
        bf(w.w_views), bf(w.b_views).reshape(1, -1),
        bf(w.w_rgb), bf(w.b_rgb).reshape(1, -1),
    ]

    kern = functools.partial(
        _kernel, v_views=v_views, heads=w.heads, dim_head=w.dim_head,
        depth=depth, nerf_depth=nerf_depth, nerf_skips=w.nerf_skips,
    )
    grid = n // block
    out = pl.pallas_call(
        kern,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((v_views, block, d), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block, 3), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ] + [
            pl.BlockSpec(a.shape, (lambda i, nd=a.ndim: (0,) * nd),
                         memory_space=pltpu.VMEM)
            for a in weight_arrays
        ],
        out_specs=pl.BlockSpec((block, 4), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, 4), jnp.float32),
        interpret=interpret,
    )(feats, can_pts, *weight_arrays)
    return out[:, :3], out[:, 3]


# ordering note: _kernel consumes ln_a (pairs) -> all w_qkv -> w_out pairs
# -> ln_f pairs -> fc1 pairs -> fc2 pairs -> pts pairs -> heads; the list
# construction above must match it exactly.


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def tail_fused(w: TailWeights, feats, can_pts, interpret=False):
    """Fused tail (custom VJP: forward = Pallas, backward = XLA twin)."""
    return _tail_fused_impl(w, feats, can_pts, interpret=interpret)


def _tail_fused_fwd(w, feats, can_pts, interpret):
    return _tail_fused_impl(w, feats, can_pts, interpret=interpret), (
        w, feats, can_pts,
    )


def _tail_fused_bwd(interpret, res, g):
    w, feats, can_pts = res
    _, vjp = jax.vjp(tail_reference, w, feats, can_pts)
    return vjp(g)


tail_fused.defvjp(_tail_fused_fwd, _tail_fused_bwd)


# ---------------------------------------------------------------------------
# v2: bilinear combine + rgb PE + concat fused IN-kernel
# ---------------------------------------------------------------------------
#
# Round-2 finding: feeding the kernel a pre-built (V, N, 155) feature stack
# is end-to-end SLOWER than XLA — the stack materializes, and the bilinear
# combine / PE / concat that XLA normally fuses into the transformer's
# first matmul become a separate memory-bound pass.  v2 takes the RAW
# gather outputs instead (the (2,2,C) patches + clamped bilinear weights
# from ops/grid_sample.gather_patches_2d, plus the sampled rgb and the
# canonical points) and performs combine -> PE -> concat inside the
# kernel, so the only thing XLA materializes is what the gather unit
# emits anyway.

RGB_FREQS = 4  # PE(rgb, 4) -> 27 ch (ref skinnning_batch.py:442)


def _combine_pe_feats(patches_v, wx_v, wy_v, rgb_v, c, np_mod):
    """One view's (TN, 4*C) flattened patches + (TN, 1) weights + (TN, 3)
    rgb -> (TN, C + 27) fp32 transformer input.  Patch channels are laid
    out [p00|p01|p10|p11] so the combine slices 128-aligned LANES (free in
    Mosaic; sublane slicing would relayout).  Shared trace-level math
    between the kernel and the XLA twin (identical op sequence ->
    identical fp32 rounding)."""
    w00 = (1.0 - wx_v) * (1.0 - wy_v)
    w01 = wx_v * (1.0 - wy_v)
    w10 = (1.0 - wx_v) * wy_v
    w11 = wx_v * wy_v
    p = patches_v.astype(jnp.float32)
    lat = (
        p[:, 0 * c:1 * c] * w00 + p[:, 1 * c:2 * c] * w01
        + p[:, 2 * c:3 * c] * w10 + p[:, 3 * c:4 * c] * w11
    )  # (TN, C)
    pe_parts = [rgb_v]
    for k in range(RGB_FREQS):
        xb = rgb_v * (np_mod.pi * (2.0 ** k))
        pe_parts.append(jnp.sin(xb))
        pe_parts.append(jnp.cos(xb))
    return jnp.concatenate([lat] + pe_parts, axis=-1)  # (TN, C + 27)


def tail_reference_patches(w: TailWeights, patches, wx, wy, rgb, can_pts):
    """XLA twin of the v2 kernel.  patches (V, N, 4*C) (any float dtype,
    channel layout [p00|p01|p10|p11]), wx/wy (V, N, 1) fp32, rgb (V, N, 3)
    fp32, can_pts (N, 3) fp32."""
    v_views = patches.shape[0]
    c = patches.shape[-1] // 4
    feats = jnp.stack(
        [
            _combine_pe_feats(patches[i], wx[i], wy[i], rgb[i], c, np)
            for i in range(v_views)
        ],
        axis=0,
    )
    return tail_reference(w, feats, can_pts)


def _kernel_v2(patches_ref, wx_ref, wy_ref, rgb_ref, pts_ref,
               *wrefs_and_out, v_views, heads, dim_head, depth, nerf_depth,
               nerf_skips):
    out_ref = wrefs_and_out[-1]
    wrefs = wrefs_and_out[:-1]
    it = iter(wrefs)

    def nxt():
        return next(it)[:]

    ln_a = [(nxt(), nxt()) for _ in range(depth)]
    w_qkv = [nxt() for _ in range(depth)]
    w_out = [(nxt(), nxt()) for _ in range(depth)]
    ln_f = [(nxt(), nxt()) for _ in range(depth)]
    w_fc1 = [(nxt(), nxt()) for _ in range(depth)]
    w_fc2 = [(nxt(), nxt()) for _ in range(depth)]
    w_pts = [(nxt(), nxt()) for _ in range(nerf_depth)]
    w_alpha = (nxt(), nxt())
    w_feat = (nxt(), nxt())
    w_views = (nxt(), nxt())
    w_rgb = (nxt(), nxt())

    inner = heads * dim_head
    scale = dim_head ** -0.5

    def ln(x, sb):
        s, b = sb
        m = jnp.mean(x, axis=-1, keepdims=True)
        v = jnp.mean((x - m) * (x - m), axis=-1, keepdims=True)
        y = ((x - m) * jax.lax.rsqrt(v + LN_EPS)).astype(jnp.bfloat16)
        return y * s.astype(jnp.bfloat16) + b.astype(jnp.bfloat16)

    def dense(x, wgt, b=None):
        y = jnp.dot(
            x.astype(jnp.bfloat16), wgt.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        ).astype(jnp.bfloat16)
        if b is not None:
            y = y + b.astype(jnp.bfloat16)
        return y

    def gelu_exact(x):
        # Abramowitz-Stegun 7.1.26 (no erf lowering in Mosaic); see
        # _kernel for the error bound
        xf = x.astype(jnp.float32)
        z = xf * np.float32(1.0 / np.sqrt(2.0))
        s = jnp.sign(z)
        az = jnp.abs(z)
        t = 1.0 / (1.0 + 0.3275911 * az)
        poly = t * (
            0.254829592
            + t * (-0.284496736
                   + t * (1.421413741
                          + t * (-1.453152027 + t * 1.061405429)))
        )
        erf = s * (1.0 - poly * jnp.exp(-az * az))
        return (0.5 * xf * (1.0 + erf)).astype(jnp.bfloat16)

    # --- in-kernel bilinear combine + rgb PE + concat (v2 prologue) ---
    c_lat = patches_ref.shape[-1] // 4
    xs = [
        _combine_pe_feats(
            patches_ref[i], wx_ref[i], wy_ref[i], rgb_ref[i], c_lat, np
        )
        for i in range(v_views)
    ]

    ch = jax.lax.broadcasted_iota(jnp.int32, (inner, heads), 0) // dim_head
    hh = jax.lax.broadcasted_iota(jnp.int32, (inner, heads), 1)
    hmask = (ch == hh).astype(jnp.bfloat16)
    hmask_t = hmask.T

    for li in range(depth):
        ys = [ln(x, ln_a[li]) for x in xs]
        qkvs = [dense(y, w_qkv[li]) for y in ys]
        qs = [t[:, :inner] for t in qkvs]
        ks = [t[:, inner:2 * inner] for t in qkvs]
        vs = [t[:, 2 * inner:] for t in qkvs]
        logits = [
            [
                jnp.dot(
                    qs[i] * ks[j], hmask,
                    preferred_element_type=jnp.float32,
                ) * scale
                for j in range(v_views)
            ]
            for i in range(v_views)
        ]
        attns = []
        for i in range(v_views):
            m = logits[i][0]
            for l in logits[i][1:]:
                m = jnp.maximum(m, l)
            exps = [jnp.exp(l - m) for l in logits[i]]
            denom = sum(exps)
            mix = sum(
                jnp.dot(
                    (e / denom).astype(jnp.bfloat16), hmask_t,
                    preferred_element_type=jnp.float32,
                ).astype(jnp.bfloat16) * vs[j]
                for j, e in enumerate(exps)
            )
            attns.append(mix)
        xs = [
            x + dense(a, *w_out[li]).astype(jnp.float32)
            for x, a in zip(xs, attns)
        ]
        ys = [ln(x, ln_f[li]) for x in xs]
        xs = [
            x + dense(
                gelu_exact(dense(y, *w_fc1[li])),
                *w_fc2[li],
            ).astype(jnp.float32)
            for x, y in zip(xs, ys)
        ]

    f1 = xs[0]
    f2 = xs[1] if v_views > 1 else xs[0]

    pts = pts_ref[:]
    pe_parts = [pts]
    for k in range(NUM_FREQS):
        xb = pts * (np.pi * (2.0 ** k))
        pe_parts.append(jnp.sin(xb))
        pe_parts.append(jnp.cos(xb))
    pe = jnp.concatenate(pe_parts, axis=-1)

    xin = jnp.concatenate([pe, f1], axis=-1).astype(jnp.bfloat16)
    h = xin
    for i in range(nerf_depth):
        h = jnp.maximum(dense(h, *w_pts[i]), 0)
        if i in nerf_skips:
            h = jnp.concatenate([xin, h], axis=-1)
    alpha = dense(h, *w_alpha)
    feat = dense(h, *w_feat)
    h2 = jnp.concatenate([feat, f2.astype(jnp.bfloat16)], axis=-1)
    h2 = jnp.maximum(dense(h2, *w_views), 0)
    rgb = dense(h2, *w_rgb)
    out = jnp.concatenate([rgb, alpha], axis=-1).astype(jnp.float32)
    out_ref[:, :] = out


def _weight_arrays(w: TailWeights):
    """Flatten the weights in exactly the order the kernels consume them;
    matmul weights pre-cast to bf16 once per call, LN params fp32."""
    depth = len(w.w_qkv)
    nerf_depth = len(w.w_pts)

    def bf(a):
        return a.astype(jnp.bfloat16)

    arrays = []
    for li in range(depth):
        arrays += [w.ln_a_s[li].reshape(1, -1), w.ln_a_b[li].reshape(1, -1)]
    arrays += [bf(w.w_qkv[li]) for li in range(depth)]
    for li in range(depth):
        arrays += [bf(w.w_out[li]), bf(w.b_out[li]).reshape(1, -1)]
    for li in range(depth):
        arrays += [w.ln_f_s[li].reshape(1, -1), w.ln_f_b[li].reshape(1, -1)]
    for li in range(depth):
        arrays += [bf(w.w_fc1[li]), bf(w.b_fc1[li]).reshape(1, -1)]
    for li in range(depth):
        arrays += [bf(w.w_fc2[li]), bf(w.b_fc2[li]).reshape(1, -1)]
    for i in range(nerf_depth):
        arrays += [bf(w.w_pts[i]), bf(w.b_pts[i]).reshape(1, -1)]
    arrays += [
        bf(w.w_alpha), bf(w.b_alpha).reshape(1, -1),
        bf(w.w_feat), bf(w.b_feat).reshape(1, -1),
        bf(w.w_views), bf(w.b_views).reshape(1, -1),
        bf(w.w_rgb), bf(w.b_rgb).reshape(1, -1),
    ]
    return arrays


def _tail_fused_patches_impl(w: TailWeights, patches, wx, wy, rgb, can_pts,
                             block=None, interpret=False):
    import os

    if block is None:
        block = int(os.environ.get("MPSNERF_FUSED_BLOCK", "512"))
    v_views, n, four_c = patches.shape
    assert four_c % 4 == 0, patches.shape
    assert n % block == 0, (n, block)
    depth = len(w.w_qkv)
    nerf_depth = len(w.w_pts)

    weight_arrays = _weight_arrays(w)
    kern = functools.partial(
        _kernel_v2, v_views=v_views, heads=w.heads, dim_head=w.dim_head,
        depth=depth, nerf_depth=nerf_depth, nerf_skips=w.nerf_skips,
    )
    grid = n // block
    out = pl.pallas_call(
        kern,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((v_views, block, four_c),
                         lambda i: (0, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((v_views, block, 1), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((v_views, block, 1), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((v_views, block, 3), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block, 3), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ] + [
            pl.BlockSpec(a.shape, (lambda i, nd=a.ndim: (0,) * nd),
                         memory_space=pltpu.VMEM)
            for a in weight_arrays
        ],
        out_specs=pl.BlockSpec((block, 4), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, 4), jnp.float32),
        interpret=interpret,
    )(patches, wx, wy, rgb, can_pts, *weight_arrays)
    return out[:, :3], out[:, 3]


@functools.partial(jax.custom_vjp, nondiff_argnums=(6,))
def tail_fused_patches(w: TailWeights, patches, wx, wy, rgb, can_pts,
                       interpret=False):
    """v2 fused tail: raw patches in, composited-ready (rgb, alpha) out.
    Custom VJP: forward = Pallas kernel, backward = XLA twin (training
    takes the unfused model path anyway; this keeps jax.vjp total)."""
    return _tail_fused_patches_impl(
        w, patches, wx, wy, rgb, can_pts, interpret=interpret
    )


def _tail_fused_patches_fwd(w, patches, wx, wy, rgb, can_pts, interpret):
    return _tail_fused_patches_impl(
        w, patches, wx, wy, rgb, can_pts, interpret=interpret
    ), (w, patches, wx, wy, rgb, can_pts)


def _tail_fused_patches_bwd(interpret, res, g):
    w, patches, wx, wy, rgb, can_pts = res
    _, vjp = jax.vjp(tail_reference_patches, w, patches, wx, wy, rgb,
                     can_pts)
    return vjp(g)


tail_fused_patches.defvjp(_tail_fused_patches_fwd, _tail_fused_patches_bwd)
