"""Transformer-formulation shootout at the global-render tile scale.

The view-fusion transformer costs ~340 ms/image (measured) vs a ~74 ms
bf16 FLOP floor.  Candidates:
  A. current view-unrolled form (models/transformer.py)
  B. head-batched einsum with the tiny (V, V) logits as trailing dims:
     logits (N, H, V, V) stays small; values mix via one einsum
  C. B but fully fused qkv reshape path in bf16
"""

import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from mpsnerf_tpu.utils.compilation_cache import enable_compilation_cache

    enable_compilation_cache()

    from mpsnerf_tpu.models.transformer import ViewFusionTransformer

    V, TILE, DIM = 3, 16384, 155
    TILES = 172  # ~2.82M global slots / 16384
    CS = 40
    SCALE = TILES / CS
    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(key, (CS, V, TILE, DIM))

    model = ViewFusionTransformer(dim=DIM, dtype=jnp.bfloat16)
    variables = model.init(jax.random.PRNGKey(1), x[0])

    def timeit(fn, label):
        f = jax.jit(lambda xs: jnp.sum(jax.lax.map(
            lambda u: jnp.sum(fn(u).astype(jnp.float32)), xs)))
        np.asarray(f(x))
        t0 = time.time()
        for _ in range(3):
            out = f(x)
        np.asarray(out)
        print(f"{label:34s} {(time.time()-t0)/3*1e3*SCALE:8.1f} ms/img-equiv")

    timeit(lambda u: model.apply(variables, u), "A view-unrolled (current)")

    # B: same weights, head-batched einsum attention.  TorchLinear wraps
    # nn.Dense -> param subtree Dense_0, kernel (in, out).
    p = variables["params"]

    def dense_w(lp, name):
        sub = lp[name]
        if "Dense_0" in sub:
            sub = sub["Dense_0"]
        return (sub["kernel"].astype(jnp.bfloat16),
                sub.get("bias", None))

    def attn_einsum(xv, lp):
        w_qkv, _ = dense_w(lp, "to_qkv")
        qkv = jnp.einsum(
            "vnd,do->vno", xv.astype(jnp.bfloat16), w_qkv
        )
        inner = 256
        q, k, v = qkv[..., :inner], qkv[..., inner:2*inner], qkv[..., 2*inner:]

        def heads(t):
            return t.reshape(V, -1, 4, 64)

        q, k, v = heads(q), heads(k), heads(v)
        logits = jnp.einsum("vnhd,wnhd->nhvw", q, k) * (64 ** -0.5)
        a = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(
            jnp.bfloat16
        )
        mix = jnp.einsum("nhvw,wnhd->vnhd", a, v).reshape(V, -1, 256)
        w_o, b_o = dense_w(lp, "to_out")
        return jnp.einsum("vno,od->vnd", mix, w_o) + b_o.astype(jnp.bfloat16)

    def ln(xv, lp):
        m = xv.mean(-1, keepdims=True)
        va = ((xv - m) ** 2).mean(-1, keepdims=True)
        y = (xv - m) * jax.lax.rsqrt(va + 1e-5)
        return y * lp["scale"] + lp["bias"]

    def ff(xv, lp):
        w1, b1 = dense_w(lp, "fc1")
        w2, b2 = dense_w(lp, "fc2")
        h = jax.nn.gelu(
            jnp.einsum("vnd,do->vno", xv.astype(jnp.bfloat16), w1)
            + b1.astype(jnp.bfloat16),
            approximate=False,
        )
        return (jnp.einsum("vno,od->vnd", h, w2)
                + b2.astype(jnp.bfloat16))

    def form_b(u):
        h = u
        for i in range(2):
            y = ln(h, p[f"norm_attn_{i}"])
            h = h + attn_einsum(y, p[f"attn_{i}"]).astype(jnp.float32)
            y = ln(h, p[f"norm_ff_{i}"])
            h = h + ff(y, p[f"ff_{i}"]).astype(jnp.float32)
        return h

    timeit(form_b, "B head-batched einsum (approx)")


if __name__ == "__main__":
    main()
