"""Microbench: bilinear-gather formulations for pixel-aligned sampling.

The render tail's dominant cost is 4-corner gathers from (V, C, H, W)
sources (rgb: 474 ms/img, latent: 374 ms/img measured).  Candidates:

  A. current: channel-major take_along_axis on (V, C, H*W)
  B. channels-last row gather: x[(v), lin, :] on (V, H*W, C)
     (transpose inside the mapped body — tests XLA's hoisting)
  C. channels-last with the source PRE-transposed outside the loop
"""

import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from mpsnerf_tpu.utils.compilation_cache import enable_compilation_cache

    enable_compilation_cache()

    CS, CAP = 64, 11264
    SCALE = 371 / CS
    V = 3
    key = jax.random.PRNGKey(0)

    for (c, h, w), tag in [((3, 512, 512), "rgb 3ch 512^2"),
                           ((128, 128, 128), "latent 128ch 128^2")]:
        src = jax.random.uniform(key, (V, c, h, w))
        src_hwc = jax.device_put(src.transpose(0, 2, 3, 1))
        uv = jax.random.uniform(key, (CS, V, CAP, 2)) * (w - 2)

        def corners(u):
            ix, iy = u[..., 0], u[..., 1]
            x0 = jnp.floor(ix)
            y0 = jnp.floor(iy)
            wx = ix - x0
            wy = iy - y0
            x0i = jnp.clip(x0, 0, w - 1).astype(jnp.int32)
            x1i = jnp.clip(x0 + 1, 0, w - 1).astype(jnp.int32)
            y0i = jnp.clip(y0, 0, h - 1).astype(jnp.int32)
            y1i = jnp.clip(y0 + 1, 0, h - 1).astype(jnp.int32)
            return (x0i, x1i, y0i, y1i,
                    (1 - wx) * (1 - wy), wx * (1 - wy),
                    (1 - wx) * wy, wx * wy)

        def form_a(u):
            x0i, x1i, y0i, y1i, wnw, wne, wsw, wse = corners(u)
            flat = src.reshape(V, c, h * w)

            def g(yy, xx):
                lin = yy * w + xx
                return jnp.take_along_axis(flat, lin[:, None, :], axis=2)

            out = (
                g(y0i, x0i) * wnw[:, None, :]
                + g(y0i, x1i) * wne[:, None, :]
                + g(y1i, x0i) * wsw[:, None, :]
                + g(y1i, x1i) * wse[:, None, :]
            )
            return out  # (V, C, N)

        def rows(flat_hwc, yy, xx):
            lin = yy * w + xx  # (V, N)
            return jnp.take_along_axis(
                flat_hwc, lin[:, :, None], axis=1
            )  # (V, N, C)

        def form_b(u):
            x0i, x1i, y0i, y1i, wnw, wne, wsw, wse = corners(u)
            flat = src.transpose(0, 2, 3, 1).reshape(V, h * w, c)
            out = (
                rows(flat, y0i, x0i) * wnw[..., None]
                + rows(flat, y0i, x1i) * wne[..., None]
                + rows(flat, y1i, x0i) * wsw[..., None]
                + rows(flat, y1i, x1i) * wse[..., None]
            )
            return out  # (V, N, C)

        flat_pre = src_hwc.reshape(V, h * w, c)

        def form_c(u):
            x0i, x1i, y0i, y1i, wnw, wne, wsw, wse = corners(u)
            out = (
                rows(flat_pre, y0i, x0i) * wnw[..., None]
                + rows(flat_pre, y0i, x1i) * wne[..., None]
                + rows(flat_pre, y1i, x0i) * wsw[..., None]
                + rows(flat_pre, y1i, x1i) * wse[..., None]
            )
            return out

        for name, fn in [("A chan-major", form_a), ("B hwc+inner-T", form_b),
                         ("C hwc pre-T", form_c)]:
            f = jax.jit(
                lambda xs, fn=fn: jnp.sum(
                    jax.lax.map(
                        lambda u: jnp.sum(fn(u).astype(jnp.float32)), xs
                    )
                )
            )
            np.asarray(f(uv))
            t0 = time.time()
            for _ in range(3):
                out = f(uv)
            np.asarray(out)
            dt = (time.time() - t0) / 3 * 1e3 * SCALE
            print(f"{tag:22s} {name:15s} {dt:8.1f} ms/img-equiv")


if __name__ == "__main__":
    main()
