"""Micro-probe: block-slice gathers vs row gathers vs the plan scatter.

Motivation (round 3): the coarse compaction plan costs ~74 ms in a
12.2M-element scatter that materializes ``gather_idx``.  A BLOCK-PADDED
superset plan (compact 8-sample blocks where any sample is a grid
candidate; the fine 1-NN stage already applies the exact 5 cm mask, so
superset semantics stay pixel-exact) would replace it with:

  * a (M/B,) block-any reduce + tiny cumsum/scatter,
  * block-slice gathers ``x.reshape(M/B, B, C)[block_idx]`` whose index
    count is B-fold smaller than the row gather's,

at the price of ~1.25-1.4x capacity inflation (body runs along a ray
are contiguous, ~33 samples: a run covers ceil overlapping 8-blocks)
which the fine pre-pass 1-NN pays linearly (~+30 ms).

Whether the trade wins hinges on ONE unknown: do (B, C)-slice gathers
lower at the ~9 ns/idx hardware gather rate like row gathers, or
pathologically like (K, C)-slice scatters (measured 94 ns/idx, see
ops/compact.py)?  This probe measures exactly that before any renderer
work.  Run on the real chip:

    PYTHONPATH=/root/repo:/root/.axon_site python -u tools/block_gather_probe.py
"""

import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from mpsnerf_tpu.utils.compilation_cache import enable_compilation_cache

    enable_compilation_cache()
    from mpsnerf_tpu.utils.liveness import first_contact_watchdog
    first_contact_watchdog()  # exit 3 instead of stalling the batch

    import os
    M = int(os.environ.get("PROBE_M", 12_189_696))  # bench samples (95097 rays x 128)
    B = 8
    K_ROW = int(os.environ.get("PROBE_KROW", 2_572_288))
    K_BLK = int(os.environ.get("PROBE_KBLK", 425_984))

    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    x = jax.random.normal(k1, (M, 6), jnp.float32)
    xb = x.reshape(M // B, B, 6)
    row_idx = jax.random.randint(k2, (K_ROW,), 0, M)
    blk_idx = jax.random.randint(k3, (K_BLK,), 0, M // B)

    def timed(fn, *args, n=10, label=""):
        out = fn(*args)
        np.asarray(jax.tree.leaves(out)[0])
        t0 = time.time()
        for _ in range(n):
            out = fn(*args)
        np.asarray(jax.tree.leaves(out)[0])
        print(f"{label:44s} {(time.time() - t0) / n * 1e3:8.1f} ms")

    @jax.jit
    def row_gather(x, idx):
        return jnp.sum(x[idx])

    @jax.jit
    def block_gather(xb, idx):
        return jnp.sum(xb[idx])

    @jax.jit
    def block_gather_flat(x, idx):
        # same result via a flat row gather of expanded indices — the
        # baseline the block form must beat
        flat = (idx[:, None] * B + jnp.arange(B)[None, :]).reshape(-1)
        return jnp.sum(x[flat])

    @jax.jit
    def block_any(x):
        # the candidate-block reduce the padded plan needs
        c = (x[:, 0] > 0).astype(jnp.int32).reshape(-1, B)
        return jnp.sum(jnp.max(c, axis=1))

    timed(row_gather, x, row_idx, label=f"row gather ({K_ROW} idx, (6,))")
    timed(block_gather, xb, blk_idx,
          label=f"block gather ({K_BLK} idx, ({B},6))")
    timed(block_gather_flat, x, blk_idx,
          label=f"flat equiv ({K_BLK * B} idx, (6,))")
    timed(block_any, x, label="block-any reduce (12.2M)")


if __name__ == "__main__":
    main()
