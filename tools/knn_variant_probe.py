"""1-NN Pallas kernel variants, timed on the real chip at workload scale.

The shipped packed-key kernel (ops/knn.py) measures ~130 ms at the fine
pre-pass's 2.57M queries — ~3x its VPU flop floor (~35-50 ms).  Suspects:

  * the in-kernel ``v[:, d][None, :]`` slice of the (VT, 3) vertex tile
    is a sublane->lane transpose (3 per tile step, 18 per block);
  * the per-tile cross-lane min-reduction (jnp.min axis=-1 over 1152
    lanes) repeats 6x per block where one final reduce would do.

Variants:
  base      — shipped kernel, as-is.
  vT        — vertex tiles pre-transposed to (T, 3, VT): v_ref[t, d] is
              already a lane-major row; no in-kernel transpose.
  vT_accum  — vT + elementwise-min accumulation over tiles; ONE
              cross-lane reduce at the end.
  vT_accum_bXXXX — the same at larger query blocks.

RESULTS (v5e, 2.57M queries x 6890 verts, 2026-08 round 3):
  base 109.0 ms | vT b1024 96.1 ms (SHIPPED) | vT b2048 98.5 ms |
  vT vt128 143.8 ms | every vT_accum variant crashes the Mosaic remote
  compile (HTTP 500).  A dual-reduction kernel that also emits the exact
  min-d2 (int-bits min, single merged (8,256) output — the only form
  that compiles; f32 carries initialized with jnp.inf and multi-output
  pallas_call both HANG the compile) measured 223 ms — 2x slower than
  ids-only + the outside recompute gather.  Conclusions are baked into
  ops/knn.py; nothing here is worth re-trying.

NOTE on the oracle check below: on TPU, nearest_vertex_xla's matmul
runs at default (bfloat16) matmul precision, so ITS argmin flips on
random near-tie-dense point sets — the mismatches it reports against
the kernel are the oracle's error, not the kernel's (the fp64 host
oracle confirms the kernel exact; see the round-3 validation).

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/knn_variant_probe.py
"""

import functools
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from mpsnerf_tpu.utils.compilation_cache import enable_compilation_cache
    from mpsnerf_tpu.ops.knn import (
        nearest_vertex_pallas, nearest_vertex_xla, _pad_to, _round_up,
        _ID_BITS, _VERT_TILE,
    )

    enable_compilation_cache()

    N = 2_572_288          # fine pre-pass candidate count (bench scale)
    V = 6890
    low_mask = (1 << _ID_BITS) - 1

    key = jax.random.PRNGKey(0)
    kq, kv = jax.random.split(key)
    query = jax.random.uniform(kq, (N, 3), jnp.float32, -1.2, 1.2)
    verts = jax.random.uniform(kv, (V, 3), jnp.float32, -1.0, 1.0)

    # ------------------------------------------------------------------
    def kernel_vT(q_ref, v_ref, id_ref, *, accum, vt):
        q = q_ref[:]
        n_tiles = v_ref.shape[0]

        if accum:
            def tile_step(t, best):
                d2 = jnp.zeros((q.shape[0], vt), jnp.float32)
                for d in range(3):
                    diff = q[:, d : d + 1] - v_ref[t, d][None, :]
                    d2 = d2 + diff * diff
                ids = jax.lax.broadcasted_iota(jnp.int32, (1, vt), 1) + t * vt
                key = (pltpu.bitcast(d2, jnp.int32) & ~low_mask) | ids
                return jnp.minimum(best, key)

            best = jax.lax.fori_loop(
                0, n_tiles, tile_step,
                jnp.full((q.shape[0], vt), 0x7FFFFFFF, jnp.int32),
            )
            best = jnp.min(best, axis=-1)
        else:
            def tile_step(t, best):
                d2 = jnp.zeros((q.shape[0], vt), jnp.float32)
                for d in range(3):
                    diff = q[:, d : d + 1] - v_ref[t, d][None, :]
                    d2 = d2 + diff * diff
                ids = jax.lax.broadcasted_iota(jnp.int32, (1, vt), 1) + t * vt
                key = jnp.min(
                    (pltpu.bitcast(d2, jnp.int32) & ~low_mask) | ids, axis=-1
                )
                return jnp.minimum(best, key)

            best = jax.lax.fori_loop(
                0, n_tiles, tile_step,
                jnp.full((q.shape[0],), 0x7FFFFFFF, jnp.int32),
            )
        id_ref[:, :] = (best & low_mask).reshape(id_ref.shape)

    @functools.partial(jax.jit, static_argnames=("block", "accum", "vt"))
    def nn_vT(query, verts, block=1024, accum=False, vt=_VERT_TILE):
        n = query.shape[0]
        nb = _round_up(max(n, 1), block)
        q = _pad_to(query.astype(jnp.float32), nb, 0.0)
        nv = _round_up(verts.shape[0], vt)
        v = _pad_to(verts.astype(jnp.float32), nv, 1e8)
        # (T, 3, VT): dim d of tile t is a ready lane-major row
        v_tiles = v.reshape(-1, vt, 3).transpose(0, 2, 1)
        grid = nb // block
        ids = pl.pallas_call(
            functools.partial(kernel_vT, accum=accum, vt=vt),
            grid=(grid,),
            in_specs=[
                pl.BlockSpec((block, 3), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(v_tiles.shape, lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((block // 128, 128), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((grid * block // 128, 128),
                                           jnp.int32),
        )(q, v_tiles)
        ids = ids.reshape(-1)[:n]
        diff = query.astype(jnp.float32) - v.reshape(-1, 3)[ids]
        return jnp.sum(diff * diff, axis=-1), ids

    # ------------------------------------------------------------------
    def timed(fn, label, n=10):
        d2, ids = fn()
        s = jnp.sum(d2) + jnp.sum(ids)
        np.asarray(s)
        t0 = time.time()
        for _ in range(n):
            d2, ids = fn()
            s = jnp.sum(d2) + jnp.sum(ids)
        np.asarray(s)
        dt = (time.time() - t0) / n * 1e3
        print(f"{label:28s} {dt:8.2f} ms")
        return dt, ids

    base_t, base_ids = timed(
        lambda: nearest_vertex_pallas(query, verts), "base (shipped)")

    variants = [
        ("vT b1024", dict(block=1024, accum=False)),
        ("vT_accum b1024", dict(block=1024, accum=True)),
        ("vT_accum b2048", dict(block=2048, accum=True)),
        ("vT b2048", dict(block=2048, accum=False)),
        ("vT_accum b512", dict(block=512, accum=True)),
        ("vT_accum b1024 vt2304", dict(block=1024, accum=True, vt=2304)),
        ("vT_accum b1024 vt128", dict(block=1024, accum=True, vt=128)),
    ]
    results = {}
    for label, kw in variants:
        try:
            t, ids = timed(lambda kw=kw: nn_vT(query, verts, **kw), label)
            match = bool(jnp.mean((ids == base_ids).astype(jnp.float32)) > 0.9999)
            results[label] = (t, match)
            if not match:
                print(f"  !! id mismatch vs base")
        except Exception as e:  # noqa: BLE001
            print(f"{label:28s} FAILED: {type(e).__name__}: {str(e)[:200]}")

    # exactness of the best variant vs the XLA oracle on a subset
    if not results:
        print("every variant failed; base-kernel numbers above stand")
        return
    sub = 131072
    d2x, idsx = nearest_vertex_xla(query[:sub], verts)
    best_label = min(results, key=lambda k: results[k][0])
    print(f"best: {best_label}")
    kw = dict(variants)[best_label]
    d2p, idsp = nn_vT(query[:sub], verts, **kw)
    mism = int(jnp.sum((idsp != idsx).astype(jnp.int32)))
    derr = float(jnp.max(jnp.abs(d2p - d2x)))
    print(f"vs XLA oracle: id mismatches {mism}/{sub}, max|d2 err| {derr:.3e}")


if __name__ == "__main__":
    main()
