"""Nearest-SMPL-vertex lookup: the framework's hottest geometric primitive.

Replaces pytorch3d ``knn_points`` (CUDA) — call sites in the reference:
``lib/skinnning_batch.py:214,256,357,409``, ``extract_thuman_mesh.py:132,149``.

Two implementations:
  * :func:`nearest_vertex_xla` — blocked XLA formulation (portable; used on
    CPU and as the parity oracle).
  * :func:`nearest_vertex_pallas` — Pallas TPU kernel that keeps the vertex
    table resident in VMEM and streams query tiles through it, maintaining a
    running (min-dist, argmin) so the (N x V) distance matrix is never
    materialized in HBM.

Both are exact 1-NN (no approximation — required for parity).
:func:`knn_points` provides general K via ``lax.top_k`` for the mesh tools.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_QUERY_BLOCK = 1024  # stored as (8, 128) output tiles (TPU min f32 tile)
_VERT_TILE = 1152    # 9 sublane-groups of 128; 6 tiles cover 6890 padded->6912


def _pad_to(x: jnp.ndarray, n: int, value) -> jnp.ndarray:
    pad = n - x.shape[0]
    if pad <= 0:
        return x
    return jnp.pad(x, ((0, pad),) + ((0, 0),) * (x.ndim - 1), constant_values=value)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def nearest_vertex_xla(
    query: jnp.ndarray, verts: jnp.ndarray, block: int = 8192
):
    """Exact 1-NN: returns ``(dist2 (N,), ids (N,))``.

    Blocked over queries so the transient distance matrix stays ~block x V.
    """
    n = query.shape[0]
    nb = _round_up(max(n, 1), block)
    q = _pad_to(query, nb, 0.0).reshape(-1, block, 3)

    v2 = jnp.sum(verts * verts, axis=-1)  # (V,)

    def one_block(qb):
        d2 = (
            jnp.sum(qb * qb, axis=-1, keepdims=True)
            - 2.0 * qb @ verts.T
            + v2[None, :]
        )
        ids = jnp.argmin(d2, axis=-1)
        return jnp.take_along_axis(d2, ids[:, None], axis=-1)[:, 0], ids

    d2, ids = jax.lax.map(one_block, q)
    return d2.reshape(-1)[:n], ids.reshape(-1)[:n].astype(jnp.int32)


# global vertex ids fit in the low 13 bits (8192 > padded 6912); packing
# them into the distance's low mantissa bits turns min+argmin+select into
# ONE min-reduction.  Costs 13 mantissa bits of tie-breaking precision
# (relative 2^-10) — only near-exact ties can flip, same class of fp
# nondeterminism the matmul formulation already has.
_ID_BITS = 13


def _nn_kernel(q_ref, v_ref, id_ref):
    """One grid step: QUERY_BLOCK queries vs. all vertex tiles.

    q_ref: (B, 3) queries; v_ref: (T, 3, VT) padded vertex tiles,
    PRE-TRANSPOSED so ``v_ref[t, d]`` is already a lane-major row — the
    (VT, 3) layout's ``v[:, d][None, :]`` slice forced a sublane->lane
    transpose per tile per dim, measured 12% of the whole kernel
    (tools/knn_variant_probe.py).
    Output: (B,) argmin vertex ids; the exact distance is recomputed
    from the id outside the kernel.  Also-emitting the exact min-d2 as a
    second reduction was built and measured 2x SLOWER end-to-end
    (223 vs 96 ms at 2.57M queries) than the ids-only kernel plus the
    outside O(N) recompute gather — and the naive formulations (f32
    carry initialized with jnp.inf, or a second pallas output) hang the
    Mosaic compile outright.  Do not re-try.
    """
    q = q_ref[:]  # (B, 3)
    n_tiles = v_ref.shape[0]
    vt = v_ref.shape[2]
    low_mask = (1 << _ID_BITS) - 1

    def tile_step(t, best_key):
        # d2 tile: (B, VT) via per-dim diff-squares on the VPU.  NOT the
        # |q|^2 - 2 q.v + |v|^2 matmul: Mosaic lowers the K=3 MXU dot in
        # single-pass bf16 (~1e-2 abs error — observed), and the matmul
        # form also matches pytorch3d's diff formulation less exactly.
        d2 = jnp.zeros((q.shape[0], vt), jnp.float32)
        for d in range(3):
            diff = q[:, d : d + 1] - v_ref[t, d][None, :]
            d2 = d2 + diff * diff
        # d2 >= 0 exactly in this form -> IEEE bits are order-preserving;
        # replace the low mantissa bits with the vertex id and min-reduce
        # the packed key in one pass
        ids = jax.lax.broadcasted_iota(jnp.int32, (1, vt), 1) + t * vt
        bits = pltpu.bitcast(d2, jnp.int32)
        key = jnp.min((bits & ~low_mask) | ids, axis=-1)
        return jnp.minimum(best_key, key)

    best_key = jax.lax.fori_loop(
        0, n_tiles, tile_step,
        jnp.full((q.shape[0],), 0x7FFFFFFF, jnp.int32),
    )
    id_ref[:, :] = (best_key & low_mask).reshape(id_ref.shape)


@functools.partial(jax.jit, static_argnames=("interpret",))
def nearest_vertex_pallas(query: jnp.ndarray, verts: jnp.ndarray, interpret=False):
    """Pallas TPU 1-NN. Returns ``(dist2 (N,), ids (N,))``."""
    n = query.shape[0]
    nb = _round_up(max(n, 1), _QUERY_BLOCK)
    q = _pad_to(query.astype(jnp.float32), nb, 0.0)

    nv = _round_up(verts.shape[0], _VERT_TILE)
    if nv > (1 << _ID_BITS):
        raise ValueError(
            f"padded vertex count {nv} exceeds the {_ID_BITS}-bit id range "
            "of the packed-key kernel — use nearest_vertex_xla"
        )
    # pad with a far-away sentinel so padding never wins the argmin
    v = _pad_to(verts.astype(jnp.float32), nv, 1e8)
    v_tiles = v.reshape(-1, _VERT_TILE, 3).transpose(0, 2, 1)

    grid = nb // _QUERY_BLOCK
    ids = pl.pallas_call(
        _nn_kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((_QUERY_BLOCK, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(v_tiles.shape, lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((grid * 8, 128), jnp.int32),
        interpret=interpret,
    )(q, v_tiles)
    ids = ids.reshape(-1)[:n]
    # the packed key truncates d2's low mantissa bits — recompute the exact
    # distance from the winning id (O(N) gather vs O(N*V) matrix)
    diff = query.astype(jnp.float32) - v.reshape(-1, 3)[ids]
    d2_exact = jnp.sum(diff * diff, axis=-1)
    return d2_exact, ids


def nearest_vertex(query: jnp.ndarray, verts: jnp.ndarray):
    """Dispatch: Pallas on TPU, XLA elsewhere. Returns ``(dist2, ids)``.

    The packed-key kernel stores ids in 13 bits; vertex sets whose padded
    count exceeds 2^13 fall back to the XLA path (silent corruption
    otherwise).
    """
    nv = _round_up(verts.shape[0], _VERT_TILE)
    if jax.default_backend() == "tpu" and nv <= (1 << _ID_BITS):
        return nearest_vertex_pallas(query, verts)
    return nearest_vertex_xla(query, verts)


def knn_points(query: jnp.ndarray, verts: jnp.ndarray, k: int, block: int = 4096):
    """General exact K-NN (``dist2 (N, K), ids (N, K)``), blocked XLA.

    Used by the mesh-extraction carving path (K=5 normal-sidedness test,
    ref: extract_thuman_mesh.py:132-161).
    """
    n = query.shape[0]
    nb = _round_up(max(n, 1), block)
    q = _pad_to(query, nb, 0.0).reshape(-1, block, 3)
    v2 = jnp.sum(verts * verts, axis=-1)

    def one_block(qb):
        d2 = (
            jnp.sum(qb * qb, axis=-1, keepdims=True)
            - 2.0 * qb @ verts.T
            + v2[None, :]
        )
        neg, ids = jax.lax.top_k(-d2, k)
        return -neg, ids.astype(jnp.int32)

    d2, ids = jax.lax.map(one_block, q)
    return d2.reshape(-1, k)[:n], ids.reshape(-1, k)[:n]
