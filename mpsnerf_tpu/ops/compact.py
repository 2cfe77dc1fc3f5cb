"""Static-capacity masked compaction (gather valid rows, compute, expand).

The reference compacts query points with boolean indexing
(``smpl_query_pts[pts_mask==1]``, lib/skinnning_batch.py:364) — dynamic
shapes, impossible under jit.  The TPU-native equivalent: a cumsum-based
stable partition into a fixed-capacity buffer.  Valid rows beyond capacity
are dropped (they render as empty space); capacity 1.0 never drops.

Grad flows through the gather/scatter, so the compacted region trains
identically to full masked compute — at mask_fraction/capacity of the cost.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class Compaction(NamedTuple):
    gather_idx: jnp.ndarray  # (K,) source row for each buffer slot
    slot: jnp.ndarray        # (N,) buffer slot of each source row (clipped)
    take: jnp.ndarray        # (N,) bool: row is valid AND within capacity
    n_valid: jnp.ndarray     # () number of valid rows (pre-drop)
    # () valid rows LOST before slot assignment (only the two-level
    # plan's block-buffer overflow sets this; capacity overflow is the
    # separate n_valid-vs-capacity check).  Renderers fold it into
    # n_dropped so exactness asserts fire.
    n_lost: jnp.ndarray | int = 0


def plan_compaction(mask: jnp.ndarray, capacity: int) -> Compaction:
    """mask: (N,) int/bool validity. capacity: static K."""
    n = mask.shape[0]
    maski = mask.astype(jnp.int32)
    slot = jnp.cumsum(maski) - 1  # position among valid rows
    take = (maski > 0) & (slot < capacity)
    gather_idx = (
        jnp.zeros((capacity,), jnp.int32)
        .at[jnp.where(take, slot, capacity)]
        .set(jnp.arange(n, dtype=jnp.int32), mode="drop")
    )
    return Compaction(
        gather_idx=gather_idx,
        slot=jnp.clip(slot, 0, capacity - 1),
        take=take,
        n_valid=jnp.sum(maski),
    )


def resize_plan(plan: Compaction, capacity: int) -> Compaction:
    """Shrink a plan built at a larger capacity to ``capacity`` slots.

    Valid because the partition is stable: slot assignments below the new
    capacity are identical to what ``plan_compaction(mask, capacity)``
    would produce, so a pre-pass can build ONE full-capacity plan and the
    renderer can consume it at any bucket — no second cumsum, and the
    pre-pass count and the render share the same plan by construction
    (overflow divergence is impossible).
    """
    k = plan.gather_idx.shape[0]
    assert capacity <= k, (capacity, k)
    if capacity == k:
        return plan
    return Compaction(
        gather_idx=plan.gather_idx[:capacity],
        slot=jnp.minimum(plan.slot, capacity - 1),
        take=plan.take & (plan.slot < capacity),
        n_valid=plan.n_valid,
        n_lost=plan.n_lost,
    )


def compact(plan: Compaction, x: jnp.ndarray) -> jnp.ndarray:
    """(N, ...) -> (K, ...): gather valid rows (junk in unused slots)."""
    return x[plan.gather_idx]


def expand(plan: Compaction, buf: jnp.ndarray, fill) -> jnp.ndarray:
    """(K, ...) -> (N, ...): scatter back; non-taken rows get ``fill``.

    Two formulations, picked by a measured cost model (v5e):
      * scatter: each *valid* buffer slot writes its value to its source
        row of a fill-initialized output — K indices per channel, but the
        channels must go as SEPARATE scalar scatters (a (K, C)-slice
        scatter lowers pathologically on TPU: ~94 ns/idx vs ~6 for
        scalar), so cost ~ 6ns * K * C.
      * gather: ``where(take, buf[plan.slot], fill)`` — N indices, but
        one fused pass serves every channel, cost ~ 7ns * N.
    Break-even at K*C ~ N; the eval renderer (K/N ~ 0.16, C = 4) takes
    the scatter form (44 vs 78 ms measured), wide/dense expands (e.g.
    24-channel blend weights at K/N ~ 0.5) keep the gather form.

    Gradients are identical between the forms: every valid slot maps to
    exactly one taken row (stable partition), so d/dbuf is the same
    one-row gather either way.
    """
    k = buf.shape[0]
    n = plan.slot.shape[0]
    channels = 1
    for d in buf.shape[1:]:
        channels *= d
    if 6 * k * channels > 7 * n:
        return expand_gather(plan, buf, fill)
    return expand_scatter(plan, buf, fill)


def expand_scatter(plan: Compaction, buf: jnp.ndarray, fill) -> jnp.ndarray:
    """Scatter formulation of :func:`expand` (see its docstring).

    Only reads ``gather_idx``/``n_valid`` (+ ``slot``'s length for N), so
    it is also the ONLY valid expand for *composed* plans (fine∘coarse,
    renderer/render.py) whose ``slot``/``take`` still describe the coarse
    stage — ``expand_gather`` on such a plan is silently wrong.
    """
    k = buf.shape[0]
    n = plan.slot.shape[0]
    channels = 1
    for d in buf.shape[1:]:
        channels *= d
    # unused slots (>= n_valid, or beyond a resize_plan cut) hold junk
    # gather_idx — route them out of bounds to drop.  Every dropped slot
    # (including the two-level plan's sentinel slots, which already hold
    # n) gets the DISTINCT index n + slot: jax documents scatter behavior
    # as undefined when the unique_indices promise is violated, so
    # duplicate n's may not rely on mode='drop' discarding them.  idx
    # stays sorted: the kept prefix is increasing and < n, and from the
    # first dropped slot onward values are n + slot, strictly increasing.
    ar = jnp.arange(k, dtype=jnp.int32)
    valid = ar < jnp.minimum(plan.n_valid, k)
    idx = jnp.where(valid, plan.gather_idx, n)
    idx = jnp.where(idx < n, idx, n + ar)
    flat = buf.reshape(k, channels)
    cols = []
    for c in range(channels):
        full = jnp.full((n,), fill, buf.dtype)
        cols.append(
            full.at[idx].set(
                flat[:, c], mode="drop",
                indices_are_sorted=True, unique_indices=True,
            )
        )
    out = (
        cols[0] if channels == 1
        else jnp.stack(cols, axis=-1)
    )
    return out.reshape((n,) + buf.shape[1:])


def expand_gather(plan: Compaction, buf: jnp.ndarray, fill) -> jnp.ndarray:
    """Gather formulation of :func:`expand` (N gather indices).  Kept as
    the parity oracle for the scatter form and for callers whose K ~ N."""
    vals = buf[plan.slot]
    take = plan.take.reshape(plan.take.shape + (1,) * (vals.ndim - 1))
    return jnp.where(take, vals, fill)


def plan_compaction_blocks(
    mask: jnp.ndarray, capacity: int, block: int = 8
) -> Compaction:
    """Block-padded SUPERSET plan: keeps every aligned length-``block``
    run of rows that contains >= 1 valid row — the whole run, including
    its invalid rows.

    Why: :func:`plan_compaction`'s ``gather_idx`` costs an N-sized
    scatter (~74 ms at the 12.2M-sample eval workload, ~6 ns/idx on
    v5e); here the cumsum + scatter run at N/block granularity and the
    row-level ``gather_idx``/``slot``/``take`` are broadcasts.  The
    price is capacity inflation (~1.25-1.4x for contiguous in-body runs
    of ~33 samples at block=8), so callers must either re-mask
    downstream (``take`` is exact block membership, a superset of
    ``mask``) or compose with :func:`plan_compaction` at buffer
    granularity (see :func:`plan_compaction_two_level`).

    ``n_valid`` counts kept SLOTS (block-padded), not true valid rows.
    """
    n = mask.shape[0]
    assert n % block == 0 and capacity % block == 0, (n, capacity, block)
    mb = jnp.max(mask.astype(jnp.int32).reshape(-1, block), axis=1)
    bplan = plan_compaction(mb, capacity // block)
    ar = jnp.arange(block, dtype=jnp.int32)[None, :]
    return Compaction(
        gather_idx=(bplan.gather_idx[:, None] * block + ar).reshape(-1),
        slot=(bplan.slot[:, None] * block + ar).reshape(-1),
        take=jnp.broadcast_to(
            bplan.take[:, None], (n // block, block)
        ).reshape(-1),
        n_valid=bplan.n_valid * block,
    )


def plan_compaction_two_level(
    mask: jnp.ndarray, capacity: int, block_capacity: int, block: int = 8
) -> Compaction:
    """EXACT plan built in two cheap levels instead of one N-sized one.

    Level 1: :func:`plan_compaction_blocks` (superset, N/block-sized
    ops).  Level 2: an exact :func:`plan_compaction` over the
    block-compacted mask — its scatter runs at ``block_capacity`` size
    (the block-padded candidate bound, ~3.4M at the eval workload)
    instead of N (12.2M).  The composition produces the same stable
    partition as ``plan_compaction(mask, capacity)``: kept blocks
    preserve row order, so valid rows appear in source order in the
    block-compacted buffer.

    Returns a plan whose ``gather_idx``/``n_valid`` equal the exact
    plan's; ``slot``/``take`` are exact too (mapped back through the
    block layer).  ``n_valid`` is computed from the FULL mask (not the
    block buffer), and a ``block_capacity`` overflow — kept blocks
    beyond it are dropped and their valid rows lost — is reported in
    ``n_lost`` (callers fold it into their n_dropped exactness checks).

    ``gather_idx`` is composed at ``min(capacity, block_capacity)``
    slots (every valid row lives inside the block buffer; composing at
    full capacity would cost the N-sized gather this function exists to
    avoid) and then PADDED with the drop sentinel ``n`` to the full
    ``capacity`` length, so callers can ``resize_plan`` to any bucket
    exactly as with :func:`plan_compaction`.  Slots beyond the true
    valid count also hold ``n`` (not junk): under block-buffer overflow
    ``n_valid`` exceeds the rows actually planned, and sentinel slots
    keep :func:`expand_scatter`'s sorted/unique-indices promises honest
    (they route to the dropped write) instead of scattering duplicate
    junk rows before the caller's n_dropped check fires.
    """
    n = mask.shape[0]
    bplan = plan_compaction_blocks(mask, block_capacity, block)
    maski = mask.astype(jnp.int32)
    mask_c = jnp.where(
        jnp.arange(block_capacity, dtype=jnp.int32)
        < jnp.minimum(bplan.n_valid, block_capacity),
        maski[bplan.gather_idx],
        0,
    )
    eff = min(capacity, block_capacity)
    inner = plan_compaction(mask_c, eff)
    # compose: buffer slot -> block-buffer row -> source row; slots
    # beyond the PLANNED count get the sentinel n (dropped by expand)
    gather_idx = jnp.where(
        jnp.arange(eff, dtype=jnp.int32) < inner.n_valid,
        bplan.gather_idx[inner.gather_idx],
        n,
    )
    if capacity > eff:
        gather_idx = jnp.pad(
            gather_idx, (0, capacity - eff), constant_values=n
        )
    # row-level slot/take: route each source row through its block slot
    slot_c = inner.slot[jnp.clip(bplan.slot, 0, block_capacity - 1)]
    take = bplan.take & inner.take[
        jnp.clip(bplan.slot, 0, block_capacity - 1)
    ] & (maski > 0)
    # kept-block slots beyond the block buffer never reach the inner
    # plan: their valid rows are sum(mask) - sum(mask_c)
    return Compaction(
        gather_idx=gather_idx,
        slot=jnp.where(take, slot_c, jnp.clip(slot_c, 0, capacity - 1)),
        take=take,
        n_valid=jnp.sum(maski),
        n_lost=jnp.sum(maski) - jnp.sum(mask_c),
    )


