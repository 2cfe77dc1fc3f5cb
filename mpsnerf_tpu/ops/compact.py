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
    # gets the DISTINCT index n + slot: jax documents scatter behavior
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


