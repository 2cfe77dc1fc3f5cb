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
    """(K, ...) -> (N, ...): scatter back; non-taken rows get ``fill``."""
    vals = buf[plan.slot]
    take = plan.take.reshape(plan.take.shape + (1,) * (vals.ndim - 1))
    return jnp.where(take, vals, fill)


