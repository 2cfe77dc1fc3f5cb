"""Ray rendering: sampling -> model query -> compositing.

Behavioral reference: ``/root/reference/run_nerf_batch.py:85-135,401-444``
(``batchify_rays`` / ``render`` / ``render_rays``).

TPU-first: one jitted function renders a fixed-size ray block end-to-end
(sampling, warp, conditioning, MLP, compositing all fused by XLA); the
encoder latent is computed once outside and passed in.  Full-image rendering
pads the ray set to a multiple of the chunk and loops the same compiled
block — no per-chunk recompilation, no ragged shapes on device.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from mpsnerf_tpu.models.mps_nerf import MPSNeRF, RawOutput
from mpsnerf_tpu.ops.composite import (
    composite_rays, sample_pdf, stratified_z_vals,
)
from mpsnerf_tpu.smpl.model import SMPLModel


class RenderResult(NamedTuple):
    rgb_map: jnp.ndarray    # (R, 3)
    disp_map: jnp.ndarray   # (R,)
    acc_map: jnp.ndarray    # (R,)
    depth_map: jnp.ndarray  # (R,)
    weights: jnp.ndarray    # (R, S)
    raw: RawOutput          # per-sample structures, reshaped (R, S, ...)


def render_rays(
    model: MPSNeRF,
    variables: Any,
    smpl: SMPLModel,
    sp_input: Dict[str, Any],
    tp_input: Dict[str, Any],
    latent: jnp.ndarray,
    rays_o: jnp.ndarray,   # (R, 3)
    rays_d: jnp.ndarray,   # (R, 3)
    near: jnp.ndarray,     # (R,)
    far: jnp.ndarray,      # (R,)
    key: jax.Array,
    n_samples: int,
    perturb: float = 0.0,
    train: bool = False,
    compute_normals: bool = False,
    occupancy: bool = False,
    white_bkgd: bool = False,
    n_importance: int = 0,
) -> RenderResult:
    """Render one fixed-size block of rays (fully on device).

    ``n_importance > 0`` adds NeRF's hierarchical pass (section 5.2):
    importance-sample that many extra z values from the coarse weights
    (``sample_pdf``), merge-sort, and re-query the network at the union —
    one static-shape second pass, n_samples + n_importance final samples.
    The reference ACCEPTS N_importance but its render_rays never consumes
    it (run_nerf_batch.py:401-444 — no sample_pdf call, no fine query);
    this wires the op the reference left dead, default-off for parity.
    """
    r = rays_o.shape[0]
    if n_importance > 0:
        key, key_imp = jax.random.split(key)
    z_vals = stratified_z_vals(
        key, near[:, None], far[:, None], n_samples, perturb
    )  # (R, S)

    viewdirs = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)

    def query(pts, normals):
        vd = jnp.broadcast_to(viewdirs[:, None, :], pts.shape).reshape(-1, 3)
        return model.apply(
            variables, smpl, sp_input, tp_input, latent,
            pts.reshape(-1, 3), vd,
            train=train, compute_normals=normals, method="query",
        )

    coarse_dropped = None
    if n_importance > 0:
        pts = rays_o[:, None, :] + rays_d[:, None, :] * z_vals[..., None]
        # only the coarse WEIGHTS are consumed — skip the normals vjp
        coarse_raw: RawOutput = query(pts, False)
        coarse_dropped = getattr(coarse_raw, "n_dropped", None)
        coarse = composite_rays(
            coarse_raw.rgb.reshape(r, n_samples, 3),
            coarse_raw.sigma.reshape(r, n_samples),
            z_vals, rays_d, occupancy=occupancy, white_bkgd=white_bkgd,
        )
        mids = 0.5 * (z_vals[..., 1:] + z_vals[..., :-1])
        z_fine = sample_pdf(
            key_imp, mids, coarse.weights[..., 1:-1], n_importance,
            det=(perturb == 0.0),
        )
        z_vals = jnp.sort(
            jnp.concatenate([z_vals, jax.lax.stop_gradient(z_fine)], -1), -1
        )
        n_samples = n_samples + n_importance

    pts = rays_o[:, None, :] + rays_d[:, None, :] * z_vals[..., None]
    raw: RawOutput = query(pts, compute_normals)
    if (coarse_dropped is not None
            and getattr(raw, "n_dropped", None) is not None):
        # a truncated coarse pass corrupts fine sample placement even if
        # the fine query itself fits — surface BOTH passes' overflow
        raw = raw._replace(n_dropped=raw.n_dropped + coarse_dropped)

    out = composite_rays(
        raw.rgb.reshape(r, n_samples, 3),
        raw.sigma.reshape(r, n_samples),
        z_vals,
        rays_d,
        occupancy=occupancy,
        white_bkgd=white_bkgd,
    )

    raw_shaped = jax.tree.map(
        lambda x: (
            x.reshape((r, n_samples) + x.shape[1:])
            if x.ndim and x.shape[0] == r * n_samples
            else x  # scalar diagnostics (e.g. n_dropped)
        ),
        raw,
    )
    return RenderResult(
        rgb_map=out.rgb_map,
        disp_map=out.disp_map,
        acc_map=out.acc_map,
        depth_map=out.depth_map,
        weights=out.weights,
        raw=raw_shaped,
    )


def render_rays_mapped(
    model: MPSNeRF,
    variables: Any,
    smpl: SMPLModel,
    sp_input: Dict[str, Any],
    tp_input: Dict[str, Any],
    latent: jnp.ndarray,
    rays_o: jnp.ndarray,   # (N, 3) — N must be a multiple of chunk
    rays_d: jnp.ndarray,
    near: jnp.ndarray,
    far: jnp.ndarray,
    key: jax.Array,
    chunk: int,
    n_samples: int,
    with_dropped: bool = False,
    **kwargs,
):
    """Render many rays with an ON-DEVICE ``lax.map`` over fixed-size
    chunks — one dispatch for a whole image instead of one per chunk
    (the reference's host-side ``batchify_rays`` loop, and our own
    ``render_image``, pay a host round-trip per chunk; over a remote
    tunnel that dominates).  Returns (rgb (N, 3), disp (N,), acc (N,));
    with ``with_dropped`` a 4th element gives the max per-chunk
    compaction overflow (0 = no valid point was dropped anywhere)."""
    n = rays_o.shape[0]
    assert n % chunk == 0, (n, chunk)
    c = n // chunk

    def one(args):
        ro, rd, nr, fr, idx = args
        out = render_rays(
            model, variables, smpl, sp_input, tp_input, latent,
            ro, rd, nr, fr,
            jax.random.fold_in(key, idx),  # per-chunk keys: shared jitter
            n_samples, **kwargs,           # would band at chunk boundaries
        )
        return out.rgb_map, out.disp_map, out.acc_map, out.raw.n_dropped

    rgb, disp, acc, nd = jax.lax.map(
        one,
        (
            rays_o.reshape(c, chunk, 3),
            rays_d.reshape(c, chunk, 3),
            near.reshape(c, chunk),
            far.reshape(c, chunk),
            jnp.arange(c, dtype=jnp.int32),
        ),
    )
    outs = (rgb.reshape(n, 3), disp.reshape(n), acc.reshape(n))
    if with_dropped:
        return outs + (jnp.max(nd),)
    return outs


def render_rays_compact(
    model: MPSNeRF,
    variables: Any,
    smpl: SMPLModel,
    sp_input: Dict[str, Any],
    tp_input: Dict[str, Any],
    latent: jnp.ndarray,
    rays_o: jnp.ndarray,   # (R, 3)
    rays_d: jnp.ndarray,
    near: jnp.ndarray,     # (R,)
    far: jnp.ndarray,
    key: jax.Array,
    n_samples: int,
    capacity: int,         # static: global candidate buffer (multiple of tile)
    tile: int = 16384,     # static: tail tile size
    fine_capacity: int = 0,  # static: second-stage exact-mask buffer
    perturb: float = 0.0,
    train: bool = False,
    occupancy: bool = False,
    white_bkgd: bool = False,
    plan=None,       # optional precomputed Compaction (>= capacity slots)
    fine_plan=None,  # with fine_capacity: candidate->body Compaction
    fine_ids=None,   # with fine_capacity: (capacity,) nearest-vertex ids
):
    """Whole-image render with GLOBAL candidate compaction.

    The mapped per-chunk renderer pays the body-occupancy variance tax
    twice: every chunk carries tail capacity for the *worst* chunk, and
    every chunk re-runs the glue ops (sampling, cull, compaction plan) at
    chunk granularity.  Here the conservative body-grid cull and ONE
    cumsum compaction run over every sample of the image at once, the
    tail (1-NN, LBS warps, conditioning, MLP) runs via ``lax.map`` over
    fixed tiles of the *globally* compacted buffer — sized to the image's
    true candidate count, ~45% fewer tail slots than per-chunk capacity —
    and compositing runs once over the full (R, S) grid.

    Pixel-exact parity with the per-chunk path: non-candidates composite
    through the reference's masked raw = -80 fill, and candidates beyond
    the 5 cm mask are masked inside the tail query (the single-phase 1-NN
    branch).  Returns ``(rgb (R,3), disp (R,), acc (R,), n_dropped ())``;
    ``n_dropped > 0`` means ``capacity`` was too small and the image is
    NOT exact — callers must check (the eval runner re-renders at a
    larger capacity).

    Requires ``tp_input["body_grid"]`` (ops/body_grid.py) — unless a
    precomputed ``plan`` is supplied (``plan_rays_compact``), in which
    case the in-render cull + cumsum are skipped entirely: the eval
    runner's capacity pre-pass already built the plan, and recomputing it
    here was ~30% of per-view latency.  The supplied plan must cover the
    SAME deterministic sample set (same key, perturb=0).
    """
    from mpsnerf_tpu.ops.body_grid import grid_lookup
    from mpsnerf_tpu.ops.compact import (
        plan_compaction, resize_plan, compact, expand_scatter,
    )
    from mpsnerf_tpu.models.mps_nerf import MASK_FILL
    from mpsnerf_tpu.smpl.lbs import PoseTransforms, world_to_smpl

    assert capacity % tile == 0, (capacity, tile)
    r = rays_o.shape[0]
    z_vals = stratified_z_vals(
        key, near[:, None], far[:, None], n_samples, perturb
    )  # (R, S)
    pts = (
        rays_o[:, None, :] + rays_d[:, None, :] * z_vals[..., None]
    ).reshape(-1, 3)  # (M, 3)
    viewdirs = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    vd = jnp.broadcast_to(
        viewdirs[:, None, :], (r, n_samples, 3)
    ).reshape(-1, 3)

    tf_t = PoseTransforms.create(smpl, tp_input["params"])
    if plan is None:
        q = world_to_smpl(jax.lax.stop_gradient(pts), tf_t.R, tf_t.Th)
        cand = grid_lookup(tp_input["body_grid"], q).astype(jnp.int32)
        plan = plan_compaction(cand, capacity)
    else:
        plan = resize_plan(plan, capacity)
    n_dropped = jnp.maximum(plan.n_valid - capacity, 0).astype(jnp.int32)

    model_nc = (
        model.clone(compact_fraction=None)
        if model.compact_fraction is not None else model
    )

    if fine_capacity:
        # second stage: the conservative grid keeps ~1.35x more points
        # than the exact 5 cm test, so the tail can shrink to the true
        # body set.  The exact 1-NN mask + nearest-vertex ids come from
        # the ``fine_rays_compact`` pre-pass (sharing them here means the
        # tail tiles skip their internal 1-NN, and — like the coarse plan
        # — pre-pass/render divergence is impossible).
        assert fine_capacity % tile == 0, (fine_capacity, tile)
        assert fine_plan is not None and fine_ids is not None, (
            "fine_capacity > 0 requires the fine_rays_compact pre-pass "
            "outputs (fine_plan, fine_ids)"
        )
        from mpsnerf_tpu.ops.compact import (
            Compaction, resize_plan as _resize,
        )

        plan2 = _resize(fine_plan, fine_capacity)
        n_dropped = n_dropped + jnp.maximum(
            plan2.n_valid - fine_capacity, 0
        ).astype(jnp.int32)
        # composed fine -> full source rows: one fine_capacity-sized index
        # gather, then every compact/expand runs at fine granularity — no
        # capacity-sized intermediates, and the expand side is ONE scatter
        # of fine_capacity indices instead of two M-sized gathers (the
        # scatter-form expand makes the composed plan the cheap direction;
        # the gather-form measured the opposite in round 3)
        comp_idx = plan.gather_idx[plan2.gather_idx]  # (fine_capacity,)
        composed = Compaction(
            gather_idx=comp_idx, slot=plan.slot, take=plan.take,
            n_valid=plan2.n_valid,
        )
        # one (6,)-slice gather for pts+vd: TPU gather cost is per index,
        # not per byte, so fusing the two (3,) gathers halves it
        pv = jnp.concatenate([pts, vd], axis=-1)  # (M, 6)
        cpv = pv[comp_idx].reshape(-1, tile, 6)
        cpts = cpv[..., :3]
        cvd = cpv[..., 3:]
        cids = compact(plan2, fine_ids).reshape(-1, tile)

        def one_fine(args):
            p, v, i = args
            raw: RawOutput = model_nc.apply(
                variables, smpl, sp_input, tp_input, latent, p, v,
                train=train, nn_ids=i, method="query",
            )
            return raw.rgb, raw.sigma

        rgb_t, sig_t = jax.lax.map(one_fine, (cpts, cvd, cids))
        out_plan, out_cap = composed, fine_capacity
    else:
        pv = jnp.concatenate([pts, vd], axis=-1)  # (M, 6)
        cpv = compact(plan, pv).reshape(-1, tile, 6)
        cpts = cpv[..., :3]
        cvd = cpv[..., 3:]

        def one(args):
            p, v = args
            raw: RawOutput = model_nc.apply(
                variables, smpl, sp_input, tp_input, latent, p, v,
                train=train, method="query",
            )
            return raw.rgb, raw.sigma

        rgb_t, sig_t = jax.lax.map(one, (cpts, cvd))
        out_plan, out_cap = plan, capacity

    # ONE fused (K, 4) scatter-expand for rgb+sigma (4 scalar scatters of
    # K indices each beat the old pair of M-sized gather-expands; see
    # ops/compact.py:expand).  Must be expand_scatter, not expand: the
    # composed plan's slot/take still describe the coarse stage.
    raw4 = jnp.concatenate(
        [rgb_t.reshape(out_cap, 3), sig_t.reshape(out_cap, 1)], axis=-1
    )
    full4 = expand_scatter(out_plan, raw4, MASK_FILL)
    rgb_full = full4[:, :3]
    sig_full = full4[:, 3]

    out = composite_rays(
        rgb_full.reshape(r, n_samples, 3),
        sig_full.reshape(r, n_samples),
        z_vals,
        rays_d,
        occupancy=occupancy,
        white_bkgd=white_bkgd,
    )
    return out.rgb_map, out.disp_map, out.acc_map, n_dropped


def plan_rays_compact(
    smpl: SMPLModel,
    tp_input: Dict[str, Any],
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    near: jnp.ndarray,
    far: jnp.ndarray,
    key: jax.Array,
    n_samples: int,
    perturb: float = 0.0,
    cap_max: int | None = None,
):
    """Capacity pre-pass for :func:`render_rays_compact`: the body-grid
    cull + ONE full-size compaction plan over the view's deterministic
    sample set.  ``plan.n_valid`` is the exact candidate count (what the
    old count-only pre-pass returned) and the plan itself feeds the
    renderer via ``plan=``, which then skips its in-render cull + cumsum —
    the two passes share one plan, so pre-pass/render overflow divergence
    is impossible by construction.

    ``cap_max`` defaults to the full sample count (never drops).
    """
    from mpsnerf_tpu.ops.body_grid import grid_lookup
    from mpsnerf_tpu.ops.compact import plan_compaction
    from mpsnerf_tpu.smpl.lbs import PoseTransforms, world_to_smpl

    m = rays_o.shape[0] * n_samples
    z_vals = stratified_z_vals(
        key, near[:, None], far[:, None], n_samples, perturb
    )
    pts = (
        rays_o[:, None, :] + rays_d[:, None, :] * z_vals[..., None]
    ).reshape(-1, 3)
    tf_t = PoseTransforms.create(smpl, tp_input["params"])
    q = world_to_smpl(pts, tf_t.R, tf_t.Th)
    cand = grid_lookup(tp_input["body_grid"], q).astype(jnp.int32)
    return plan_compaction(cand, cap_max or m)


def fine_rays_compact(
    smpl: SMPLModel,
    tp_input: Dict[str, Any],
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    near: jnp.ndarray,
    far: jnp.ndarray,
    key: jax.Array,
    n_samples: int,
    plan,
    capacity: int,
    perturb: float = 0.0,
):
    """Stage-2 pre-pass: ONE exact 1-NN over the candidate buffer yields
    the true 5 cm body mask (the conservative grid keeps ~1.35x more
    points) plus the warp's nearest-vertex ids.  Returns
    ``(fine_plan, nn_ids)`` for :func:`render_rays_compact`'s
    ``fine_capacity`` mode: the tail then runs only on true body points
    and its tiles skip their internal 1-NN.

    ``capacity`` must be the same static bucket the render will use;
    ``fine_plan.n_valid`` is the exact body-point count (pick the
    fine_capacity bucket from it).
    """
    from mpsnerf_tpu.models.mps_nerf import HUMAN_DIST_THRESHOLD_SQ
    from mpsnerf_tpu.ops.compact import (
        compact as _compact, plan_compaction, resize_plan,
    )
    from mpsnerf_tpu.ops.knn import nearest_vertex
    from mpsnerf_tpu.smpl.lbs import PoseTransforms, world_to_smpl

    z_vals = stratified_z_vals(
        key, near[:, None], far[:, None], n_samples, perturb
    )
    pts = (
        rays_o[:, None, :] + rays_d[:, None, :] * z_vals[..., None]
    ).reshape(-1, 3)
    tf_t = PoseTransforms.create(smpl, tp_input["params"])
    plan_c = resize_plan(plan, capacity)
    q_c = world_to_smpl(_compact(plan_c, pts), tf_t.R, tf_t.Th)
    tar_smpl = world_to_smpl(tp_input["vertices"], tf_t.R, tf_t.Th)
    d2, nn_ids = nearest_vertex(q_c, tar_smpl)
    in_domain = (
        jax.lax.broadcasted_iota(jnp.int32, (capacity, 1), 0)[:, 0]
        < plan_c.n_valid
    )
    fine = ((d2 < HUMAN_DIST_THRESHOLD_SQ) & in_domain).astype(jnp.int32)
    return plan_compaction(fine, capacity), nn_ids


def render_image(
    render_chunk_fn,
    rays_o: np.ndarray,
    rays_d: np.ndarray,
    near: np.ndarray,
    far: np.ndarray,
    chunk: int,
    key: jax.Array,
):
    """Render arbitrarily many rays by looping a compiled fixed-size chunk.

    ``render_chunk_fn(rays_o, rays_d, near, far, key) -> (rgb, disp, acc)``
    must be a jitted function over (chunk,)-shaped ray blocks.  Rays are
    padded to a chunk multiple; padding is sliced off on host.
    """
    n = rays_o.shape[0]
    n_pad = ((n + chunk - 1) // chunk) * chunk

    def pad(x):
        return np.concatenate(
            [x, np.zeros((n_pad - n,) + x.shape[1:], x.dtype)], axis=0
        )

    ro, rd = pad(rays_o), pad(rays_d)
    nr, fr = pad(near), pad(far)
    outs = []
    for i in range(0, n_pad, chunk):
        key, sub = jax.random.split(key)
        outs.append(
            render_chunk_fn(
                jnp.asarray(ro[i : i + chunk]),
                jnp.asarray(rd[i : i + chunk]),
                jnp.asarray(nr[i : i + chunk]),
                jnp.asarray(fr[i : i + chunk]),
                sub,
            )
        )
    stacked = [np.concatenate([np.asarray(o[k]) for o in outs], 0)[:n]
               for k in range(3)]
    return stacked  # rgb (N,3), disp (N,), acc (N,)
