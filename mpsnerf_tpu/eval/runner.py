"""Eval orchestration: jitted full-view renderer + dataset protocols.

Behavioral reference: the test wiring in ``run_nerf_batch.py:499-519``
(eval-only mode) and 620-647 (periodic eval), plus the dataset windows of
``test_THuman_ssim`` (all_test.py:54-99: held-out humans = list indices
25:30, start poses [20, 24, 27, 25, 28], novel views [1,5,7,11,13,17,19,23],
512x512) and ``test_H36M`` (all_test.py:310-360: per-subject pose tables,
novel view = camera 3, masked-ray rendering).
"""

from __future__ import annotations

from typing import Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from mpsnerf_tpu.models.mps_nerf import MPSNeRF
from mpsnerf_tpu.renderer.render import render_rays
from mpsnerf_tpu.train.trainer import to_device_input
from mpsnerf_tpu.eval.protocol import evaluate_novel_view_pose

THUMAN_NOVEL_VIEWS = [1, 5, 7, 11, 13, 17, 19, 23]
THUMAN_START_POSES = [20, 24, 27, 25, 28]
THUMAN_TEST_RANGE = (25, 30)

# test_H36M per-subject tables (ref all_test.py:316-322): pose counts,
# novel-view window sizes, input poses, and novel-pose start frames for
# subjects S1..S11
H36M_SUBJECTS = ["S1", "S5", "S6", "S7", "S8", "S9", "S11"]
H36M_ROOTS = [f"./data/h36m/{s}/Posing" for s in H36M_SUBJECTS]
H36M_POSES_NUM = [49, 127, 83, 200, 87, 133, 82]
H36M_NOVEL_VIEW_POSES_NUM = [150, 250, 150, 300, 250, 260, 200]
H36M_INPUT_POSE = [250, 30, 1050, 820, 370, 20, 20]
H36M_START_POSE = [750, 1250, 750, 1500, 1250, 1300, 1000]
H36M_NOVEL_VIEW = [3]


class DatasetWindow:
    """Lazy item sequence over a dataset window — eval protocols iterate
    items once; materializing hundreds of full-res items up front (the
    H36M novel-view window is 150-300 poses of 4x1000x1000 images) would
    need tens of GB."""

    def __init__(self, dataset, n: int):
        self.dataset = dataset
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        if isinstance(i, slice):
            start, stop, step = i.indices(self.n)
            assert step == 1
            return _ShiftedWindow(self, start, stop)
        if not 0 <= i < self.n:
            raise IndexError(i)
        return self.dataset[i]

    def __iter__(self):
        for i in range(self.n):
            yield self[i]


class _ShiftedWindow:
    def __init__(self, base, start, stop):
        self.base, self.start, self.stop = base, start, stop

    def __len__(self):
        return self.stop - self.start

    def __iter__(self):
        for i in range(self.start, self.stop):
            yield self.base[i]


class _PendingView:
    """Handle for an in-flight :meth:`ViewRenderer.render_view_async`.

    ``done`` set => already a finished (H*W, 3) host array (chunked
    fallback path); otherwise ``out`` holds the global path's device
    outputs awaiting the fetch in :meth:`ViewRenderer.finish_view`."""

    __slots__ = ("out", "n", "meta", "sel", "n_total", "done", "fill")

    def __init__(self, out=None, n=0, meta=(), sel=None, n_total=0,
                 done=None, fill=0.0):
        self.out = out
        self.n = n
        self.meta = meta
        self.sel = sel
        self.n_total = n_total
        self.done = done
        # background value for skipped (box-culled) rays: such rays miss
        # the body AABB, so the uncompacted render would composite them to
        # the exact background — 1.0 under white_bkgd, else 0.0
        self.fill = fill


class ViewRenderer:
    """Renders full eval views through a compiled fixed-size ray chunk.

    Rays are SHUFFLED with a fixed permutation before chunking: full-image
    scan order makes chunk validity bimodal (body chunks run up to ~40%
    in-body samples vs ~6% mean — measured), which would overflow a tight
    compaction capacity; shuffling equalizes every chunk to the mean so
    ``eval_compact_fraction`` (default 0.125, ~2x headroom) never drops
    points.  Outputs are inverse-permuted.
    """

    def __init__(
        self,
        model: MPSNeRF,
        smpl_selector: Callable,  # gender int -> SMPLModel
        chunk: int = 4096,
        n_samples: int = 128,
        n_importance: int = 0,
        white_bkgd: bool = False,
        eval_compact_fraction: float = 0.125,
        shuffle_rays: bool = True,
        global_compact: bool = True,
        tile: int = 16384,
        fine: bool = True,      # stage-2 exact-mask pre-pass (see prewarm)
        box_cull: bool = True,  # render only AABB-hit rays (exact)
    ):
        # the global-compaction path's semantics REQUIRE the flagship's
        # human-region mask: it evaluates only body-grid candidates and
        # fills the rest with the 5 cm mask's exact -80 (MASK_FILL), and
        # its fine stage precomputes MPSNeRF's nearest-vertex ids.  A
        # model without that mask (human_sample off, or the numpy-era
        # correction family) evaluates the network at EVERY sample in
        # the reference, so it must take the chunked uncompacted path.
        if global_compact and not (
            isinstance(model, MPSNeRF)
            and getattr(model, "human_sample", False)
        ):
            global_compact = False
            box_cull = False  # the AABB cull's exactness proof also
            #                   rests on the -80 mask semantics
        if n_importance > 0:
            # the global-compaction plan covers only the stratified z
            # ladder; the hierarchical union must take the chunked path
            global_compact = False
        self.fine = fine
        self.box_cull = box_cull
        if (
            eval_compact_fraction is not None
            and model.compact_fraction is not None
        ):
            model = model.clone(compact_fraction=eval_compact_fraction)
        self.model = model
        self.smpl_selector = smpl_selector
        self.chunk = chunk
        self.n_samples = n_samples
        self.n_importance = n_importance
        self.white_bkgd = white_bkgd
        self.shuffle_rays = shuffle_rays

        model_ = model
        n_samples_ = n_samples
        n_imp_ = n_importance
        white_ = white_bkgd

        @jax.jit
        def chunk_fn(variables, smpl, sp, tp, latent, ro, rd, nr, fr):
            out = render_rays(
                model_, variables, smpl, sp, tp, latent, ro, rd, nr, fr,
                jax.random.PRNGKey(0), n_samples=n_samples_, perturb=0.0,
                train=False, white_bkgd=white_, n_importance=n_imp_,
            )
            return out.rgb_map, out.acc_map, out.raw.n_dropped

        self._chunk_fn = chunk_fn

        # overflow fallback: an uncompacted variant of the same chunk —
        # exact reference semantics at any in-body density.  Compiled only
        # if a chunk ever reports n_dropped > 0 (a close-up view can exceed
        # the ~6%-in-body assumption behind eval_compact_fraction).
        model_nc = (
            model.clone(compact_fraction=None)
            if model.compact_fraction is not None else model
        )

        @jax.jit
        def chunk_fn_nc(variables, smpl, sp, tp, latent, ro, rd, nr, fr):
            out = render_rays(
                model_nc, variables, smpl, sp, tp, latent, ro, rd, nr, fr,
                jax.random.PRNGKey(0), n_samples=n_samples_, perturb=0.0,
                train=False, white_bkgd=white_, n_importance=n_imp_,
            )
            return out.rgb_map, out.acc_map, out.raw.n_dropped

        self._chunk_fn_nc = chunk_fn_nc
        self.n_overflow_chunks = 0  # diagnostic counter across renders

        @jax.jit
        def encode_fn(variables, images):
            return model_.apply(variables, images, train=False,
                                method="encode")

        self._encode_fn = encode_fn

        # ---- global-compaction whole-image path (render_rays_compact):
        # one conservative body-grid cull + ONE compaction over every
        # sample of the view.  The pre-pass builds the FULL compaction
        # plan (plan_rays_compact); the render consumes it resized to the
        # chosen capacity bucket, skipping its in-render cull + cumsum —
        # and because both passes share one plan, capacity >= n_valid
        # makes overflow impossible by construction.
        self.global_compact = global_compact
        self.tile = tile

        if global_compact:
            import functools

            from mpsnerf_tpu.renderer.render import (
                fine_rays_compact, plan_rays_compact, render_rays_compact,
            )

            @functools.partial(
                jax.jit, static_argnames=("capacity", "fine_capacity",
                                          "tile_")
            )
            def global_fn(variables, smpl, sp, tp, latent, ro, rd, nr, fr,
                          plan, fplan, fids, capacity, fine_capacity,
                          tile_):
                return render_rays_compact(
                    model_, variables, smpl, sp, tp, latent,
                    ro, rd, nr, fr, jax.random.PRNGKey(0),
                    n_samples=n_samples_, capacity=capacity, tile=tile_,
                    fine_capacity=fine_capacity,
                    perturb=0.0, train=False, white_bkgd=white_,
                    plan=plan, fine_plan=fplan, fine_ids=fids,
                )

            @jax.jit
            def plan_fn(smpl, tp, ro, rd, nr, fr):
                return plan_rays_compact(
                    smpl, tp, ro, rd, nr, fr, jax.random.PRNGKey(0),
                    n_samples=n_samples_, perturb=0.0,
                )

            @functools.partial(jax.jit, static_argnames=("capacity",))
            def fine_fn(smpl, tp, ro, rd, nr, fr, plan, capacity):
                return fine_rays_compact(
                    smpl, tp, ro, rd, nr, fr, jax.random.PRNGKey(0),
                    n_samples=n_samples_, plan=plan, capacity=capacity,
                    perturb=0.0,
                )

            self._global_fn = global_fn
            self._plan_fn = plan_fn
            self._fine_fn = fine_fn

    # geometric ladder factor for capacity buckets.  sqrt(2) trades at
    # most 41% slack (mean ~18%) for FAR fewer distinct buckets than the
    # round-2 1.26 ladder: each jitted (capacity, fine_capacity) pair is
    # a full XLA compile of the render (~minutes cold through the
    # tunnel), and view-to-view candidate drift within one protocol then
    # almost always stays inside one bucket.
    LADDER = 1.414

    def _bucket_neighbors(self, count: int, spread: int = 1):
        """The ladder bucket for ``count`` plus ``spread`` neighbours on
        EACH side (prewarm: view-to-view counts drift both ways)."""
        ladder, c = [], 1
        while c * self.tile < self._capacity_bucket(count) * 2:
            ladder.append(c * self.tile)
            c = max(c + 1, int(np.ceil(c * self.LADDER)))
        ladder.append(c * self.tile)
        center = ladder.index(self._capacity_bucket(count))
        lo = max(0, center - spread)
        return ladder[lo:center + spread + 1]

    def _capacity_bucket(self, count: int) -> int:
        """Smallest ladder bucket >= count (tile multiples).  The count
        pre-pass is exact (same deterministic sample set as the render)
        and the render consumes the pre-pass's own plan, so no headroom
        factor is needed and overflow cannot occur."""
        need = max(1, int(np.ceil(count / self.tile)))
        c = 1
        while c < need:
            c = max(c + 1, int(np.ceil(c * self.LADDER)))
        return c * self.tile

    def _latent_for(self, variables, sp_item):
        # the latent cache lives ON the item dict: id()-keyed caching is
        # unsafe with lazy windows (freed dicts' addresses get reused and
        # a stale latent would render with the wrong source encoding)
        cached = sp_item.get("_latent_cache")
        if cached is None:
            cached = self._encode_fn(
                variables, jnp.asarray(sp_item["img_all"])
            )
            sp_item["_latent_cache"] = cached
        return cached

    @classmethod
    def _pad_rays_host(cls, ro, rd, nr, fr):
        """Pad the ray count to the next power-of-2 multiple of 4096:
        every distinct padded size is a fresh XLA compile of
        plan/fine/render, and with the per-view box cull ray counts vary
        view to view — the coarse ladder makes a whole protocol share ONE
        ray shape (hit counts drift far less than 2x).  Padding rays sit
        far outside the body grid: zero candidates (so they never cost
        tail slots), composite to background, sliced off by the caller.
        Returns HOST arrays (see :meth:`_pad_rays` for device copies)."""
        n = ro.shape[0]
        c = 1
        while c * 4096 < n:
            c *= 2
        n_pad = c * 4096

        def pad(x, fill):
            if n_pad == n:
                return x
            p = np.full((n_pad - n,) + x.shape[1:], fill, x.dtype)
            return np.concatenate([x, p])

        ro_h = pad(ro, 1e6)
        rd_h = (
            pad(rd, 0.0) if n_pad == n else np.concatenate(
                [rd, np.tile(np.array([1.0, 0, 0], rd.dtype),
                             (n_pad - n, 1))]
            )
        )
        return ro_h, rd_h, pad(nr, 0.0), pad(fr, 1.0)

    @classmethod
    def _pad_rays(cls, ro, rd, nr, fr):
        """Device copies of :meth:`_pad_rays_host`."""
        return tuple(
            jnp.asarray(x) for x in cls._pad_rays_host(ro, rd, nr, fr)
        )

    def _dispatch_rays_global(
        self, variables, smpl, sp, tp, latent, ro, rd, nr, fr,
    ):
        """ENQUEUE a whole-view render on the global-compaction path and
        return ``(out_device, n, (count, cap, fcap))`` without
        fetching the image.  The two small ``int(n_valid)`` syncs (the
        host picks the static capacity buckets) stay here; the ~3 MB rgb
        fetch is deferred to :meth:`finish_view` so a pipelined caller can
        keep the device busy on this view while fetching + post-processing
        the previous one."""
        n = ro.shape[0]
        ro_d, rd_d, nr_d, fr_d = self._pad_rays(ro, rd, nr, fr)

        plan = self._plan_fn(smpl, tp, ro_d, rd_d, nr_d, fr_d)
        count = int(plan.n_valid)
        cap = self._capacity_bucket(count)
        if self.fine:
            # stage-2 pre-pass: exact 5 cm mask + nearest-vertex ids, so
            # the tail runs only true body points (~1.22x fewer) and
            # skips its internal 1-NN (measured +9% over the grid-only
            # path at 512^2 with the composed-plan render,
            # bench MPSNERF_BENCH_FINE=0 to compare)
            fplan, fids = self._fine_fn(
                smpl, tp, ro_d, rd_d, nr_d, fr_d, plan, capacity=cap
            )
            fcap = self._capacity_bucket(int(fplan.n_valid))
        else:
            fplan = fids = None
            fcap = 0
        out = self._global_fn(
            variables, smpl, sp, tp, latent, ro_d, rd_d, nr_d, fr_d,
            plan, fplan, fids, capacity=cap, fine_capacity=fcap,
            tile_=self.tile,
        )
        return out, n, (count, cap, fcap)

    def _view_ray_mask(self, tp_item, k, ray_mask=None):
        """Effective ray mask for a view.  With ``box_cull`` (default),
        rays that miss the body AABB are skipped: they provably composite
        to the exact background (every sample fails the 5 cm mask -> -80
        fill -> rgb 0, plus the white term when white_bkgd) — the same
        pre-masking the reference applies on H36M (all_test.py:384-387),
        applied everywhere because the reassembly fill matches the
        background color (finish_view), so the output is pixel-identical
        and ~2.7x fewer rays execute at 512^2."""
        if (
            ray_mask is None and self.box_cull
            and "mask_at_box_all" in tp_item
        ):
            return np.asarray(tp_item["mask_at_box_all"][k]).reshape(-1)
        return ray_mask

    def _prep_view(self, variables, sp_item, tp_item, k, ray_mask=None):
        """Item dicts -> device inputs + the view's ray arrays (shared by
        render_view and prewarm)."""
        if "body_grid" not in tp_item and "feature" in tp_item:
            from mpsnerf_tpu.data import attach_body_grid

            attach_body_grid(tp_item)
        if self.model.correction_field:
            from mpsnerf_tpu.data import attach_spconv_plan

            canonical = bool(getattr(self.model, "canonical_grid", False))
            for it in (tp_item, sp_item):
                if "spconv_plan" not in it and "coord" in it:
                    attach_spconv_plan(it, canonical=canonical)
        # upload ONLY what the device render reads.  The per-view ray/rgb
        # stacks are huge ((24, H*W, 3) each at full res, ~70 MB/item) and
        # consumed exclusively on host (sliced per view below) — shipping
        # them through the tunnel was the hidden ~2 s first-view-per-item
        # cost the round-2 latency artifact blamed on recompiles.
        skip = (
            "msk_all", "_latent_cache", "_device_cache", "ray_o_all",
            "ray_d_all", "rgb_all", "near_all", "far_all",
            "mask_at_box_all", "bkgd_msk_all", "msk_cihp_all", "o_img_all",
        )

        def device_side(item):
            # cache ON the item dict (like _latent_cache): uploading the
            # item's device arrays costs ~0.3 s/call over the tunnel and
            # a protocol renders each item up to 8 times.  Rebuild when
            # the item gained keys since the cache was built: an item
            # first uploaded as a SOURCE (no body_grid attached) can
            # later be a TARGET of the novel-view pass — attach_body_grid
            # then extends the dict but a stale cache would miss the key
            # (KeyError inside the jitted plan pre-pass).
            need = {
                kk for kk in item
                if kk not in skip and not kk.startswith("_")
            }
            cached = item.get("_device_cache")
            if cached is None:
                cached = to_device_input({kk: item[kk] for kk in need})
                item["_device_cache"] = cached
            elif not need <= cached.keys():
                # upload ONLY the new keys and merge — re-shipping the
                # whole item costs ~0.3 s over the tunnel
                cached = dict(cached)
                cached.update(to_device_input(
                    {kk: item[kk] for kk in need - cached.keys()}
                ))
                item["_device_cache"] = cached
            return cached

        sp = device_side(sp_item)
        tp = device_side(tp_item)
        smpl = self.smpl_selector(int(sp_item["gender"]))
        latent = self._latent_for(variables, sp_item)

        ro = np.asarray(tp_item["ray_o_all"][k], np.float32)
        rd = np.asarray(tp_item["ray_d_all"][k], np.float32)
        nr = np.asarray(tp_item["near_all"][k], np.float32).reshape(-1)
        fr = np.asarray(tp_item["far_all"][k], np.float32).reshape(-1)

        n_total = ro.shape[0]
        sel = None
        if ray_mask is not None:
            sel = np.flatnonzero(ray_mask.reshape(-1))
            ro, rd, nr, fr = ro[sel], rd[sel], nr[sel], fr[sel]
        return smpl, sp, tp, latent, ro, rd, nr, fr, sel, n_total

    def prewarm(self, variables, sp_item: Dict, tp_item: Dict, k: int = 0,
                extra_buckets: int = 1) -> List[int]:
        """Compile the global path's predicted capacity bucket(s) before a
        protocol run: the count pre-pass on view ``k`` picks the bucket,
        and ``extra_buckets`` neighbours up the ladder are compiled too
        (view-to-view candidate counts drift within ~1 bucket).  Without
        this a mid-protocol bucket change recompiles inside the timed
        loop — a single 10x per-view latency outlier (round-2
        eval_latency artifact).  Returns the compiled capacities."""
        if not (self.global_compact and (
            "body_grid" in tp_item or "feature" in tp_item
        )):
            return []
        (smpl, sp, tp, latent, ro, rd, nr, fr, _, _) = (
            self._prep_view(
                variables, sp_item, tp_item, k,
                self._view_ray_mask(tp_item, k),
            )
        )
        ro_d, rd_d, nr_d, fr_d = self._pad_rays(ro, rd, nr, fr)
        plan = self._plan_fn(smpl, tp, ro_d, rd_d, nr_d, fr_d)
        count = int(plan.n_valid)
        caps = self._bucket_neighbors(count, spread=extra_buckets)
        center_cap = self._capacity_bucket(count)
        warmed = []
        for cap in caps:
            if self.fine:
                fplan, fids = self._fine_fn(
                    smpl, tp, ro_d, rd_d, nr_d, fr_d, plan, capacity=cap
                )
                # fine counts drift with the pose silhouette; warm the
                # neighbourhood at the CENTER cap (where the protocol
                # lives) and the diagonal pair at the others — drift
                # rarely moves both ladders at once
                if cap == center_cap:
                    fcaps = self._bucket_neighbors(
                        int(fplan.n_valid), spread=extra_buckets
                    )
                else:
                    fcaps = [self._capacity_bucket(int(fplan.n_valid))]
                fcaps = [f for f in fcaps if f <= cap]
            else:
                fplan = fids = None
                fcaps = [0]
            for fcap in fcaps:
                out = self._global_fn(
                    variables, smpl, sp, tp, latent,
                    ro_d, rd_d, nr_d, fr_d,
                    plan, fplan, fids, capacity=cap, fine_capacity=fcap,
                    tile_=self.tile,
                )
                jax.block_until_ready(out)
                warmed.append((cap, fcap))
        return warmed

    def render_view_async(self, variables, sp_item: Dict, tp_item: Dict,
                          k: int, ray_mask: Optional[np.ndarray] = None):
        """Dispatch the render of target view ``k`` and return a pending
        handle for :meth:`finish_view`.  On the global-compaction path the
        device render is enqueued but the (H*W, 3) image is NOT fetched —
        a caller can dispatch view k+1 before finishing view k, so host
        work (the ~3 MB tunnel fetch, SSIM, PNG writes, GT loads) overlaps
        the next view's device render (eval is otherwise serial: the
        device idles during every metric computation).  The chunked
        fallback path is inherently host-looped and completes eagerly;
        its handle is already finished — pipelined callers degrade to the
        sequential behavior, not to an error."""
        explicit_mask = ray_mask is not None
        ray_mask = self._view_ray_mask(tp_item, k, ray_mask)
        # box-culled rays reassemble to the exact background color; rays
        # skipped by an EXPLICIT caller mask keep the reference's 0 fill
        # (H36M masked-ray mode, all_test.py:384-387)
        fill = 1.0 if (self.white_bkgd and not explicit_mask) else 0.0
        (smpl, sp, tp, latent, ro, rd, nr, fr, sel, n_total) = (
            self._prep_view(variables, sp_item, tp_item, k, ray_mask)
        )

        if self.global_compact and "body_grid" in tp_item:
            out, n, meta = self._dispatch_rays_global(
                variables, smpl, sp, tp, latent, ro, rd, nr, fr,
            )
            return _PendingView(
                out=out, n=n, meta=meta, sel=sel, n_total=n_total,
                fill=fill,
            )
        rgb = self._render_view_chunked(
            variables, smpl, sp, tp, latent, ro, rd, nr, fr, sel, n_total,
            ray_mask, fill,
        )
        return _PendingView(done=rgb)

    def finish_view(self, pending: "_PendingView") -> np.ndarray:
        """Fetch + post-process a :meth:`render_view_async` handle."""
        if pending.done is not None:
            return pending.done
        n_dropped = int(pending.out[3])
        # the render consumes the pre-passes' OWN plans resized to
        # buckets >= their n_valid, so dropping is structurally impossible
        assert n_dropped == 0, (n_dropped,) + pending.meta
        rgb = np.asarray(pending.out[0])[: pending.n]
        if pending.sel is not None:
            full = np.full((pending.n_total, 3), pending.fill, np.float32)
            full[pending.sel] = rgb
            return full
        return rgb

    def render_view(self, variables, sp_item: Dict, tp_item: Dict, k: int,
                    ray_mask: Optional[np.ndarray] = None) -> np.ndarray:
        """Render target view ``k`` of ``tp_item`` conditioned on
        ``sp_item``.  Returns (H*W, 3) float.  ``ray_mask`` restricts
        rendering to masked rays (H36M masked-ray mode, all_test.py:384-387);
        pixels outside an explicit mask return 0 (reference semantics);
        pixels skipped by the internal box cull return the background."""
        return self.finish_view(
            self.render_view_async(variables, sp_item, tp_item, k, ray_mask)
        )

    def _render_view_chunked(self, variables, smpl, sp, tp, latent,
                             ro, rd, nr, fr, sel, n_total, ray_mask,
                             fill=0.0):
        """Per-chunk fallback path (host loop over compiled fixed-size
        chunks with the overflow guard) — synchronous by construction."""

        perm = None
        if self.shuffle_rays:
            perm = np.random.default_rng(0).permutation(ro.shape[0])
            ro, rd, nr, fr = ro[perm], rd[perm], nr[perm], fr[perm]

        n = ro.shape[0]
        n_pad = ((n + self.chunk - 1) // self.chunk) * self.chunk

        def pad(x):
            return np.concatenate(
                [x, np.zeros((n_pad - n,) + x.shape[1:], x.dtype)]
            )

        ro, rd, nr, fr = pad(ro), pad(rd), pad(nr), pad(fr)
        outs = []
        for i in range(0, n_pad, self.chunk):
            block = (
                jnp.asarray(ro[i:i + self.chunk]),
                jnp.asarray(rd[i:i + self.chunk]),
                jnp.asarray(nr[i:i + self.chunk]),
                jnp.asarray(fr[i:i + self.chunk]),
            )
            rgb, _, nd = self._chunk_fn(
                variables, smpl, sp, tp, latent, *block
            )
            if int(nd) > 0:
                # capacity overflow would silently zero valid samples —
                # re-render this chunk uncompacted (exact semantics)
                self.n_overflow_chunks += 1
                print(
                    f"[eval] compaction overflow ({int(nd)} pts) in chunk "
                    f"{i // self.chunk}; re-rendering uncompacted"
                )
                rgb, _, _ = self._chunk_fn_nc(
                    variables, smpl, sp, tp, latent, *block
                )
            outs.append(np.asarray(rgb))
        rgb = np.concatenate(outs, axis=0)[:n]

        if perm is not None:
            unshuffled = np.empty_like(rgb)
            unshuffled[perm] = rgb
            rgb = unshuffled
        if ray_mask is not None:
            full = np.full((n_total, 3), fill, np.float32)
            full[sel] = rgb
            return full
        return rgb


def run_thuman_eval(
    args, model, variables, smpl_selector, savedir: str,
    dataset_cls=None, verbose: bool = True, poses_num: int = 5,
    image_hw: int = 512,
) -> Dict:
    """``test_THuman_ssim`` equivalent over the 5 held-out subjects.

    ``image_hw`` is the square frame size the protocol reshapes renders
    to — 512 in the reference (all_test.py:71); parameterized so the
    protocol can run end-to-end on small synthetic fixtures."""
    import os

    if dataset_cls is None:
        from mpsnerf_tpu.data.thuman import THumanDatasetBatch as dataset_cls

    with open("data/THuman_1_human_list.txt") as f:
        names = [
            x.strip()
            for x in f.readlines()[THUMAN_TEST_RANGE[0]:THUMAN_TEST_RANGE[1]]
        ]
    all_root = os.path.dirname(args.data_root)

    renderer = ViewRenderer(
        model, smpl_selector, chunk=args.chunk, n_samples=args.N_samples,
        n_importance=getattr(args, "N_importance", 0),
        white_bkgd=args.white_bkgd,
    )

    humans, start_poses = {}, {}
    for name, start in zip(names, THUMAN_START_POSES):
        root = os.path.join(all_root, name)
        common = dict(
            split=args.test_split, view_num=args.view_num, model=args.model,
            male=args.male, mean_shape=args.mean_shape, multi_person=False,
        )
        ds_pose = dataset_cls(
            root, start=start, interval=1, poses_num=poses_num + 1, **common
        )
        ds_view = dataset_cls(
            root, start=0, interval=1, poses_num=poses_num, **common
        )
        humans[name] = {
            "novel_pose": DatasetWindow(ds_pose, poses_num + 1),
            "novel_view": DatasetWindow(ds_view, poses_num),
        }
        start_poses[name] = start

    try:
        first = next(iter(humans.values()))["novel_view"][0]
        caps = renderer.prewarm(
            variables, first, first, k=THUMAN_NOVEL_VIEWS[0]
        )
        if verbose and caps:
            print(f"[eval] prewarmed (capacity, fine) pairs: {caps}")
    except Exception as e:  # prewarm is best-effort, never blocks eval
        print(f"[eval] prewarm skipped: {e}")

    return evaluate_novel_view_pose(
        lambda sp, tp, k: renderer.render_view(variables, sp, tp, k),
        humans, THUMAN_NOVEL_VIEWS, image_hw, image_hw, savedir,
        start_poses=start_poses, verbose=verbose,
        render_async=(
            lambda sp, tp, k: renderer.render_view_async(variables, sp,
                                                         tp, k),
            renderer.finish_view,
        ),
    )


def run_h36m_eval(
    args, model, variables, smpl_selector, savedir: str,
    dataset_cls=None, verbose: bool = True,
) -> Dict:
    """``test_H36M`` equivalent for one subject (``--test_persons``):
    novel view = camera 3 at 1000x1000, rays pre-masked by mask_at_box
    (all_test.py:384-387), GT = the unmasked original image
    (``o_img_all``, :402)."""
    if dataset_cls is None:
        from mpsnerf_tpu.data.h36m import H36MDatasetBatch as dataset_cls

    p = int(args.test_persons)
    name = H36M_SUBJECTS[p]
    root = H36M_ROOTS[p]
    common = dict(
        split=args.test_split, view_num=args.view_num,
        mean_shape=args.mean_shape, new_mask=args.new_mask,
        multi_person=False,
    )

    sp_ds = dataset_cls(root, start=H36M_INPUT_POSE[p], interval=1,
                        poses_num=1, **common)
    pose_ds = dataset_cls(root, start=H36M_START_POSE[p], interval=5,
                          poses_num=H36M_POSES_NUM[p], **common)
    view_ds = dataset_cls(root, start=0, interval=5,
                          poses_num=H36M_NOVEL_VIEW_POSES_NUM[p], **common)

    class _SpThenWindow:
        """novel-pose items: the source item first, then the window."""

        def __init__(self, sp_item, window):
            self.sp_item = sp_item
            self.window = window

        def __len__(self):
            return 1 + len(self.window)

        def __getitem__(self, i):
            if isinstance(i, slice):
                assert i == slice(1, None)
                return self.window
            return self.sp_item if i == 0 else self.window[i - 1]

    humans = {
        name: {
            "novel_pose": _SpThenWindow(
                sp_ds[0], DatasetWindow(pose_ds, H36M_POSES_NUM[p])
            ),
            "novel_view": DatasetWindow(
                view_ds, H36M_NOVEL_VIEW_POSES_NUM[p]
            ),
        }
    }

    # masked-ray rendering keeps only box-intersecting rays, whose in-body
    # sample fraction is train-like (~20-40%), NOT the ~6% full-image mean
    # — the capacity must match or valid samples get dropped
    renderer = ViewRenderer(
        model, smpl_selector, chunk=args.chunk, n_samples=args.N_samples,
        n_importance=getattr(args, "N_importance", 0),
        white_bkgd=args.white_bkgd, eval_compact_fraction=0.5,
    )

    def render_view(sp, tp, k):
        mask = np.asarray(tp["mask_at_box_all"][k])
        return renderer.render_view(variables, sp, tp, k, ray_mask=mask)

    def dispatch_view(sp, tp, k):
        mask = np.asarray(tp["mask_at_box_all"][k])
        return renderer.render_view_async(variables, sp, tp, k,
                                          ray_mask=mask)

    try:
        first = humans[name]["novel_view"][0]
        caps = renderer.prewarm(
            variables, first, first, k=H36M_NOVEL_VIEW[0]
        )
        if verbose and caps:
            print(f"[eval] prewarmed (capacity, fine) pairs: {caps}")
    except Exception as e:  # best-effort
        print(f"[eval] prewarm skipped: {e}")

    def gt_fn(item, k):
        return np.asarray(item["o_img_all"][k]).transpose(1, 2, 0)

    return evaluate_novel_view_pose(
        render_view, humans, H36M_NOVEL_VIEW, 1000, 1000, savedir,
        start_poses={name: H36M_START_POSE[p]}, verbose=verbose,
        gt_fn=gt_fn,
        render_async=(dispatch_view, renderer.finish_view),
    )


def run_legacy_test(
    args, model, variables, smpl_selector, savedir: str, items,
    view_interval: int = 12, H: int = 512, W: int = 512,
    data_interval: int = 1, start_pose: int = 0,
) -> float:
    """The reference's inline ``test`` (run_nerf_batch.py:138-298):
    renders every ``view_interval``-th view of each item with the first
    item as the source, writes pred|gt side-by-side PNGs with an
    input-view strip, per-frame pred/gt PNGs, ``psnr_<x100>.npy`` and the
    novel-pose / novel-view sweep videos.  Returns the average PSNR."""
    import os

    import cv2

    from mpsnerf_tpu.eval.metrics import psnr_metric
    from mpsnerf_tpu.eval.video import write_sweep_videos

    os.makedirs(savedir, exist_ok=True)
    renderer = ViewRenderer(
        model, smpl_selector, chunk=args.chunk, n_samples=args.N_samples,
        n_importance=getattr(args, "N_importance", 0),
        white_bkgd=args.white_bkgd,
    )
    to8b = lambda x: (255 * np.clip(x, 0, 1)).astype(np.uint8)

    total_psnr, num = 0.0, 0
    sp_item = items[0]
    for item in items:
        views = range(0, item["rgb_all"].shape[0], view_interval)
        for k in views:
            rgb = renderer.render_view(variables, sp_item, item, k)
            pred = rgb.reshape(H, W, 3)
            gt = np.asarray(item["rgb_all"][k]).reshape(H, W, 3)
            mask = np.asarray(item["mask_at_box_all"][k]).reshape(H, W) > 0

            psnr = psnr_metric(pred[mask], gt[mask])
            total_psnr += psnr
            num += 1
            print(
                "[Test] Source:", int(sp_item["pose_index"]),
                " Target:", int(item["pose_index"]), " View:", k,
                " PSNR: ", round(psnr, 3),
            )

            side = np.concatenate([to8b(pred), to8b(gt)], axis=1)
            strip = np.concatenate(
                [
                    np.transpose(v, (1, 2, 0))
                    for v in np.asarray(sp_item["img_all"])
                ],
                axis=1,
            )
            strip = cv2.resize(
                to8b(strip),
                (side.shape[1], int(strip.shape[0] * side.shape[1]
                                    / strip.shape[1])),
            )
            combo = np.concatenate([strip, side], axis=0)
            name = (
                f"{int(sp_item['pose_index']):02d}_"
                f"{int(item['pose_index']):02d}_{k:02d}.png"
            )
            cv2.imwrite(os.path.join(savedir, name), combo[..., ::-1])
            frame = int(item["pose_index"]) * data_interval + start_pose
            cv2.imwrite(
                os.path.join(savedir, f"frame{frame:04d}_view{k:04d}.png"),
                to8b(pred)[..., ::-1],
            )
            cv2.imwrite(
                os.path.join(savedir, f"frame{frame:04d}_view{k:04d}_gt.png"),
                to8b(gt)[..., ::-1],
            )

    avg = total_psnr / max(num, 1)
    np.save(os.path.join(savedir, f"psnr_{int(avg * 100)}.npy"), np.array(avg))
    write_sweep_videos(
        savedir,
        novel_pose_suffix=f"_{view_interval:02d}.png",
        novel_view_prefix="00_00_",
    )
    return avg


def run_synthetic_eval(
    args, model, variables, smpl_selector, savedir: str, dataset,
    verbose: bool = True,
) -> Dict:
    """Protocol-shaped eval on the synthetic stand-in dataset (novel pose
    and novel view over the held-out cameras)."""
    H = W = dataset.H
    test_ds = type(dataset)(
        n_poses=max(2, dataset.n_poses), n_cameras=len(dataset.cameras),
        input_views=dataset.input_view, image_size=H,
        n_rays=64, n_verts=dataset.subjects[0]["smpl"].n_verts,
        num_instances=dataset.num_instances, split="test",
    )
    novel_views = [
        v for v in test_ds.output_view if v not in test_ds.input_view
    ] or test_ds.output_view[:1]

    renderer = ViewRenderer(
        model, smpl_selector, chunk=min(args.chunk, 8192),
        n_samples=args.N_samples,
        n_importance=getattr(args, "N_importance", 0), white_bkgd=args.white_bkgd,
    )
    humans = {}
    for inst in range(test_ds.num_instances):
        items = [
            test_ds.get_item(i, instance_idx=inst)
            for i in range(test_ds.n_poses)
        ]
        humans[f"synthetic_{inst}"] = {
            "novel_pose": items, "novel_view": items[:-1] or items,
        }
    return evaluate_novel_view_pose(
        lambda sp, tp, k: renderer.render_view(variables, sp, tp, k),
        humans, novel_views, H, W, savedir, verbose=verbose,
        render_async=(
            lambda sp, tp, k: renderer.render_view_async(variables, sp,
                                                         tp, k),
            renderer.finish_view,
        ),
    )
