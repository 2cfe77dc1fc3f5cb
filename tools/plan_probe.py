"""Micro-attribution of the plan pre-pass (grid cull + compaction plan).

The round-3 stage probe shows the plan pre-pass at ~550 ms — the largest
single dispatch of the bench path.  This times its internals separately:
point generation + world_to_smpl, grid_lookup gather, the 12.2M cumsum,
and the capacity scatter, plus candidate formulations (matmul cumsum,
sorted scatter).  All outputs are scalar-reduced (tunnel fetch rule).
"""

import time

import numpy as np


def timed(fn, *args, n=10, label=""):
    import jax
    out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0])
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0])
    dt = (time.time() - t0) / n * 1e3
    print(f"{label:44s} {dt:8.1f} ms")
    return dt


def main():
    import jax
    import jax.numpy as jnp

    from mpsnerf_tpu.utils.compilation_cache import enable_compilation_cache

    enable_compilation_cache()
    from mpsnerf_tpu.utils.liveness import first_contact_watchdog
    first_contact_watchdog()  # exit 3 instead of stalling the batch

    from mpsnerf_tpu.data import attach_body_grid
    from mpsnerf_tpu.data.synthetic import SyntheticHumanDataset
    from mpsnerf_tpu.ops.body_grid import grid_lookup
    from mpsnerf_tpu.ops.composite import stratified_z_vals
    from mpsnerf_tpu.smpl.lbs import PoseTransforms, world_to_smpl
    from mpsnerf_tpu.train.trainer import to_device_input
    from mpsnerf_tpu.rays.rays import get_rays, get_near_far

    H = W = 512
    N_SAMPLES = 128
    CAPACITY = 2572288

    ds = SyntheticHumanDataset(
        n_poses=1, n_cameras=4, image_size=H, n_rays=64, n_verts=6890,
        num_instances=1, input_views=[0, 1, 2],
    )
    item = ds.get_item(0, instance_idx=0)
    attach_body_grid(item)
    smpl = ds.smpl_for(0)
    inp = to_device_input(item)

    K, R, T = ds.cameras[3]
    ray_o, ray_d = get_rays(H, W, K, R, T)
    ray_o = ray_o.reshape(-1, 3)
    ray_d = ray_d.reshape(-1, 3)
    bounds = np.asarray(item["bounds"])
    near, far, hit = get_near_far(bounds, ray_o.copy(), ray_d.copy())
    near_all = np.zeros(ray_o.shape[0], np.float32)
    far_all = np.ones(ray_o.shape[0], np.float32)
    near_all[hit] = near
    far_all[hit] = far
    sel = np.flatnonzero(hit)
    ro = jnp.asarray(ray_o[sel])
    rd = jnp.asarray(ray_d[sel])
    nr = jnp.asarray(near_all[sel])
    fr = jnp.asarray(far_all[sel])
    key = jax.random.PRNGKey(0)

    n = len(sel) * N_SAMPLES
    print(f"samples {n} capacity {CAPACITY}")

    tf_t = PoseTransforms.create(smpl, inp["params"])
    R_t = jax.device_put(tf_t.R)
    Th_t = jax.device_put(tf_t.Th)

    @jax.jit
    def gen_pts(a, b, c, d):
        z = stratified_z_vals(key, c[:, None], d[:, None], N_SAMPLES, 0.0)
        pts = (a[:, None, :] + b[:, None, :] * z[..., None]).reshape(-1, 3)
        q = world_to_smpl(pts, R_t, Th_t)
        return jnp.sum(q)

    timed(gen_pts, ro, rd, nr, fr, label="pts + world_to_smpl")

    @jax.jit
    def make_q(a, b, c, d):
        z = stratified_z_vals(key, c[:, None], d[:, None], N_SAMPLES, 0.0)
        pts = (a[:, None, :] + b[:, None, :] * z[..., None]).reshape(-1, 3)
        return world_to_smpl(pts, R_t, Th_t)

    q = jax.jit(make_q)(ro, rd, nr, fr)
    q.block_until_ready()

    @jax.jit
    def lookup(qq):
        return jnp.sum(grid_lookup(inp["body_grid"], qq))

    timed(lookup, q, label="grid_lookup (12.2M gathers)")

    cand = jax.jit(
        lambda qq: grid_lookup(inp["body_grid"], qq).astype(jnp.int32)
    )(q)
    cand.block_until_ready()

    @jax.jit
    def cumsum_xla(m):
        return jnp.sum(jnp.cumsum(m))

    timed(cumsum_xla, cand, label="cumsum (XLA, 12.2M int32)")

    def matmul_cumsum(x):
        """Multi-level MXU cumsum: rows of 128, upper-tri matmul, recurse.
        f32 exact for sums < 2^24."""
        n0 = x.shape[0]
        lane = 128
        n_pad = (n0 + lane - 1) // lane * lane
        xf = jnp.pad(x.astype(jnp.float32), (0, n_pad - n0)).reshape(-1, lane)
        tri = jnp.tril(jnp.ones((lane, lane), jnp.float32)).T  # U[k,j]=k<=j

        def level(rows):
            within = jax.lax.dot(
                rows, tri, precision=jax.lax.Precision.HIGHEST
            )
            tot = within[:, -1]
            if rows.shape[0] > 1:
                off = level(
                    jnp.pad(
                        tot, (0, (-tot.shape[0]) % lane)
                    ).reshape(-1, lane)
                ).reshape(-1)[: rows.shape[0]]
                within = within + (off - tot)[:, None]
            return within

        return level(xf).reshape(-1)[:n0]

    @jax.jit
    def cumsum_mxu(m):
        return jnp.sum(matmul_cumsum(m))

    timed(cumsum_mxu, cand, label="cumsum (MXU matmul, f32)")

    slot = jax.jit(lambda m: jnp.cumsum(m) - 1)(cand)
    slot.block_until_ready()
    take = jax.jit(lambda m, s: (m > 0) & (s < CAPACITY))(cand, slot)
    take.block_until_ready()

    @jax.jit
    def scatter_default(s, t):
        gi = (
            jnp.zeros((CAPACITY,), jnp.int32)
            .at[jnp.where(t, s, CAPACITY)]
            .set(jnp.arange(n, dtype=jnp.int32), mode="drop")
        )
        return jnp.sum(gi)

    timed(scatter_default, slot, take, label="scatter .at[].set (12.2M)")

    @jax.jit
    def scatter_sorted(s, t):
        gi = (
            jnp.zeros((CAPACITY,), jnp.int32)
            .at[jnp.where(t, s, CAPACITY)]
            .set(
                jnp.arange(n, dtype=jnp.int32),
                mode="drop",
                indices_are_sorted=True,
                unique_indices=True,
            )
        )
        return jnp.sum(gi)

    timed(scatter_sorted, slot, take, label="scatter sorted+unique hints")

    @jax.jit
    def expand_gather(s, t):
        # the expand side: capacity-buf[slot] gather at N=12.2M
        buf = jnp.arange(CAPACITY, dtype=jnp.int32)
        return jnp.sum(jnp.where(t, buf[s], 0))

    timed(expand_gather, slot, take, label="expand gather buf[slot] (12.2M)")

    # ---- full-plan formulation (the shipped exact row plan).  The
    # block-superset and two-level variants measured here in rounds 3-5
    # were DELETED round 5: on-chip the two-level plan was 276 ms vs
    # 77 ms for the exact plan at the 12.2M workload (bench end-to-end
    # 200k vs 277k rays/s) — history in BASELINE.md / ROADMAP.md.
    from mpsnerf_tpu.ops.compact import plan_compaction

    def plan_sum(p):
        return (
            jnp.sum(p.gather_idx) + jnp.sum(p.slot)
            + jnp.sum(p.take) + p.n_valid
        )

    timed(
        jax.jit(lambda m: plan_sum(plan_compaction(m, CAPACITY))),
        cand, label="exact row plan (cumsum+scatter @12.2M)",
    )

    # block-superset inflation: what a block-granular plan would make
    # the point-scaled stages pay.  Measured 2026-08-19 (bench scene):
    # B=4 1.078, B=8 1.169, B=16 1.319 — rejected, see ROADMAP.md.
    @jax.jit
    def superset(m):
        exact = jnp.sum(m)
        return exact, [
            jnp.sum(m.reshape(-1, B).any(axis=1).astype(jnp.int32)) * B
            for B in (4, 8, 16)
        ]

    exact, sups = superset(cand)
    for B, s in zip((4, 8, 16), sups):
        print(f"block-superset B={B:<2d} inflation"
              f"{'':22s} {int(s) / int(exact):8.3f} x")


if __name__ == "__main__":
    main()
