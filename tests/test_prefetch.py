"""Prefetching loader behavior."""

import time

import numpy as np
import pytest

from mpsnerf_tpu.data.prefetch import PrefetchLoader


class SlowDataset:
    def __init__(self, delay=0.02):
        self.delay = delay
        self.calls = []

    def __len__(self):
        return 10

    def __getitem__(self, i):
        time.sleep(self.delay)
        self.calls.append(i)
        return {"idx": i, "data": np.zeros(4)}


class TestPrefetch:
    def test_items_flow(self):
        ds = SlowDataset()
        loader = PrefetchLoader(ds, seed=0, num_workers=2, prefetch=4)
        items = [next(loader) for _ in range(8)]
        loader.close()
        assert all(0 <= it["idx"] < 10 for it in items)

    def test_overlaps_consumer_work(self):
        ds = SlowDataset(delay=0.05)
        loader = PrefetchLoader(ds, seed=0, num_workers=2, prefetch=4)
        next(loader)  # warm
        time.sleep(0.3)  # let the queue fill
        t0 = time.time()
        for _ in range(4):
            next(loader)
        dt = time.time() - t0
        loader.close()
        # 4 items at 0.05s each would take 0.2s serially; prefetch hides it
        assert dt < 0.15

    def test_deterministic_order_across_runs(self):
        """Identically-seeded loaders must yield the same item sequence
        regardless of worker races (ordered delivery)."""
        def run():
            ds = SlowDataset(delay=0.005)
            loader = PrefetchLoader(ds, seed=7, num_workers=3, prefetch=6)
            seq = [next(loader)["idx"] for _ in range(12)]
            loader.close()
            return seq

        assert run() == run()

    def test_zero_workers_synchronous(self):
        ds = SlowDataset(delay=0.0)
        loader = PrefetchLoader(ds, seed=0, num_workers=0)
        it = next(loader)
        assert "idx" in it

    def test_per_host_sharding(self):
        """DistributedSampler semantics: hosts draw disjoint slices of an
        epoch permutation that is identical across hosts, and reshuffle
        together each epoch (ref run_nerf_batch.py:452-453,525-526)."""
        ds = SlowDataset(delay=0.0)

        def host_stream(pi, pc, n):
            loader = PrefetchLoader(
                ds, seed=3, num_workers=0, process_index=pi, process_count=pc
            )
            return [next(loader)["idx"] for _ in range(n)]

        h0 = host_stream(0, 2, 10)  # two full epochs of this host's slice
        h1 = host_stream(1, 2, 10)
        # within one epoch: disjoint, covering the dataset between them
        assert set(h0[:5]).isdisjoint(h1[:5])
        assert set(h0[:5]) | set(h1[:5]) == set(range(10))
        # second epoch reshuffles (still a valid cover)
        assert set(h0[5:]) | set(h1[5:]) == set(range(10))
        # identical construction on both hosts -> same epoch permutations:
        # interleaving the two slices reconstructs each epoch's permutation
        single = host_stream(0, 1, 10)
        assert sorted(single) == sorted(range(10))

    def test_error_propagates(self):
        class Bad:
            def __len__(self):
                return 1

            def __getitem__(self, i):
                raise RuntimeError("boom")

        loader = PrefetchLoader(Bad(), num_workers=1)
        with pytest.raises(RuntimeError):
            next(loader)
        loader.close()
