"""Persistent-compilation-cache hardening (VERDICT r3 weak #5 / task 3).

Round 3's driver dryrun timed out because XLA:CPU AOT entries written
on a host with different CPU features failed to load on this one
(``cpu_aot_loader.cc`` machine-feature rejection) and jax silently
recompiled cold.  The fix keys the cache directory by a host
fingerprint; these tests pin the contract:

* different-feature hosts map to DIFFERENT subdirectories (never share
  entries — a load is either a hit or an honest miss);
* same-feature hosts map to the SAME subdirectory (the cache still
  works at all);
* ``MPSNERF_COMPILATION_CACHE=`` (empty) disables cleanly;
* the legacy flat-file sweep removes only top-level files and only in
  the default location.
"""

import os

import mpsnerf_tpu.utils.compilation_cache as cc


def test_fingerprint_stable():
    assert cc.host_fingerprint() == cc.host_fingerprint()
    assert len(cc.host_fingerprint()) == 12


def test_fingerprint_tracks_cpu_features(monkeypatch, tmp_path):
    """Two hosts differing only in /proc/cpuinfo feature flags get
    different fingerprints (the round-3 failure was exactly a feature
    drift: +prefer-no-gather/+prefer-no-scatter)."""
    real_open = open

    def fake_cpuinfo(flags):
        def _open(path, *a, **k):
            if path == "/proc/cpuinfo":
                import io

                return io.StringIO(f"flags\t\t: {flags}\n")
            return real_open(path, *a, **k)

        return _open

    import builtins

    monkeypatch.setattr(
        builtins, "open", fake_cpuinfo("fpu sse sse2 avx avx2 gather")
    )
    fp_a = cc.host_fingerprint()
    monkeypatch.setattr(
        builtins, "open", fake_cpuinfo("fpu sse sse2 avx avx2")
    )
    fp_b = cc.host_fingerprint()
    monkeypatch.undo()
    assert fp_a != fp_b
    # flag ORDER must not matter (kernels list them in varying order)
    monkeypatch.setattr(
        builtins, "open", fake_cpuinfo("gather avx2 avx sse2 sse fpu")
    )
    fp_a2 = cc.host_fingerprint()
    monkeypatch.undo()
    assert fp_a2 == fp_a


def test_enable_keys_directory_by_fingerprint(monkeypatch, tmp_path):
    root = str(tmp_path / "cache")
    monkeypatch.setenv("MPSNERF_COMPILATION_CACHE", root)
    got = cc.enable_compilation_cache()
    assert got == os.path.join(root, cc.host_fingerprint())
    assert os.path.isdir(got)
    import jax

    assert jax.config.jax_compilation_cache_dir == got


def test_empty_env_disables(monkeypatch):
    monkeypatch.setenv("MPSNERF_COMPILATION_CACHE", "")
    assert cc.enable_compilation_cache() is None


def test_legacy_sweep_scope(tmp_path):
    """Only top-level regular files go; fingerprint subdirs survive."""
    root = tmp_path / "xla_cache"
    root.mkdir()
    (root / "old_flat_entry").write_bytes(b"x" * 64)
    sub = root / "abcdef012345"
    sub.mkdir()
    (sub / "keyed_entry").write_bytes(b"y" * 64)
    cc._sweep_legacy_flat_entries(str(root))
    assert not (root / "old_flat_entry").exists()
    assert (sub / "keyed_entry").exists()


def test_sweep_only_runs_for_default_dir(monkeypatch, tmp_path):
    """A user-specified cache dir is never swept — the legacy cleanup is
    scoped to the layout WE created in rounds 1-3."""
    root = tmp_path / "user_cache"
    root.mkdir()
    keep = root / "precious_user_file"
    keep.write_text("keep me")
    monkeypatch.setenv("MPSNERF_COMPILATION_CACHE", str(root))
    cc.enable_compilation_cache()
    assert keep.exists()
