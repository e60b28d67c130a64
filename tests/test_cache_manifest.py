"""Compile-cache freshness gate (round-2 VERDICT weak #4).

Fails the fast tier whenever an HLO-relevant source changed after the last
compile-cache refresh, so the committed .cache/ blobs (which save the
driver a ~4-10 min cold compile in its timed bench/dryrun) cannot silently
go stale. Fix: python benchmarks/refresh_compile_caches.py
"""

import ast
import os

from hierarchicalprobabilistic3dhuman_tpu.runtime import cache_manifest


def test_fingerprint_ignores_comments_and_docstrings(tmp_path):
    a = tmp_path / "a.py"
    a.write_text('"""doc."""\nx = 1  # comment\n')
    d1 = cache_manifest._file_digest(str(a))
    a.write_text('"""other doc entirely."""\n# new comment\nx = 1\n')
    assert cache_manifest._file_digest(str(a)) == d1
    a.write_text('"""doc."""\nx = 2\n')
    assert cache_manifest._file_digest(str(a)) != d1


def test_fingerprint_covers_entry_scripts():
    fp = cache_manifest.source_fingerprint()
    assert "bench.py" in fp["files"]
    assert "__graft_entry__.py" in fp["files"]
    assert any(k.startswith("hierarchicalprobabilistic3dhuman_tpu/")
               for k in fp["files"])


def test_compile_caches_are_fresh():
    fresh, msg = cache_manifest.check_manifest()
    assert fresh, msg


def test_per_cache_stamps_keep_unstamped_cache_stale(tmp_path):
    """Stamping one cache must NOT mark the other fresh: a --bench-only run
    after a source change leaves jax_dryrun stale and check_manifest must
    say so (the round-3 failure was a global stamp covering an unrebuilt
    cache)."""
    manifest = str(tmp_path / "manifest.json")
    fresh, msg = cache_manifest.check_manifest(manifest_path=manifest)
    assert not fresh and "no .cache/manifest.json" in msg

    cache_manifest.stamp_cache("jax_bench", manifest_path=manifest)
    fresh, msg = cache_manifest.check_manifest(manifest_path=manifest)
    assert not fresh and "jax_dryrun (never stamped)" in msg, msg

    cache_manifest.stamp_cache("jax_dryrun", manifest_path=manifest)
    fresh, msg = cache_manifest.check_manifest(manifest_path=manifest)
    assert fresh, msg


def test_legacy_single_fingerprint_manifest_still_readable(tmp_path):
    """Rounds 2-3 stored one top-level fingerprint; it must be treated as a
    stamp for every required cache so old commits still evaluate."""
    import json
    manifest = str(tmp_path / "manifest.json")
    with open(manifest, "w") as f:
        json.dump(cache_manifest.source_fingerprint(), f)
    fresh, msg = cache_manifest.check_manifest(manifest_path=manifest)
    assert fresh, msg


def test_prune_superseded_deletes_only_replaced_program_groups(tmp_path):
    """Blobs whose program group gained a new key during the run are dead
    (the program's HLO changed); groups with no new key are cache hits and
    must be kept — including all shape-variants of an untouched program."""
    import time
    cache = tmp_path / "cache"
    cache.mkdir()
    old = ["jit_foo-" + "a" * 64 + "-cache",
           "jit_bar-" + "b" * 64 + "-cache",
           "jit_bar-" + "c" * 64 + "-cache"]
    for name in old:
        (cache / name).write_bytes(b"old")
    past = time.time() - 100
    for name in old:
        os.utime(cache / name, (past, past))
    run_start = time.time() - 50
    new = "jit_foo-" + "d" * 64 + "-cache"
    (cache / new).write_bytes(b"new")

    deleted = cache_manifest.prune_superseded(str(cache), run_start)
    assert deleted == ["jit_foo-" + "a" * 64 + "-cache"]
    remaining = sorted(os.listdir(cache))
    assert remaining == sorted([new] + old[1:])
