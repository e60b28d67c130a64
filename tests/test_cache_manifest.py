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


def test_partial_stamp_refused_when_fingerprint_changed(monkeypatch):
    """A --bench-only/--stamp-only restamp after a source change must be
    refused: it would record the new fingerprint over a cache that was never
    rebuilt (the exact failure that left .cache/jax_dryrun stale for five
    commits in round 3 while check_manifest reported fresh)."""
    monkeypatch.setattr(cache_manifest, "recorded_fingerprint", lambda: "old")
    monkeypatch.setattr(cache_manifest, "source_fingerprint",
                        lambda: {"fingerprint": "new"})
    for mode in ("--stamp-only", "--bench-only", "--dryrun-only"):
        allowed, msg = cache_manifest.partial_stamp_allowed(mode)
        assert not allowed and "REFUSING" in msg, (mode, msg)
        # explicit --force overrides after hand-verification
        assert cache_manifest.partial_stamp_allowed(mode, force=True)[0]
    # full refresh always allowed; partial allowed when nothing changed
    assert cache_manifest.partial_stamp_allowed("")[0]
    monkeypatch.setattr(cache_manifest, "source_fingerprint",
                        lambda: {"fingerprint": "old"})
    assert cache_manifest.partial_stamp_allowed("--stamp-only")[0]
