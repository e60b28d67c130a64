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


def test_precommit_gate_refuses_stale_staged_tree(tmp_path):
    """The round-3/4 failure mode end-to-end: a kernel edit staged without a
    restamp must be REFUSED by tools/precommit.py, a restamped index must
    pass, and PRECOMMIT_ALLOW_STALE=1 must override — all evaluated against
    the INDEX (a scratch clone), never this repo's working tree."""
    import json
    import shutil
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    clone = tmp_path / "clone"
    clone.mkdir()
    # Minimal repo shape the fingerprint walks: package .py files + entry
    # scripts + .cache/manifest.json. Copy the real tool under test.
    pkg = clone / "hierarchicalprobabilistic3dhuman_tpu"
    (pkg / "runtime").mkdir(parents=True)
    (pkg / "__init__.py").write_text("")
    (pkg / "runtime" / "__init__.py").write_text("")
    shutil.copy(
        os.path.join(repo, "hierarchicalprobabilistic3dhuman_tpu",
                     "runtime", "cache_manifest.py"),
        pkg / "runtime" / "cache_manifest.py")
    (pkg / "kernel.py").write_text("X = 1\n")
    (clone / "bench.py").write_text("B = 1\n")
    (clone / "__graft_entry__.py").write_text("E = 1\n")
    tools = clone / "tools"
    tools.mkdir()
    shutil.copy(os.path.join(repo, "tools", "precommit.py"),
                tools / "precommit.py")

    def git(*args, **kw):
        return subprocess.run(["git", "-C", str(clone)] + list(args),
                              capture_output=True, text=True, **kw)

    git("init", "-q")
    git("config", "user.email", "t@t")
    git("config", "user.name", "t")

    sys.path.insert(0, str(clone))
    try:
        for mod in [m for m in list(sys.modules)
                    if m.startswith("hierarchicalprobabilistic3dhuman_tpu")]:
            del sys.modules[mod]
        from hierarchicalprobabilistic3dhuman_tpu.runtime.cache_manifest import (
            stamp_cache)
        for name in ("jax_bench", "jax_dryrun"):
            stamp_cache(name,
                        manifest_path=str(clone / ".cache" / "manifest.json"))
    finally:
        sys.path.remove(str(clone))
        for mod in [m for m in list(sys.modules)
                    if m.startswith("hierarchicalprobabilistic3dhuman_tpu")]:
            del sys.modules[mod]

    git("add", "-A")

    def precommit(env_extra=None):
        env = dict(os.environ)
        env.pop("PRECOMMIT_ALLOW_STALE", None)
        env.update(env_extra or {})
        return subprocess.run([sys.executable, str(tools / "precommit.py")],
                              cwd=str(clone), capture_output=True, text=True,
                              env=env)

    r = precommit()
    assert r.returncode == 0, r.stdout + r.stderr   # fresh staged tree passes

    # Stage an HLO-relevant edit WITHOUT a restamp -> refused.
    (pkg / "kernel.py").write_text("X = 2\n")
    git("add", "-A")
    r = precommit()
    assert r.returncode == 1, r.stdout + r.stderr
    assert "REFUSED" in r.stderr and "kernel.py" in r.stderr

    # Working tree freshness must NOT rescue a stale index (the round-4
    # failure: driver restamped the working tree after the stale commit).
    sys.path.insert(0, str(clone))
    try:
        for mod in [m for m in list(sys.modules)
                    if m.startswith("hierarchicalprobabilistic3dhuman_tpu")]:
            del sys.modules[mod]
        from hierarchicalprobabilistic3dhuman_tpu.runtime.cache_manifest import (
            stamp_cache)
        for name in ("jax_bench", "jax_dryrun"):
            stamp_cache(name,
                        manifest_path=str(clone / ".cache" / "manifest.json"))
    finally:
        sys.path.remove(str(clone))
        for mod in [m for m in list(sys.modules)
                    if m.startswith("hierarchicalprobabilistic3dhuman_tpu")]:
            del sys.modules[mod]
    r = precommit()
    assert r.returncode == 1, ("working-tree restamp must not rescue a "
                               "stale INDEX\n" + r.stdout + r.stderr)

    # Escape hatch.
    r = precommit({"PRECOMMIT_ALLOW_STALE": "1"})
    assert r.returncode == 0 and "OVERRIDDEN" in r.stderr

    # Staging the restamp fixes it for real.
    git("add", "-A")
    r = precommit()
    assert r.returncode == 0, r.stdout + r.stderr
