"""Compile-cache freshness manifest.

bench.py and __graft_entry__.py ship persistent XLA compile caches under
.cache/ so the driver's timed runs skip the ~4-10 min cold compile. Those
caches go stale silently whenever any HLO-relevant source changes — the run
still works, it just pays the full compile inside the driver's budget
(round-2 VERDICT weak #4). This module makes staleness loud and checkable:

  * source_fingerprint() hashes the AST (comments and docstrings stripped,
    so prose-only edits do not invalidate) of every package source plus the
    entry scripts;
  * write_manifest() records the fingerprint after a cache refresh
    (benchmarks/refresh_compile_caches.py);
  * check_manifest() compares and returns a human-readable status;
    tests/test_cache_manifest.py fails the fast tier on mismatch so a stale
    cache cannot ship unnoticed.
"""

import ast
import hashlib
import json
import os

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_PKG = os.path.join(_REPO, "hierarchicalprobabilistic3dhuman_tpu")
_MANIFEST = os.path.join(_REPO, ".cache", "manifest.json")

# Entry scripts whose traced programs feed the persistent caches.
_EXTRA_SOURCES = ("bench.py", "__graft_entry__.py")


def _strip_docstrings(tree):
    for node in ast.walk(tree):
        if isinstance(node, (ast.Module, ast.FunctionDef,
                             ast.AsyncFunctionDef, ast.ClassDef)):
            body = getattr(node, "body", None)
            if (body and isinstance(body[0], ast.Expr)
                    and isinstance(body[0].value, ast.Constant)
                    and isinstance(body[0].value.value, str)):
                node.body = body[1:] or [ast.Pass()]
    return tree


def _file_digest(path):
    with open(path, "r") as f:
        src = f.read()
    try:
        normalised = ast.dump(_strip_docstrings(ast.parse(src)))
    except SyntaxError:
        normalised = src
    return hashlib.sha256(normalised.encode()).hexdigest()


def source_fingerprint():
    """Deterministic digest over all HLO-relevant sources (AST-normalised)."""
    digests = []
    for root, dirs, files in os.walk(_PKG):
        dirs[:] = sorted(d for d in dirs if d != "__pycache__")
        for name in sorted(files):
            if name.endswith(".py"):
                path = os.path.join(root, name)
                digests.append((os.path.relpath(path, _REPO),
                                _file_digest(path)))
    for name in _EXTRA_SOURCES:
        path = os.path.join(_REPO, name)
        if os.path.exists(path):
            digests.append((name, _file_digest(path)))
    h = hashlib.sha256()
    for rel, d in digests:
        h.update(rel.encode())
        h.update(d.encode())
    return {"fingerprint": h.hexdigest(), "files": dict(digests)}


def write_manifest():
    fp = source_fingerprint()
    os.makedirs(os.path.dirname(_MANIFEST), exist_ok=True)
    with open(_MANIFEST, "w") as f:
        json.dump(fp, f, indent=1, sort_keys=True)
    return fp["fingerprint"]


def check_manifest():
    """-> (fresh: bool, message: str). Missing manifest counts as stale."""
    if not os.path.exists(_MANIFEST):
        return False, ("no .cache/manifest.json — run "
                       "benchmarks/refresh_compile_caches.py after building "
                       "the compile caches")
    with open(_MANIFEST) as f:
        recorded = json.load(f)
    current = source_fingerprint()
    if current["fingerprint"] == recorded.get("fingerprint"):
        return True, "compile caches fresh"
    changed = sorted(
        set(k for k, v in current["files"].items()
            if recorded.get("files", {}).get(k) != v)
        | set(k for k in recorded.get("files", {})
              if k not in current["files"]))
    return False, ("compile caches STALE — HLO-relevant sources changed "
                   f"since the last refresh: {', '.join(changed[:8])}"
                   f"{' ...' if len(changed) > 8 else ''}. Run "
                   "benchmarks/refresh_compile_caches.py")


def recorded_fingerprint():
    """Fingerprint in the committed manifest, or None if absent."""
    if not os.path.exists(_MANIFEST):
        return None
    with open(_MANIFEST) as f:
        return json.load(f).get("fingerprint")


def partial_stamp_allowed(mode, force=False):
    """Gate for refresh_compile_caches.py's partial modes.

    Round-3 postmortem: the committed dryrun cache went stale for five
    commits because a kernel rewrite changed the train-step HLO and later
    manifest restamps (--bench-only / --stamp-only runs) recorded the new
    source fingerprint WITHOUT rebuilding .cache/jax_dryrun — check_manifest
    then reported "fresh" over a cache the driver would miss (~3-4 min
    recompile inside its budget). A partial mode may therefore only stamp
    when the fingerprint is UNCHANGED since the last full refresh (blob
    swap, doc edit); any fingerprint change requires a full refresh — or an
    explicit --force from someone who re-verified the skipped cache by hand.

    -> (allowed: bool, message: str)
    """
    if mode not in ("--stamp-only", "--bench-only", "--dryrun-only"):
        return True, "full refresh — both caches rebuilt before stamping"
    if force:
        return True, f"{mode} stamp FORCED — caller vouches for skipped caches"
    old = recorded_fingerprint()
    new = source_fingerprint()["fingerprint"]
    if old == new:
        return True, f"{mode} stamp ok — fingerprint unchanged since last refresh"
    return False, (
        f"REFUSING {mode} stamp: HLO-relevant sources changed since the last "
        "refresh, so the skipped cache(s) may be silently stale. Run a full "
        "refresh (no mode flag), or pass --force after re-verifying the "
        "skipped cache by hand.")


def warn_if_stale(stream=None):
    """Print a loud warning line when stale; returns freshness bool."""
    import sys
    fresh, msg = check_manifest()
    if not fresh:
        print(f"[cache-manifest] WARNING: {msg}",
              file=stream or sys.stderr, flush=True)
    return fresh
