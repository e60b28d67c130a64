"""Pre-commit gate: refuse any commit whose STAGED tree ships a stale
compile-cache manifest.

Rounds 3 and 4 both ended with an end-of-round commit that changed an
HLO-relevant source (the Pallas rasterizer) after the last manifest stamp,
so committed HEAD shipped `.cache/manifest.json` stale and the fast tier's
`tests/test_cache_manifest.py::test_compile_caches_are_fresh` failed in a
clean checkout (round-4 VERDICT weak #1). The manifest machinery itself
worked both times — the gap was that nothing checked the tree BEING
COMMITTED. This hook closes it mechanically:

  * `git checkout-index` materialises the staged versions of every
    HLO-relevant source (package *.py, bench.py, __graft_entry__.py) plus
    the staged `.cache/manifest.json` into a temp dir;
  * `check_manifest(repo=tempdir)` fingerprints THAT tree — not the
    working tree — so a kernel edit staged without its restamp is caught
    even when the working tree happens to be fresh (the round-4 failure
    mode: the driver's post-snapshot bench restamped the working tree
    while the snapshot commit stayed stale);
  * a stale staged tree aborts the commit with the stale-file list and
    the restamp recipe. Escape hatch: PRECOMMIT_ALLOW_STALE=1 (for
    commits that intentionally snapshot in-progress kernel work — the
    message says what shipping that commit as HEAD would mean).

Fast path: when the commit stages neither an HLO-relevant source nor the
manifest, the staged versions of those files equal HEAD's, whose freshness
this hook already certified at the previous commit — but the full check is
cheap (<1 s: ~100 small .py files + one AST pass), so we always run it and
also catch a HEAD that was stale before this hook existed.

Install (once per clone): `git config core.hooksPath .githooks` — done by
tools/install_hooks.py and documented in README.md.
"""

import os
import subprocess
import sys
import tempfile

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

from hierarchicalprobabilistic3dhuman_tpu.runtime.cache_manifest import (  # noqa: E402
    check_manifest)

_PATHSPECS = (
    "hierarchicalprobabilistic3dhuman_tpu/*.py",
    "bench.py",
    "__graft_entry__.py",
    ".cache/manifest.json",
)


def staged_tree_fresh():
    """Materialise the staged index's HLO-relevant files and check them."""
    with tempfile.TemporaryDirectory(prefix="precommit_index_") as td:
        files = subprocess.run(
            ["git", "ls-files", "--cached", "--"] + list(_PATHSPECS),
            cwd=_REPO, capture_output=True, text=True, check=True,
        ).stdout
        subprocess.run(
            ["git", "checkout-index", f"--prefix={td}/", "--stdin"],
            cwd=_REPO, input=files, text=True, check=True)
        return check_manifest(repo=td)


def main():
    fresh, msg = staged_tree_fresh()
    if fresh:
        print(f"[precommit] staged tree: {msg}")
        return 0
    if os.environ.get("PRECOMMIT_ALLOW_STALE") == "1":
        print(f"[precommit] OVERRIDDEN (PRECOMMIT_ALLOW_STALE=1): {msg}\n"
              "[precommit] if this commit ends up as HEAD, a clean checkout "
              "fails tests/test_cache_manifest.py and the driver's timed "
              "runs pay full cold compiles.", file=sys.stderr)
        return 0
    print(
        f"[precommit] REFUSED: the tree being committed is stale.\n"
        f"[precommit] {msg}\n"
        "[precommit] Fix: run `python benchmarks/refresh_compile_caches.py` "
        "(reruns bench.py on TPU and dryrun_multichip(8) on a virtual CPU "
        "mesh; each restamps its cache), then `git add .cache/` and retry. "
        "Override (ships a stale HEAD if this becomes the final commit): "
        "PRECOMMIT_ALLOW_STALE=1 git commit ...",
        file=sys.stderr)
    return 1


if __name__ == "__main__":
    sys.exit(main())
