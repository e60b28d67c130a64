"""Rebuild the persistent XLA compile caches.

Runs the two cache-backed external artifacts serially (this host has one
CPU core — never run two XLA-compiling processes at once):

  1. bench.py            -> .cache/jax_bench   (real TPU)
  2. dryrun_multichip(8) -> .cache/jax_dryrun  (8-device virtual CPU mesh)

Each artifact STAMPS ITS OWN manifest entry and prunes its superseded blobs
at the end of a successful run (runtime/cache_manifest.py) — stamping is
part of producing the artifact, so this script has no stamp mode and no
--force: it just runs the artifacts and reports the resulting freshness.

Usage: python benchmarks/refresh_compile_caches.py [--bench-only|--dryrun-only]
"""

import argparse
import os
import subprocess
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    group = parser.add_mutually_exclusive_group()
    group.add_argument("--bench-only", action="store_true",
                       help="refresh only .cache/jax_bench (TPU bench)")
    group.add_argument("--dryrun-only", action="store_true",
                       help="refresh only .cache/jax_dryrun (CPU mesh dryrun)")
    args = parser.parse_args()

    if not args.dryrun_only:
        print("[refresh] running bench.py (TPU)...", flush=True)
        subprocess.run([sys.executable, os.path.join(_REPO, "bench.py")],
                       check=True, cwd=_REPO)
    if not args.bench_only:
        print("[refresh] running dryrun_multichip(8) (CPU mesh)...",
              flush=True)
        env = dict(os.environ,
                   JAX_PLATFORMS="cpu",
                   XLA_FLAGS=(os.environ.get("XLA_FLAGS", "")
                              + " --xla_force_host_platform_device_count=8"))
        subprocess.run(
            [sys.executable, "-c",
             "import __graft_entry__ as g; g.dryrun_multichip(8)"],
            check=True, cwd=_REPO, env=env)

    from hierarchicalprobabilistic3dhuman_tpu.runtime.cache_manifest import (
        check_manifest)
    fresh, msg = check_manifest()
    print(f"[refresh] {msg}", flush=True)
    if not fresh:
        # Partial refresh over changed sources leaves the skipped cache
        # stale — the message above says which; rerun without a mode flag.
        sys.exit(2)


if __name__ == "__main__":
    main()
