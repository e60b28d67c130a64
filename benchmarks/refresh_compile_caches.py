"""Rebuild the persistent XLA compile caches and stamp the manifest.

Runs the two cache-backed external artifacts serially (this host has one
CPU core — never run two XLA-compiling processes at once):

  1. bench.py           -> .cache/jax_bench   (real TPU)
  2. dryrun_multichip(8) -> .cache/jax_dryrun (8-device virtual CPU mesh)

then records the source fingerprint in .cache/manifest.json so
tests/test_cache_manifest.py (fast tier) can flag staleness the next time an
HLO-relevant source changes.

Usage: python benchmarks/refresh_compile_caches.py [--bench-only|--dryrun-only|--stamp-only]
"""

import os
import subprocess
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else ""
    force = "--force" in sys.argv[2:]

    # Partial modes may only stamp when the source fingerprint is unchanged —
    # otherwise the skipped cache could be silently stale (see
    # cache_manifest.partial_stamp_allowed for the round-3 postmortem).
    from hierarchicalprobabilistic3dhuman_tpu.runtime.cache_manifest import (
        partial_stamp_allowed)
    allowed, why = partial_stamp_allowed(mode, force=force)
    print(f"[refresh] {why}", flush=True)
    if not allowed:
        sys.exit(2)

    if mode != "--stamp-only":
        if mode != "--dryrun-only":
            print("[refresh] running bench.py (TPU)...", flush=True)
            subprocess.run([sys.executable, os.path.join(_REPO, "bench.py")],
                           check=True, cwd=_REPO)
        if mode != "--bench-only":
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
        write_manifest)
    fp = write_manifest()
    print(f"[refresh] manifest stamped: {fp}", flush=True)


if __name__ == "__main__":
    main()
