"""Shared persistent compile cache for the benchmark scripts.

The TPU-service compile of the big forward graphs is 5-10 min; benchmark
iteration is impossible without a cache. This cache dir is gitignored
(unlike .cache/jax_bench / .cache/jax_dryrun, which ship so the driver's
timed runs start warm).
"""

import os


def enable():
    import jax
    cache_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".cache", "jax_scratch")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
