"""Default persistent XLA compile cache for the CLI entry points.

The fused predict/train/eval programs cost minutes of (TPU-service) compile
time; a folder-inference or evaluation CLI that recompiles on every launch
is unusable operationally. All three CLIs call enable() before building
models: repeat runs load serialized executables in seconds. Opt out with
HP3D_NO_COMPILE_CACHE=1 or redirect with HP3D_COMPILE_CACHE=/path.
"""

import os


def enable():
    if os.environ.get("HP3D_NO_COMPILE_CACHE"):
        return None
    import jax
    cache_dir = os.environ.get("HP3D_COMPILE_CACHE") or os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))), ".cache", "jax_cli")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return cache_dir
