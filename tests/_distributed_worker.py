"""Worker for the 2-process multi-host (DCN-path) test.

Spawned by tests/test_distributed.py: each process owns 4 virtual CPU
devices, joins a jax.distributed cluster through
parallel.mesh.distributed_init (the exact call run_train.py/run_evaluate.py
make), builds the global ("data", "sample") mesh over all 8 global devices,
and runs a data-parallel gradient step on a globally-sharded batch. The
result must equal the single-process full-batch oracle — proving the DCN
code path (cross-process collectives included) executes, not just imports.

Usage: _distributed_worker.py <coordinator> <num_processes> <process_id>
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=4").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    coordinator, num_processes, process_id = (
        sys.argv[1], int(sys.argv[2]), int(sys.argv[3]))

    import jax
    jax.config.update("jax_platforms", "cpu")

    from hierarchicalprobabilistic3dhuman_tpu.parallel import (
        distributed_init, make_mesh, data_sharding, replicated_sharding)

    assert distributed_init(coordinator_address=coordinator,
                            num_processes=num_processes,
                            process_id=process_id), "distributed_init no-op'd"

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    n_global = len(jax.devices())
    n_local = len(jax.local_devices())
    assert n_global == 4 * num_processes, n_global
    assert n_local == 4, n_local

    mesh = make_mesh()          # ("data", "sample") over all GLOBAL devices
    assert int(np.prod(list(mesh.shape.values()))) == n_global

    # Global batch 16, sharded over "data" (8 shards, 4 per process).
    B, F = 16, 8
    rng = np.random.RandomState(0)
    x_full = rng.randn(B, F).astype(np.float32)
    y_full = rng.randn(B).astype(np.float32)
    w_np = rng.randn(F).astype(np.float32)

    x_sh = NamedSharding(mesh, P(("data", "sample")))
    per_proc = B // num_processes
    lo = process_id * per_proc
    x = jax.make_array_from_process_local_data(x_sh, x_full[lo:lo + per_proc])
    y = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P(("data", "sample"))), y_full[lo:lo + per_proc])
    w = jax.device_put(jnp.asarray(w_np), replicated_sharding(mesh))

    @jax.jit
    def loss_and_grad(w, x, y):
        def loss(w):
            pred = x @ w                       # (B,) sharded over data
            return jnp.mean((pred - y) ** 2)   # global mean -> all-reduce
        return jax.value_and_grad(loss)(w)

    loss, grad = loss_and_grad(w, x, y)
    loss = float(np.asarray(loss))
    grad = np.asarray(jax.device_get(grad))

    # Single-process full-batch oracle.
    pred = x_full @ w_np
    loss_ref = float(np.mean((pred - y_full) ** 2))
    grad_ref = 2.0 / B * x_full.T @ (pred - y_full)

    assert abs(loss - loss_ref) < 1e-5, (loss, loss_ref)
    np.testing.assert_allclose(grad, grad_ref, atol=1e-5)
    print(f"DIST OK p{process_id}: global_devices={n_global} "
          f"mesh={dict(mesh.shape)} loss={loss:.6f}", flush=True)


if __name__ == "__main__":
    main()
