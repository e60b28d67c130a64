"""Device mesh construction and sharding specs.

All distributed communication in the framework flows through this module: a
`jax.sharding.Mesh` over ICI (plus DCN via jax.distributed for multi-host),
with two logical axes:

  * "data"   — the training/eval batch axis. Synthetic-data generation,
               rendering, forward and loss are per-example, so data
               parallelism needs only the gradient all-reduce that XLA
               inserts automatically under jit;
  * "sample" — the distribution-sample axis (this domain's analog of sequence
               parallelism): the N pose/shape samples per image drawn for
               losses/metrics/uncertainty are a second batch axis and shard
               across the mesh for predict/eval throughput.

The reference has no parallelism at all (single device via CUDA_VISIBLE_DEVICES,
SURVEY §2.3); this module is where model axes (tp/pp) would be added if the
encoder ever outgrew one chip.
"""

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices=None, sample_parallel=1, devices=None):
    """Create a ("data", "sample") mesh.

    :param n_devices: total devices to use (default: all)
    :param sample_parallel: size of the "sample" axis; "data" gets the rest.
    """
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    assert n % sample_parallel == 0, (n, sample_parallel)
    grid = np.asarray(devices).reshape(n // sample_parallel, sample_parallel)
    return Mesh(grid, axis_names=("data", "sample"))


def replicated_sharding(mesh):
    return NamedSharding(mesh, P())


def data_sharding(mesh, ndim=1):
    """Shard axis 0 (the example/batch axis) over "data".

    Per-example tensors are sharded over "data" only; their distribution
    samples shard over "sample" separately (sample_sharding), so a (B, N, ...)
    tensor uses every device without resharding the batch axis."""
    return NamedSharding(mesh, P("data"))


def sample_sharding(mesh):
    """Sharding for (batch, num_samples, ...) tensors: batch over "data",
    samples over "sample"."""
    return NamedSharding(mesh, P("data", "sample"))


def flat_sample_sharding(mesh):
    """Sharding for (batch * num_samples, ...) tensors (the flattened layout
    batched SMPL consumes): axis 0 over ("data", "sample") — B-major, so it
    is exactly the reshape of sample_sharding's (B, N, ...) layout and XLA
    inserts no resharding collective between them."""
    return NamedSharding(mesh, P(("data", "sample")))


def constrain(x, sharding_or_none):
    """with_sharding_constraint that tolerates mesh=None plumbing."""
    if sharding_or_none is None:
        return x
    return jax.lax.with_sharding_constraint(x, sharding_or_none)


def distributed_init(coordinator_address=None, num_processes=None,
                     process_id=None):
    """Initialise jax.distributed for multi-host (DCN) meshes.

    Single-process runs (the common case, and every test) are a no-op.
    Multi-host runs pass coordinator/process info explicitly or rely on
    jax.distributed's cluster auto-detection (TPU pods). Safe to call twice.

    :return: True if jax.distributed was initialised by this call.
    """
    if coordinator_address is None and num_processes in (None, 1):
        return False
    try:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
        return True
    except RuntimeError as e:
        if "already initialized" in str(e):
            return False
        raise
