"""pjit-sharded training/eval steps over a device mesh.

Data-parallel training: parameters/optimizer state replicated, batch sharded
over the mesh's "data" axis; the distribution-sample axis (N pose/shape
samples per example) shards over "sample" via constraints placed inside the
step (train.make_train_step / evaluate._make_eval_step take the mesh). XLA
inserts the gradient all-reduce over ICI automatically; no hand-written
collectives. The same jitted step runs single-chip when the mesh has one
device.
"""

import jax

from hierarchicalprobabilistic3dhuman_tpu.parallel.mesh import (
    data_sharding, replicated_sharding)


def shard_batch(mesh, *arrays):
    """Place host batch arrays with axis-0 "data" sharding over the mesh."""
    sh = data_sharding(mesh)
    return tuple(jax.device_put(a, sh) for a in arrays)


def make_sharded_train_step(step_fn, mesh):
    """Wrap an (unjitted) step(state, key, pose, background, texture) with
    mesh shardings: state replicated, batch args sharded over "data".

    :param step_fn: the *python* step function (e.g. the closure built inside
        train.make_train_step before jit) OR any jit-compatible callable with
        the same signature.
    :return: jitted function with explicit input shardings. Outputs are left
        to XLA (internal with_sharding_constraint calls pin what matters);
        host fetches gather transparently.
    """
    rep = replicated_sharding(mesh)
    dat = data_sharding(mesh)
    in_shardings = (rep, rep, dat, dat, dat)
    return jax.jit(step_fn, in_shardings=in_shardings)


def make_sharded_eval_step(step_fn, mesh):
    """Wrap an (unjitted) eval step(variables, key, image, heatmaps, pose,
    shape, gender_code, target_joints2d, target_silhouette): variables and
    key replicated, dataset batch sharded over "data". Sample tensors inside
    shard over "sample" via the step's own constraints."""
    rep = replicated_sharding(mesh)
    dat = data_sharding(mesh)
    return jax.jit(step_fn, in_shardings=(rep, rep) + (dat,) * 7)


def make_sharded_apply(apply_fn, mesh):
    """Shard a pure inference apply (variables replicated, batch sharded)."""
    rep = replicated_sharding(mesh)
    dat = data_sharding(mesh)
    return jax.jit(apply_fn, in_shardings=(rep, dat), out_shardings=dat)
