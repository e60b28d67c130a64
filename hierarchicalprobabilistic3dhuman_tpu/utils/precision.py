"""Mixed-precision helpers for TPU inference.

The MXU natively multiplies bfloat16 at ~2x the f32-emulation rate and
halves HBM traffic for weights/activations. flax modules built with
dtype=None infer their computation dtype from input/param promotion, so
casting a variable tree + inputs to bfloat16 runs the whole network in
bfloat16 without touching model code. Used for the inference-only encoders
(HRNet-W48, the predict pipeline's biggest network); the probabilistic head
(SVD, matrix-Fisher) stays float32.
"""

import jax
import jax.numpy as jnp


def cast_floating(tree, dtype=jnp.bfloat16):
    """Cast every floating-point leaf of a pytree to `dtype` (ints/bools
    untouched). Use on a flax variable dict for reduced-precision inference;
    keep the float32 originals for training/checkpointing."""
    def cast(x):
        x = jnp.asarray(x)
        if jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(dtype)
        return x
    return jax.tree.map(cast, tree)


def bf16_apply(apply_fn, variables):
    """Wrap a flax apply: runs in bfloat16, returns float32 outputs.

    >>> hrnet_bf16 = bf16_apply(hrnet.apply, hrnet_vars)
    >>> heatmaps = hrnet_bf16(images_f32)
    """
    cast_vars = cast_floating(variables, jnp.bfloat16)

    def wrapped(x, *args, **kwargs):
        out = apply_fn(cast_vars, x.astype(jnp.bfloat16), *args, **kwargs)
        return jax.tree.map(
            lambda a: a.astype(jnp.float32)
            if jnp.issubdtype(jnp.asarray(a).dtype, jnp.floating) else a, out)
    return wrapped


def bf16_apply_pure(apply_fn):
    """Params-explicit variant of bf16_apply: wrapped(variables, x).

    The variable tree is cast to bfloat16 INSIDE the traced computation, so
    callers can pass the float32 tree as a jit argument. Weights passed as
    arguments (rather than closed over) stay out of the compiled program's
    constant pool — on a tunnel-attached TPU, tracing a closure over
    device-resident weights downloads every array to host to embed it as an
    MLIR constant and rebloats the serialized executable by the full weight
    size (~400 MB for HRNet-W48), which dominated run_predict start-up.
    """
    def wrapped(variables, x, *args, **kwargs):
        out = apply_fn(cast_floating(variables, jnp.bfloat16),
                       x.astype(jnp.bfloat16), *args, **kwargs)
        return jax.tree.map(
            lambda a: a.astype(jnp.float32)
            if jnp.issubdtype(jnp.asarray(a).dtype, jnp.floating) else a, out)
    return wrapped
