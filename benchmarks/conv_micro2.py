"""Follow-up conv probes: is the ~650us/op cost real conv time or harness/
lowering overhead?

  chain2    two chained 3x3 48->48 convs per iteration (marginal cost test)
  chain4    four chained convs
  b64       batch 64 instead of 16 (4x work)
  f32       f32 instead of bf16
  gemm48    the im2col-equivalent matmul (110592, 432) @ (432, 48)
  gemm128   (110592, 432) @ (432, 128)
  gemm512   (110592, 512) @ (512, 512) (MXU sanity: should approach peak)

Usage: python benchmarks/conv_micro2.py [iters]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B, H, W, C = 16, 96, 72, 48


def main():
    import jax
    from benchmarks import _scratch_cache
    _scratch_cache.enable()
    import jax.numpy as jnp
    from jax import lax

    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    rng = np.random.RandomState(0)

    def conv(x, w):
        return lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))

    def mk(shape, dtype=jnp.bfloat16, scale=0.05):
        return jnp.asarray((rng.rand(*shape) * scale).astype(np.float32),
                           dtype)

    x48 = mk((B, H, W, C))
    w48 = mk((3, 3, C, C))
    x64b = mk((64, H, W, C))
    xf32 = mk((B, H, W, C), jnp.float32)
    wf32 = mk((3, 3, C, C), jnp.float32)
    M = B * H * W
    a432 = mk((M, 432))
    b432_48 = mk((432, 48))
    b432_128 = mk((432, 128))
    a512 = mk((M, 512))
    b512 = mk((512, 512))

    xf96 = mk((B, H, W // 2, 2 * C))
    wf96 = mk((3, 3, 2 * C, 2 * C))

    def chain(n, x, w):
        for _ in range(n):
            x = conv(x, w)
        return x.mean()

    cases = {
        "base48": (lambda t: conv(t[0], t[1]).mean(), (x48, w48), 1),
        "chain8": (lambda t: chain(8, t[0], t[1]), (x48, w48), 8),
        "foldW4": (lambda t: chain(4, t[0], t[1]), (xf96, wf96), 4),
        "foldW8": (lambda t: chain(8, t[0], t[1]), (xf96, wf96), 8),
        "chain2": (lambda t: conv(conv(t[0], t[1]), t[1]).mean(),
                   (x48, w48), 2),
        "chain4": (lambda t: conv(conv(conv(conv(t[0], t[1]), t[1]), t[1]),
                                  t[1]).mean(), (x48, w48), 4),
        "b64": (lambda t: conv(t[0], t[1]).mean(), (x64b, w48), 4),
        "f32": (lambda t: conv(t[0], t[1]).mean(), (xf32, wf32), 1),
        "gemm48": (lambda t: jnp.dot(t[0], t[1]).mean(), (a432, b432_48), 1),
        "gemm128": (lambda t: jnp.dot(t[0], t[1]).mean(), (a432, b432_128), 1),
        "gemm512": (lambda t: jnp.dot(t[0], t[1]).mean(), (a512, b512), 1),
    }
    flops = {
        "base48": 2 * M * 9 * C * C, "chain2": 4 * M * 9 * C * C,
        "chain4": 8 * M * 9 * C * C, "b64": 8 * M * 9 * C * C,
        "f32": 2 * M * 9 * C * C, "gemm48": 2 * M * 432 * 48,
        "chain8": 16 * M * 9 * C * C,
        "foldW4": 4 * 2 * M * 9 * (2 * C) * (2 * C) // 2,
        "foldW8": 8 * 2 * M * 9 * (2 * C) * (2 * C) // 2,
        "gemm128": 2 * M * 432 * 128, "gemm512": 2 * M * 512 * 512,
    }

    print(f"iters={iters}")
    for name, (f, args, nops) in cases.items():
        @jax.jit
        def loop(args):
            def body(i, acc):
                eps = (1 + jnp.float32(i) * jnp.float32(1e-9)) \
                    .astype(args[0].dtype)
                return acc + f((args[0] * eps,) + tuple(args[1:])) \
                    .astype(jnp.float32)
            return jax.lax.fori_loop(0, iters, body, jnp.float32(0))

        float(np.asarray(loop(args)))
        t0 = time.perf_counter()
        float(np.asarray(loop(args)))
        dt = (time.perf_counter() - t0) / iters
        print(f"{name:8s} {dt*1e6:9.1f} us/iter  {dt/nops*1e6:8.1f} us/op  "
              f"{flops[name]/dt/1e12:6.1f} TF/s", flush=True)


if __name__ == "__main__":
    main()
