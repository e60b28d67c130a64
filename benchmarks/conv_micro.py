"""Microbenchmark: candidate restructurings of the HRNet branch-0 conv.

The round-3 profile shows the (16, 96, 72, 48) 3x3x48->48 convs dominate
HRNet-W48 (~6% of bf16 peak, 'Compute'-bound: 48 channels waste 128-wide
MXU lanes on both K and N). Candidates, all computing a 3x3/48ch-equivalent
amount of useful work per "layer":

  base48    (16,96,72,48)  3x3 48->48          the current op
  pad64     (16,96,72,64)  3x3 64->64          channel-padded weights
  pad128    (16,96,72,128) 3x3 128->128        (2.67x logical FLOPs)
  fold3x3   (16,48,36,192) 3x3 192->192        dense space-to-depth fold
                                               (4.00x logical FLOPs)
  fold2x2   (16,48,36,192) 2x2 192->192        zero-padded-4x4 fold
                                               (1.78x logical FLOPs)
  nchw48    (16,48,96,72)  3x3 48->48 NCHW in  layout control

Prints ms/op and the implied EFFECTIVE rate in useful-FLOPs of the original
48-channel conv, i.e. time-per-useful-work — the decision metric.

Usage: python benchmarks/conv_micro.py [iters]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B, H, W, C = 16, 96, 72, 48
USEFUL_FLOPS = 2 * B * H * W * 9 * C * C  # one 3x3 48->48 conv


def main():
    import jax
    from benchmarks import _scratch_cache
    _scratch_cache.enable()
    import jax.numpy as jnp
    from jax import lax

    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    rng = np.random.RandomState(0)

    def conv_nhwc(x, w, window_strides=(1, 1), padding="SAME"):
        return lax.conv_general_dilated(
            x, w, window_strides, padding,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    cases = {}

    def add_case(name, shape_x, shape_w, flops_mult, dims=None):
        x = jnp.asarray(rng.rand(*shape_x).astype(np.float32),
                        jnp.bfloat16)
        w = jnp.asarray((rng.randn(*shape_w) * 0.05).astype(np.float32),
                        jnp.bfloat16)

        def f(x, w):
            if dims is None:
                return conv_nhwc(x, w)
            return lax.conv_general_dilated(x, w, (1, 1), "SAME",
                                            dimension_numbers=dims)
        cases[name] = (f, x, w, flops_mult)

    add_case("base48", (B, H, W, C), (3, 3, C, C), 1.0)
    add_case("pad64", (B, H, W, 64), (3, 3, 64, 64), (64 / 48) ** 2)
    add_case("pad128", (B, H, W, 128), (3, 3, 128, 128), (128 / 48) ** 2)
    add_case("fold3x3", (B, H // 2, W // 2, 4 * C), (3, 3, 4 * C, 4 * C), 4.0)
    add_case("fold2x2", (B, H // 2, W // 2, 4 * C), (2, 2, 4 * C, 4 * C),
             16 / 9)
    add_case("nchw48", (B, C, H, W), (C, C, 3, 3), 1.0,
             dims=("NCHW", "OIHW", "NCHW"))

    print(f"B={B} spatial={H}x{W} C={C} iters={iters} "
          f"useful={USEFUL_FLOPS/1e9:.2f} GFLOP/op")
    for name, (f, x, w, mult) in cases.items():
        @jax.jit
        def loop(x, w):
            def body(i, acc):
                eps = (1 + jnp.float32(i) * jnp.float32(1e-9)).astype(x.dtype)
                return acc + f(x * eps, w).astype(jnp.float32).mean()
            return jax.lax.fori_loop(0, iters, body, jnp.float32(0))

        float(np.asarray(loop(x, w)))  # compile+warm
        t0 = time.perf_counter()
        float(np.asarray(loop(x, w)))
        dt = (time.perf_counter() - t0) / iters
        eff = USEFUL_FLOPS / dt / 1e12
        hw = USEFUL_FLOPS * mult / dt / 1e12
        print(f"{name:9s} {dt*1e6:9.1f} us/op  useful-rate {eff:6.1f} TF/s  "
              f"hw-rate {hw:6.1f} TF/s  (x{mult:.2f} FLOPs)", flush=True)


if __name__ == "__main__":
    main()
