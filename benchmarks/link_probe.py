"""Measure the host->device upload bandwidth of THIS rig's device link.

The batched predict CLI ships uint8 HWC images (786 KB per 512^2 RGB
image); on a tunnel-attached TPU the link, not the device, bounds folder
serving throughput. This probe measures the real device_put bandwidth so a
serving wall-clock can be checked against the link's physical ceiling:

    ceiling_img_per_s = bandwidth_MB_per_s / MB_per_image

On the round-4 benchmark rig the tunnel measured ~26-32 MB/s warm (varies
by time of day; round 3 saw ~50 MB/s), giving a 33-40 img/s ceiling at
512^2 — and `run_predict.py --batch_size 64 --no_vis --bf16` over
pre-decoded npz shards measured 41.6-44 img/s steady-state, i.e. the CLI
runs AT the link ceiling and the remaining gap to the 750+ img/s device
bench is wire bytes, not program structure. (Sync via scalar fetch:
block_until_ready alone can return early on axon.)

Usage: python benchmarks/link_probe.py [mb_per_transfer] [trials]
"""

import sys
import time

import numpy as np


def main():
    import jax

    mb = float(sys.argv[1]) if len(sys.argv) > 1 else 12.6
    trials = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    n = int(mb * 1e6 / (512 * 512 * 3)) or 1
    x = np.random.randint(0, 256, (n, 512, 512, 3), np.uint8)
    actual_mb = x.nbytes / 1e6

    a = jax.device_put(x[:1])
    _ = float(np.asarray(a[0, 0, 0, 0]))        # warm path + real sync

    rates = []
    for _ in range(trials):
        t0 = time.time()
        a = jax.device_put(x)
        _ = float(np.asarray(a[0, 0, 0, 0]))
        dt = time.time() - t0
        rates.append(actual_mb / dt)
        print(f"upload {actual_mb:.1f} MB ({n} x 512^2 uint8 images): "
              f"{dt:.2f}s = {rates[-1]:.1f} MB/s "
              f"= {n / dt:.1f} img/s ceiling", flush=True)
    best = max(rates)
    print(f"best: {best:.1f} MB/s -> 512^2 serving ceiling "
          f"{best / (512 * 512 * 3 / 1e6):.1f} img/s")


if __name__ == "__main__":
    main()
