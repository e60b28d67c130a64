"""Profile the HRNet-W48 forward on TPU and print the per-op time breakdown.

Drives hrnet.apply (bf16, B=16 by default, bench.py shapes) under
jax.profiler.trace, then parses the captured xplane with xprof and prints the
top ops by self time — attributing the ~65% of the predict step that HRNet
costs (round-2 VERDICT item 1) so optimisation goes where the time is:
convolution MXU time vs layout transposes vs BN/elementwise vs resize
gathers.

Usage: python benchmarks/profile_hrnet.py [B] [iters] [f32|bf16]
"""

import glob
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def dump_op_stats(logdir, top=40):
    """Parse the xplane capture under logdir; print per-category totals and
    top self-time HLO ops (same hlo_stats path as profile_train_step)."""
    from xprof.convert import raw_to_tool_data

    xplanes = sorted(glob.glob(os.path.join(logdir, "**", "*.xplane.pb"),
                               recursive=True))
    if not xplanes:
        print("no xplane captured", file=sys.stderr)
        return None
    data, _ = raw_to_tool_data.xspace_to_tool_data(
        [xplanes[-1]], "hlo_stats", {})
    if isinstance(data, bytes):
        data = data.decode("utf-8", "replace")
    obj = json.loads(data)
    cols = [c.get("label", c.get("id", "")) for c in obj["cols"]]

    def col(label_substr):
        for i, c in enumerate(cols):
            if label_substr.lower() in str(c).lower():
                return i
        return None

    i_cat = col("category")
    i_name = col("HLO op name")
    if i_name is None:
        i_name = col("name")
    i_self = col("Total self time (us)")
    if i_self is None:
        i_self = col("self time")
    rows = []
    for r in obj["rows"]:
        v = r["c"]
        rows.append((v[i_cat]["v"] if i_cat is not None else "?",
                     v[i_name]["v"], float(v[i_self]["v"] or 0.0)))
    total = sum(t for _, _, t in rows)
    by_cat = {}
    for cat, _, t in rows:
        by_cat[cat] = by_cat.get(cat, 0.0) + t
    print(f"\n== categories (total {total/1e3:.2f} ms traced) ==")
    for cat, t in sorted(by_cat.items(), key=lambda kv: -kv[1]):
        print(f"{t/1e3:9.2f} ms  {100*t/total:5.1f}%  {cat}")
    print(f"\n== top {top} HLO ops by self time ==")
    for cat, name, t in sorted(rows, key=lambda r: -r[2])[:top]:
        print(f"{t/1e3:9.2f} ms  {100*t/total:5.1f}%  [{cat}] {str(name)[:95]}")
    return rows


def main():
    import jax
    from benchmarks import _scratch_cache
    _scratch_cache.enable()
    import jax.numpy as jnp

    from hierarchicalprobabilistic3dhuman_tpu.configs import (
        get_pose2d_hrnet_cfg_defaults)
    from hierarchicalprobabilistic3dhuman_tpu.models.hrnet import (
        PoseHighResolutionNet)
    from hierarchicalprobabilistic3dhuman_tpu.utils.precision import (
        cast_floating)

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    dtype = sys.argv[3] if len(sys.argv) > 3 else "bf16"

    hrnet_cfg = get_pose2d_hrnet_cfg_defaults()
    in_w, in_h = hrnet_cfg.MODEL.IMAGE_SIZE

    hrnet = PoseHighResolutionNet(num_joints=17)
    hrnet_vars = hrnet.init(jax.random.PRNGKey(1),
                            jnp.zeros((1, 3, in_h, in_w)))
    if dtype == "bf16":
        hrnet_vars = cast_floating(hrnet_vars)

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(B, 3, in_h, in_w).astype(np.float32))
    if dtype == "bf16":
        x = x.astype(jnp.bfloat16)

    @jax.jit
    def loop(x, v):
        def body(i, carry):
            eps = (jnp.float32(i) * jnp.float32(1e-12)).astype(x.dtype)
            return carry + hrnet.apply(v, x * (1 + eps)) \
                .astype(jnp.float32).mean()
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0))

    float(np.asarray(loop(x, hrnet_vars)))  # compile + warm
    t0 = time.perf_counter()
    float(np.asarray(loop(x, hrnet_vars)))
    dt = (time.perf_counter() - t0) / iters
    print(f"hrnet_{dtype} B={B}: {dt*1e3:.3f} ms/step "
          f"{dt/B*1e6:.1f} us/img", flush=True)

    logdir = "/tmp/hrnet_profile"
    os.system(f"rm -rf {logdir}")
    with jax.profiler.trace(logdir):
        float(np.asarray(loop(x, hrnet_vars)))
    dump_op_stats(logdir)


if __name__ == "__main__":
    main()
