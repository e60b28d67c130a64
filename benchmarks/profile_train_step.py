"""Capture an XLA device trace of the stage-2 train step and print the
per-HLO-op time breakdown.

Drives runtime/profiling's jax.profiler tracing around a few warmed-up
steps, then parses the captured .xplane.pb with xprof's converter (the
tensorboard_plugin_profile wheel in this image is broken against its TF,
but `xprof.convert.raw_to_tool_data` works) and prints the top ops by
self-time — the evidence base for "where do the 190 ms go".

Usage: python benchmarks/profile_train_step.py [batch_size] [out_dir]
"""

import glob
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def capture(out_dir, B=72):
    import jax
    from benchmarks import _scratch_cache
    _scratch_cache.enable()
    import jax.numpy as jnp
    import optax

    from hierarchicalprobabilistic3dhuman_tpu.configs import (
        get_pose_shape_cfg_defaults)
    from hierarchicalprobabilistic3dhuman_tpu.models.canny_edge_detector import (
        CannyEdgeDetector)
    from hierarchicalprobabilistic3dhuman_tpu.models.pose_mf_shape_gaussian_net import (
        PoseMFShapeGaussianNet)
    from hierarchicalprobabilistic3dhuman_tpu.models.smpl import SMPL
    from hierarchicalprobabilistic3dhuman_tpu.renderers import TexturedIUVRenderer
    from hierarchicalprobabilistic3dhuman_tpu.train.train_pose_mf_shape_gaussian_net import (
        make_train_step, TrainState)

    cfg = get_pose_shape_cfg_defaults()
    D = cfg.DATA.PROXY_REP_SIZE
    smpl = SMPL.synthetic()
    renderer = TexturedIUVRenderer(
        img_wh=D, projection_type="perspective",
        perspective_focal_length=cfg.TRAIN.SYNTH_DATA.FOCAL_LENGTH,
        render_rgb=True)
    edge = CannyEdgeDetector(threshold=cfg.DATA.EDGE_THRESHOLD)
    model = PoseMFShapeGaussianNet()
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 18, D, D)))
    opt = optax.adam(cfg.TRAIN.LR)
    step = make_train_step(model, cfg, smpl, renderer, edge, cfg.LOSS.STAGE2,
                           opt, train=True)

    rng = np.random.RandomState(0)
    pose = jnp.asarray((rng.randn(B, 72) * 0.3).astype(np.float32))
    bg = jnp.asarray((rng.rand(B, 3, D, D) * 255).astype(np.uint8))
    tex = jnp.asarray((rng.rand(B, 7829, 3) * 255).astype(np.uint8))
    state = TrainState(variables["params"], variables["batch_stats"],
                       opt.init(variables["params"]))
    key = jax.random.PRNGKey(0)

    def one(i, state):
        out = step(state, jax.random.fold_in(key, i), pose, bg, tex)
        jax.block_until_ready(out[1])
        return out[0]

    for i in range(3):  # warm-up/compile
        state = one(i, state)
    with jax.profiler.trace(out_dir):
        for i in range(3, 6):
            state = one(i, state)
    print("trace captured to", out_dir)


def analyse(out_dir, top=30):
    from xprof.convert import raw_to_tool_data

    xplanes = sorted(glob.glob(os.path.join(out_dir, "**", "*.xplane.pb"),
                               recursive=True))
    assert xplanes, f"no xplane files under {out_dir}"
    data, _ = raw_to_tool_data.xspace_to_tool_data(
        [xplanes[-1]], "hlo_stats", {})
    if isinstance(data, bytes):
        data = data.decode("utf-8", "replace")
    obj = json.loads(data)
    # hlo_stats arrives gviz-style: locate columns by label.
    cols = [c.get("label", c.get("id", "")) for c in obj["cols"]]

    def col(label_substr):
        for i, c in enumerate(cols):
            if label_substr.lower() in str(c).lower():
                return i
        return None

    i_cat = col("category")
    i_name = col("HLO op name") or col("name")
    i_self = col("Total self time (us)") or col("self time")
    rows = []
    for r in obj["rows"]:
        v = r["c"]
        rows.append((v[i_cat]["v"] if i_cat is not None else "?",
                     v[i_name]["v"], float(v[i_self]["v"] or 0.0)))
    total = sum(t for _, _, t in rows)
    by_cat = {}
    for cat, _, t in rows:
        by_cat[cat] = by_cat.get(cat, 0.0) + t
    print(f"\n== categories (total {total/1e3:.1f} ms over traced steps) ==")
    for cat, t in sorted(by_cat.items(), key=lambda kv: -kv[1]):
        print(f"{t/1e3:9.2f} ms  {100*t/total:5.1f}%  {cat}")
    print(f"\n== top {top} HLO ops by self time ==")
    for cat, name, t in sorted(rows, key=lambda r: -r[2])[:top]:
        print(f"{t/1e3:9.2f} ms  {100*t/total:5.1f}%  [{cat}] {str(name)[:90]}")


if __name__ == "__main__":
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 72
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/train_trace"
    capture(out_dir, B=B)
    analyse(out_dir)
