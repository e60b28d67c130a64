"""TPU-executable numeric spot-check tier (round-3 VERDICT tasks 4 + 9).

The pytest suite forces the CPU backend (tests/conftest.py), so a
TPU-specific numerics regression — a bf16 matmul default creeping into a
new op, an axon backend quirk — passes CI and would only surface as
silently shifted training. This script runs value-level checks ON THE REAL
CHIP, each diffed against the same computation on the in-process CPU
backend (JAX exposes both), and prints one PASS/FAIL line per check.

Checks (~seconds each, inside the bench budget):
  1. loss_canary        full loss stack (MF NLL, shape NLL, 2D/3D MSEs,
                        both stage weight sets) vs CPU backend
  2. metric_sums        on-device eval metric sums (incl. Procrustes) vs CPU
  3. svd_jacobi         proper-SVD invariants on TPU: orthogonality,
                        det(U)=det(V)=+1, reconstruction, S order
  4. svd_gesdd          device-native LAPACK-sign SVD (ops/lapack_svd3):
                        reconstruction + bit-sign agreement vs numpy gesdd
  5. sampler_moments    matrix-Fisher/Bingham sampler mean-rotation moment
                        vs CPU backend
  6. render_256         Pallas rasterizer vs XLA rasterizer ON TPU, 256^2
  7. render_512         same at 512^2 (the SMEM-budget tile-sizing regime;
                        round-3 VERDICT weak #4) — also reports ms/img
  8. golden_tpu         (--golden) the 8+8-step fixed-seed training
                        trajectory of tests/test_golden_run.py executed on
                        TPU vs the committed CPU golden envelope (task 9)

Usage: python benchmarks/tpu_checks.py [--golden]
Exit code 0 iff every requested check passes. Latest recorded output:
benchmarks/TPU_CHECKS_OUTPUT.txt.
"""

import argparse
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

import numpy as np

_RESULTS = []


def _report(name, ok, detail):
    _RESULTS.append(ok)
    print(f"[{'PASS' if ok else 'FAIL'}] {name:16s} {detail}", flush=True)


def _on_cpu(fn, *args):
    import jax
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        args = [jax.device_put(np.asarray(a), cpu) for a in args]
        out = jax.jit(fn)(*args)
        return jax.tree_util.tree_map(np.asarray, out)


def _on_tpu(fn, *args):
    import jax
    out = jax.jit(fn)(*args)
    return jax.tree_util.tree_map(np.asarray, out)


def _rel(a, b):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    denom = np.maximum(np.abs(b), 1e-6)
    return float(np.max(np.abs(a - b) / denom))


def check_loss_canary():
    """Same tensor recipe as tests/test_golden_run.py's fast canary."""
    import jax.numpy as jnp
    from hierarchicalprobabilistic3dhuman_tpu.configs import (
        get_pose_shape_cfg_defaults)
    from hierarchicalprobabilistic3dhuman_tpu.losses.matrix_fisher_loss import (
        PoseMFShapeGaussianLoss)
    from hierarchicalprobabilistic3dhuman_tpu.ops.svd3 import proper_svd3x3

    rng = np.random.RandomState(77)
    B, K, V, J = 2, 17, 40, 14
    F = (rng.randn(B, 23, 3, 3) * 0.5 + np.eye(3)).astype(np.float32)

    def build(F):
        svd = proper_svd3x3(F)
        pred = {"pose_params_F": F, "pose_params_U": svd["U"],
                "pose_params_S": svd["S"], "pose_params_V": svd["V"]}
        return pred

    rng2 = np.random.RandomState(78)
    extra_pred = {
        "shape_mean": rng2.randn(B, 10).astype(np.float32),
        "shape_log_std": (rng2.randn(B, 10) * 0.1).astype(np.float32),
        "joints2D": (rng2.randn(B, 3, K, 2) * 0.5).astype(np.float32),
        "glob_rotmats": rng2.randn(B, 3, 3).astype(np.float32),
        "verts": rng2.randn(B, V, 3).astype(np.float32),
        "joints3D": rng2.randn(B, J, 3).astype(np.float32)}
    tgt = {"pose_params_rotmats": np.broadcast_to(
               np.eye(3, dtype=np.float32), (B, 23, 3, 3)).copy(),
           "shape_params": rng2.randn(B, 10).astype(np.float32),
           "joints2D": (rng2.rand(B, K, 2) * 64).astype(np.float32),
           "joints2D_vis": rng2.rand(B, K) > 0.3,
           "glob_rotmats": rng2.randn(B, 3, 3).astype(np.float32),
           "verts": rng2.randn(B, V, 3).astype(np.float32),
           "joints3D": rng2.randn(B, J, 3).astype(np.float32)}
    cfg = get_pose_shape_cfg_defaults()

    ok_all, details = True, []
    for name, stage_cfg in (("STAGE1", cfg.LOSS.STAGE1),
                            ("STAGE2", cfg.LOSS.STAGE2)):
        loss_fn = PoseMFShapeGaussianLoss(stage_cfg, img_wh=64)

        def run(F, tgt=tgt, loss_fn=loss_fn):
            pred = dict(build(jnp.asarray(F)), **{
                k: jnp.asarray(v) for k, v in extra_pred.items()})
            total, terms = loss_fn(
                {k: jnp.asarray(v) for k, v in tgt.items()}, pred)
            return total, terms

        (t_total, t_terms) = _on_tpu(run, F)
        (c_total, c_terms) = _on_cpu(run, F)
        r = max([_rel(t_total, c_total)]
                + [_rel(t_terms[k], c_terms[k]) for k in c_terms])
        ok_all &= r < 5e-3
        details.append(f"{name} maxrel {r:.2e}")
    _report("loss_canary", ok_all, "; ".join(details) + " (env 5e-3)")


def check_metric_sums():
    from hierarchicalprobabilistic3dhuman_tpu.metrics.metric_sums import (
        make_metric_sums_fn)
    rng = np.random.RandomState(5)
    B, V, J = 4, 120, 14
    metrics = ["PVE", "PVE-SC", "PVE-PA", "MPJPE", "MPJPE-SC", "MPJPE-PA"]
    fn = make_metric_sums_fn(metrics, img_wh=64)
    pred = {"verts": rng.randn(B, V, 3).astype(np.float32),
            "joints3D": rng.randn(B, J, 3).astype(np.float32)}
    tgt = {"verts": (pred["verts"] + rng.randn(B, V, 3) * 0.05).astype(np.float32),
           "joints3D": (pred["joints3D"] + rng.randn(B, J, 3) * 0.05).astype(np.float32)}
    reposed_p = rng.randn(B, V, 3).astype(np.float32)
    reposed_t = (reposed_p + rng.randn(B, V, 3) * 0.02).astype(np.float32)

    import jax.numpy as jnp

    def run(pv, pj, tv, tj, rp_, rt_):
        return fn({"verts": pv, "joints3D": pj},
                  {"verts": tv, "joints3D": tj}, rp_, rt_)

    args = (pred["verts"], pred["joints3D"], tgt["verts"], tgt["joints3D"],
            reposed_p, reposed_t)
    t = _on_tpu(run, *args)
    c = _on_cpu(run, *args)
    r = max(_rel(t[k], c[k]) for k in c)
    _report("metric_sums", r < 5e-3,
            f"{len(c)} sums maxrel {r:.2e} (env 5e-3; Procrustes incl.)")


def check_svd_jacobi():
    from hierarchicalprobabilistic3dhuman_tpu.ops.svd3 import proper_svd3x3
    rng = np.random.RandomState(9)
    F = (rng.randn(4096, 3, 3)).astype(np.float32)
    out = _on_tpu(proper_svd3x3, F)
    U, S, V = out["U"], out["S"], out["V"]          # raw factors: F = U S V^T
    Up, Vp = out["U_proper"], out["V_proper"]       # rotations (det +1)
    eye = np.eye(3, dtype=np.float32)
    orth = max(np.abs(U.transpose(0, 2, 1) @ U - eye).max(),
               np.abs(V.transpose(0, 2, 1) @ V - eye).max())
    det = max(np.abs(np.linalg.det(Up) - 1).max(),
              np.abs(np.linalg.det(Vp) - 1).max())
    rec = np.abs(U @ (S[..., None] * V.transpose(0, 2, 1)) - F).max()
    order = np.all(S[:, :-1] >= S[:, 1:] - 1e-6)
    ok = orth < 2e-5 and det < 1e-4 and rec < 2e-4 and bool(order)
    _report("svd_jacobi", ok,
            f"orth {orth:.1e} proper-det-1 {det:.1e} recon {rec:.1e} "
            f"S-sorted {bool(order)} (4096 lanes)")


def check_svd_gesdd():
    from hierarchicalprobabilistic3dhuman_tpu.ops.lapack_svd3 import (
        svd3x3_gesdd)
    rng = np.random.RandomState(3)
    F = rng.randn(2000, 3, 3).astype(np.float32)
    t0 = time.perf_counter()
    U, S, V = _on_tpu(svd3x3_gesdd, F)
    dt = time.perf_counter() - t0
    rec = np.abs(U @ (S[..., None] * V.transpose(0, 2, 1)) - F).max()
    Un, Sn, Vtn = np.linalg.svd(F)
    agree = np.mean(np.all(np.abs(U - Un) < 1e-4, axis=(1, 2))
                    & np.all(np.abs(V - Vtn.transpose(0, 2, 1)) < 1e-4,
                             axis=(1, 2)))
    s_exact = np.abs(S - Sn).max()
    ok = rec < 2e-4 and agree >= 0.95 and s_exact < 1e-4
    _report("svd_gesdd", ok,
            f"recon {rec:.1e} sign-agree {agree:.3f} (floor 0.95) "
            f"S maxdiff {s_exact:.1e} [{dt*1e3:.0f} ms incl. compile]")


def check_sampler_moments():
    import jax
    import jax.numpy as jnp
    from hierarchicalprobabilistic3dhuman_tpu.ops.bingham_sampling import (
        pose_matrix_fisher_sampling)
    from hierarchicalprobabilistic3dhuman_tpu.ops.svd3 import proper_svd3x3
    rng = np.random.RandomState(21)
    F = (rng.randn(8, 23, 3, 3) * 0.5 + 4 * np.eye(3)).astype(np.float32)

    def run(F):
        svd = proper_svd3x3(F)
        R = pose_matrix_fisher_sampling(
            jax.random.PRNGKey(0), svd["U"], svd["S"], svd["V"],
            num_samples=64)                       # (B, N, J, 3, 3)
        mode = svd["U"] @ jnp.swapaxes(svd["V"], -1, -2)
        return R, mode

    R_t, mode_t = _on_tpu(run, F)
    R_c, _ = _on_cpu(run, F)
    # Identical PRNG stream on both backends -> samples must agree closely;
    # and the sample mean must concentrate around the mode (trace near 3 at
    # S ~ 4 concentration).
    samp_diff = np.abs(R_t - R_c).max()
    mean_R = R_t.mean(axis=1)                     # (B, J, 3, 3)
    align = mode_t.transpose(0, 1, 3, 2) @ mean_R
    trace = np.trace(align, axis1=-2, axis2=-1).mean()
    ok = samp_diff < 5e-3 and trace > 2.5
    _report("sampler_moments", ok,
            f"TPU-vs-CPU sample maxdiff {samp_diff:.1e} (env 5e-3), "
            f"mean alignment trace {trace:.3f} (floor 2.5)")


def _render_check(hw, n_rep=3):
    import jax
    import jax.numpy as jnp
    from hierarchicalprobabilistic3dhuman_tpu.ops.rasterizer import rasterize
    from hierarchicalprobabilistic3dhuman_tpu.ops.rasterizer_pallas import (
        rasterize_batched_pallas)
    rng = np.random.RandomState(13)
    V, Fc, B = 600, 1200, 2
    verts = np.stack([np.stack(
        [rng.rand(V) * (hw - 2), rng.rand(V) * (hw - 2), rng.rand(V) * 3 + 1],
        axis=-1) for _ in range(B)]).astype(np.float32)
    faces = rng.randint(0, V, (Fc, 3)).astype(np.int32)
    attrs = rng.rand(B, V, 5).astype(np.float32)

    fx = jax.jit(lambda v, a: rasterize(v, jnp.asarray(faces), a, (hw, hw),
                                        backend="xla"))
    fp = jax.jit(lambda v, a: rasterize_batched_pallas(
        v, jnp.asarray(faces), a, (hw, hw)))
    o_x = jax.tree_util.tree_map(np.asarray, fx(verts, attrs))
    o_p = jax.tree_util.tree_map(np.asarray, fp(verts, attrs))

    t0 = time.perf_counter()
    for _ in range(n_rep):
        jax.block_until_ready(fp(verts, attrs))
    ms = (time.perf_counter() - t0) / (n_rep * B) * 1e3

    mask_eq = np.array_equal(o_x["mask"], o_p["mask"])
    same = o_x["mask"] & o_p["mask"]
    attr_d = np.abs(o_p["attrs"][same] - o_x["attrs"][same]).max() \
        if same.any() else 0.0
    depth_d = np.abs(o_p["depth"][same] - o_x["depth"][same]).max() \
        if same.any() else 0.0
    cover = float(o_p["mask"].mean())
    ok = mask_eq and attr_d < 1e-3 and depth_d < 1e-3 and cover > 0.3
    _report(f"render_{hw}", ok,
            f"mask_eq {mask_eq} attr maxdiff {attr_d:.1e} depth {depth_d:.1e} "
            f"cover {cover:.2f} | {ms:.2f} ms/img wall incl. host dispatch "
            f"(kernel time: benchmarks/raster_micro.py)")


def check_golden_tpu():
    """Task 9: the CPU golden trajectory, executed on TPU. Envelope is
    deliberately loose (different fusion order + transcendental
    implementations vs the CPU run recorded under
    jax_disable_most_optimizations, compounded through 16 Adam steps);
    what it pins is the REGIME — a dropped loss term, a wrong flip or a
    broken kernel moves losses by orders of magnitude, not percents.

    Runs under f32 matmul precision to be apples-to-apples with the CPU
    golden: at the TPU's bf16 default the very FIRST step's loss deviated
    122% (14622 vs 6593) while its PVE agreed to 0.5% — pure init-step
    chaos amplification in the loss surface, measured rel 0.004 at f32
    precision with the same kernels. The bf16-default training regime is
    covered separately (loss_canary single-step envelopes + the long-run
    stability tests); this check is about the kernels, not the precision
    default."""
    import jax
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "golden_run_mod", os.path.join(_REPO, "tests", "test_golden_run.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    with jax.default_matmul_precision("highest"):
        losses, pve, _ = mod._run_trajectory()
    g = np.load(os.path.join(_REPO, "tests", "golden",
                             "train_trajectory.npz"))
    finite = np.all(np.isfinite(losses)) and np.all(np.isfinite(pve))
    rel_l = np.abs(losses - g["losses"]) / np.abs(g["losses"])
    rel_p = np.abs(pve - g["pve_means"]) / np.abs(g["pve_means"])
    ok = bool(finite and np.median(rel_l) < 0.25 and rel_l.max() < 1.0
              and np.median(rel_p) < 0.25)
    _report("golden_tpu", ok,
            f"loss rel median {np.median(rel_l):.3f} max {rel_l.max():.3f} "
            f"(env median<0.25 max<1.0); PVE rel median "
            f"{np.median(rel_p):.3f}")


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--golden", action="store_true",
                        help="also run the 8+8-step TPU golden trajectory "
                             "(adds ~2-4 min of compiles)")
    args = parser.parse_args()

    import jax
    plat = jax.devices()[0].platform
    print(f"backend: {plat} ({jax.devices()[0]})", flush=True)
    if plat == "cpu":
        print("WARNING: no accelerator — checks degenerate to CPU-vs-CPU.",
              flush=True)

    check_loss_canary()
    check_metric_sums()
    check_svd_jacobi()
    check_svd_gesdd()
    check_sampler_moments()
    _render_check(256)
    _render_check(512)
    if args.golden:
        check_golden_tpu()

    n_ok = sum(_RESULTS)
    print(f"\n{n_ok}/{len(_RESULTS)} checks passed", flush=True)
    sys.exit(0 if n_ok == len(_RESULTS) else 1)


if __name__ == "__main__":
    main()
