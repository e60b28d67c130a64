"""Quantify — in mm — what the Jacobi-vs-LAPACK SVD sign divergence does to
FINAL eval metrics for a converted torch checkpoint (round-3 VERDICT task 2a).

Background: the reference's hierarchical pose head feeds each joint's MLP its
ancestors' U_proper columns from torch.svd on CPU (LAPACK gesdd — reference
models/poseMF_shapeGaussian_net.py:137-152). gesdd's U/V column signs are
algorithm-path-defined; the on-device Jacobi kernel (ops/svd3.py) makes
different (equally valid) sign choices. S_proper and the mode rotation
U_proper @ V_proper^T are provably sign-INVARIANT (flipping column k of U
forces the same flip on V to preserve F, and det/properisation cancel the
flips), so the ONLY sign-sensitive MLP input is U_proper itself.
tests/test_svd_sign_parity.py measured the resulting mode divergence at
kinematic depth >= 1 (median ~4.7 deg for a random-init converted net); this
script converts that into the units that matter: final PVE / MPJPE metric
deltas from two otherwise-identical full eval runs.

Runs the COMPLETE eval driver (proxy build -> predictor -> SMPL -> sampling
-> metric trackers) twice on the CPU backend — svd_impl='jacobi' vs 'lapack'
(the host-gesdd callback that reproduces torch.svd signs; it cannot execute
on the axon TPU backend, which is exactly why this gap needs numbers) — with
a checkpoint converted from a torch-initialised reference net, on a
deterministic synthetic-assets dataset (synthetic SMPL body, GT-projected
COCO gaussian heatmaps). Prints a metric table plus the DIRECT
prediction-vs-prediction PVE/MPJPE between the two runs' predicted bodies.

Caveat (stated in PARITY.md): no trained reference checkpoint ships in this
environment, so the net is torch-INITIALISED, not trained. Random MLP weights
propagate input sign flips at full gain — a trained net's sensitivity may
differ — but the harness runs unchanged on a real converted checkpoint the
moment one exists (swap `make_converted_variables` for a checkpoint load).

Usage: python benchmarks/svd_parity_mm.py [n_frames] [proxy_size]
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

import numpy as np
import jax

# The env var alone does not beat a pre-registered PJRT plugin (axon);
# the config flag must be set before backend initialisation.
jax.config.update("jax_platforms", "cpu")

METRICS = ["PVE", "PVE-SC", "PVE-PA", "PVE_samples_min",
           "MPJPE", "MPJPE-SC", "MPJPE-PA"]


def make_converted_variables(seed=3):
    """Reference torch net (torch default init) -> flax variables."""
    import torch
    if "/root/reference" not in sys.path:
        sys.path.append("/root/reference")
    import importlib
    net_ref = importlib.import_module("models.poseMF_shapeGaussian_net")

    from hierarchicalprobabilistic3dhuman_tpu.configs import (
        get_pose_shape_cfg_defaults)
    from hierarchicalprobabilistic3dhuman_tpu.models.pose_mf_shape_gaussian_net import (
        torch_to_flax_predictor)
    from hierarchicalprobabilistic3dhuman_tpu.models.smpl import SMPL_PARENTS

    torch.manual_seed(seed)
    cfg = get_pose_shape_cfg_defaults()
    ref = net_ref.PoseMFShapeGaussianNet(smpl_parents=list(SMPL_PARENTS),
                                         config=cfg).eval()
    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    return torch_to_flax_predictor(sd)


class _SyntheticEvalDataset:
    """Deterministic synthetic eval frames: GT SMPL pose/shape, COCO-17
    keypoints perspective-projected from the GT body, gaussian heatmaps
    (what the proxy builder consumes) and a fixed noise image for the edge
    channel. Identical across both eval runs by construction."""

    def __init__(self, smpl, n, d, seed=11):
        import jax.numpy as jnp
        from hierarchicalprobabilistic3dhuman_tpu.utils.cam_utils import (
            perspective_project)
        from hierarchicalprobabilistic3dhuman_tpu.utils.label_conversions import (
            ALL_JOINTS_TO_COCO_MAP)

        rng = np.random.RandomState(seed)
        self.n = n
        self.d = d
        self.poses = (rng.randn(n, 72) * 0.25).astype(np.float32)
        self.shapes = (rng.randn(n, 10) * 0.8).astype(np.float32)
        self.images = rng.rand(n, 3, d, d).astype(np.float32)

        out = smpl(body_pose=jnp.asarray(self.poses[:, 3:]),
                   global_orient=jnp.asarray(self.poses[:, :3]),
                   betas=jnp.asarray(self.shapes))
        joints_coco = out["joints"][:, np.asarray(ALL_JOINTS_TO_COCO_MAP)]
        cam_t = jnp.tile(jnp.asarray([[0.0, -0.2, 2.5]], np.float32), (n, 1))
        j2d = perspective_project(joints_coco, rotation=None,
                                  translation=cam_t,
                                  focal_length=300.0 * d / 256.0, img_wh=d)
        self.keypoints = np.clip(np.asarray(j2d), 0, d - 1).astype(np.float32)

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        from hierarchicalprobabilistic3dhuman_tpu.utils.label_conversions import (
            convert_2Djoints_to_gaussian_heatmaps)
        hm = convert_2Djoints_to_gaussian_heatmaps(
            self.keypoints[i].astype(np.int32), self.d)
        return {"image": self.images[i],
                "heatmaps": np.transpose(hm, (2, 0, 1)).astype(np.float32),
                "pose": self.poses[i], "shape": self.shapes[i],
                "fname": f"synth_{i:04d}.png", "gender": "n"}


def run_eval(svd_impl, variables, smpl, dataset, cfg, save_dir):
    import jax.numpy as jnp
    from hierarchicalprobabilistic3dhuman_tpu.evaluate.evaluate_pose_mf_shape_gaussian_net import (
        evaluate_pose_mf_shape_gaussian_net)
    from hierarchicalprobabilistic3dhuman_tpu.models.canny_edge_detector import (
        CannyEdgeDetector)
    from hierarchicalprobabilistic3dhuman_tpu.models.pose_mf_shape_gaussian_net import (
        PoseMFShapeGaussianNet)

    model = PoseMFShapeGaussianNet(svd_impl=svd_impl)
    apply_fn = lambda proxy: model.apply(variables, jnp.asarray(proxy),
                                         train=False)
    os.makedirs(save_dir, exist_ok=True)
    return evaluate_pose_mf_shape_gaussian_net(
        pose_shape_apply=apply_fn, pose_shape_cfg=cfg,
        smpl_neutral=smpl, smpl_male=smpl, smpl_female=smpl,
        edge_detect_model=CannyEdgeDetector(),
        metrics=METRICS, eval_dataset=dataset,
        batch_size=8, num_workers=0, num_samples_for_metrics=10,
        save_path=save_dir, save_per_frame_metrics=True, rng_seed=0)


def pred_vs_pred_mm(smpl, dir_a, dir_b):
    """Direct geometric distance between the two runs' PREDICTED bodies —
    the purest measure of what the sign divergence alone does (GT-relative
    metrics partly cancel it)."""
    import jax.numpy as jnp
    out = {}
    pa = np.load(os.path.join(dir_a, "pose_per_frame.npy"))
    pb = np.load(os.path.join(dir_b, "pose_per_frame.npy"))
    sa = np.load(os.path.join(dir_a, "shape_per_frame.npy"))
    sb = np.load(os.path.join(dir_b, "shape_per_frame.npy"))

    def fwd(pose, shape):
        rm = jnp.asarray(pose.reshape(-1, 24, 3, 3))
        return smpl(body_pose=rm[:, 1:], global_orient=rm[:, :1],
                    betas=jnp.asarray(shape), pose2rot=False)

    oa, ob = fwd(pa, sa), fwd(pb, sb)
    va = np.asarray(oa["vertices"]) - np.asarray(oa["joints"])[:, :1]
    vb = np.asarray(ob["vertices"]) - np.asarray(ob["joints"])[:, :1]
    out["pred-vs-pred PVE"] = float(
        np.linalg.norm(va - vb, axis=-1).mean() * 1000.0)
    ja = np.asarray(oa["joints"]) - np.asarray(oa["joints"])[:, :1]
    jb = np.asarray(ob["joints"]) - np.asarray(ob["joints"])[:, :1]
    out["pred-vs-pred MPJPE"] = float(
        np.linalg.norm(ja[:, :24] - jb[:, :24], axis=-1).mean() * 1000.0)
    return out


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    d = int(sys.argv[2]) if len(sys.argv) > 2 else 256

    from hierarchicalprobabilistic3dhuman_tpu.configs import (
        get_pose_shape_cfg_defaults)
    from hierarchicalprobabilistic3dhuman_tpu.models.smpl import SMPL
    from hierarchicalprobabilistic3dhuman_tpu.ops.svd3 import (
        lapack_mode_supported)

    assert lapack_mode_supported(), "CPU backend must support host callbacks"

    cfg = get_pose_shape_cfg_defaults()
    cfg.DATA.PROXY_REP_SIZE = d
    smpl = SMPL.synthetic(seed=0)
    variables = make_converted_variables()
    dataset = _SyntheticEvalDataset(smpl, n, d)

    base = os.path.join(_REPO, "parity_evaluations", "svd_mm")
    # lapack_callback = the numpy-gesdd host callback (the torch reference's
    # exact sign conventions) — the parity TARGET. jacobi = the training
    # default. lapack = the device-native gesdd emulation (works on TPU).
    impls = ("jacobi", "lapack", "lapack_callback")
    results = {}
    for impl in impls:
        print(f"\n=== full synthetic-assets eval, svd_impl={impl} "
              f"(n={n}, proxy {d}^2) ===", flush=True)
        results[impl] = run_eval(impl, variables, smpl, dataset, cfg,
                                 os.path.join(base, impl))

    hdr = " ".join(f"{i:>15s}" for i in impls)
    print(f"\n{'metric':20s} {hdr}   (mm where applicable; "
          f"diffs are vs lapack_callback)")
    for m in METRICS:
        scale = 1000.0 if ("PVE" in m or "MPJPE" in m) else 1.0
        row = " ".join(f"{float(results[i][m]) * scale:15.3f}" for i in impls)
        ref = float(results["lapack_callback"][m])
        diffs = " ".join(
            f"{abs(float(results[i][m]) - ref) * scale:9.3f}"
            for i in ("jacobi", "lapack"))
        print(f"{m:20s} {row}   |diff| {diffs}")

    for impl in ("jacobi", "lapack"):
        direct = pred_vs_pred_mm(smpl, os.path.join(base, impl),
                                 os.path.join(base, "lapack_callback"))
        for k, v in direct.items():
            print(f"{impl:16s} vs callback {k:22s} {v:10.3f}")


if __name__ == "__main__":
    main()
