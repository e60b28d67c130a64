"""Real-photo end-to-end fixture.

The reference ships 12 demo photos (reference demo/00000.png..00011.png)
that SURVEY §4.2 nominates as the predict smoke fixture; the same images
live in /demo here. This module asserts the fixture is intact (fast) and
runs the REAL predict CLI on demo photos end-to-end — HRNet-W48 forward,
Canny edges, distribution predictor, SMPL, uncertainty sampling — checking
outputs exist, are finite and are deterministic across runs (slow tier).

Weights are random-init (no trained checkpoints ship in this environment;
cli/predict.py prints the smoke-mode warning) and SMPL is the synthetic
fallback, so the OUTPUT GEOMETRY is not human — what this pins is the full
real-photo pipeline: decode, bbox, crop/resize, proxy construction,
prediction, sampling and artifact writing on reference-sized inputs.
"""

import os

import numpy as np
import cv2
import pytest

DEMO_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "demo")


def test_demo_fixture_intact():
    fnames = sorted(os.listdir(DEMO_DIR))
    assert fnames == [f"{i:05d}.png" for i in range(12)]
    # Spot-decode two: real RGB photos, reference-scale resolutions.
    for f in (fnames[0], fnames[7]):
        img = cv2.imread(os.path.join(DEMO_DIR, f))
        assert img is not None and img.ndim == 3 and img.shape[2] == 3
        assert min(img.shape[:2]) >= 256, img.shape
        assert img.std() > 10  # a photo, not a constant


def _run_cli(image_dir, save_dir, extra):
    from hierarchicalprobabilistic3dhuman_tpu.cli.predict import (
        build_parser, run_predict)
    args = build_parser().parse_args(
        ["--image_dir", image_dir, "--save_dir", save_dir,
         "--cropped_images"] + extra)
    return run_predict(args)


@pytest.mark.slow
def test_demo_predict_cli_end_to_end_deterministic(tmp_path):
    # Two demo photos through the batched serving path (--no_vis writes
    # outputs.npz): full-size HRNet-W48 + 256^2 proxy predictor on real
    # photos, twice — byte-identical outputs.
    sub = tmp_path / "imgs"
    sub.mkdir()
    for f in ("00000.png", "00001.png"):
        cv2.imwrite(str(sub / f), cv2.imread(os.path.join(DEMO_DIR, f)))

    outs = []
    for run in range(2):
        out_dir = str(tmp_path / f"out{run}")
        _run_cli(str(sub), out_dir, ["--batch_size", "2", "--no_vis"])
        npz = os.path.join(out_dir, "outputs.npz")
        assert os.path.exists(npz)
        outs.append({k: v for k, v in np.load(npz, allow_pickle=True).items()})

    a, b = outs
    assert set(a) == set(b)
    for k in a:
        if a[k].dtype.kind in "fc":
            assert np.all(np.isfinite(a[k])), k
            np.testing.assert_array_equal(a[k], b[k], err_msg=k)
    # Shapes: one row per image.
    assert a["pose"].shape[0] == 2


@pytest.mark.slow
def test_demo_predict_cli_visualisation_outputs(tmp_path):
    # One demo photo through the per-image path with figures on: the vis
    # PNG must be written and non-degenerate.
    sub = tmp_path / "imgs"
    sub.mkdir()
    cv2.imwrite(str(sub / "00002.png"),
                cv2.imread(os.path.join(DEMO_DIR, "00002.png")))
    out_dir = str(tmp_path / "out")
    results = _run_cli(str(sub), out_dir, [])

    assert set(results) == {"00002.png"}
    res = results["00002.png"]
    for key in ("pose_mode", "shape_mean", "cam", "per_vertex_uncertainty"):
        assert np.all(np.isfinite(np.asarray(res[key]))), key
    vis = [f for f in os.listdir(out_dir) if f.endswith(".png")]
    assert vis, os.listdir(out_dir)
    img = cv2.imread(os.path.join(out_dir, vis[0]))
    assert img is not None and img.std() > 1
