"""Convention-parity tests against the torch reference for the trickiest
convention-dependent code: DensePose UV preprocessing and heatmap generation
(SURVEY's 'convention minefield')."""

import sys

import numpy as np
import jax.numpy as jnp
import pytest

RNG = np.random.RandomState(31)


def _ref_path():
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")


def test_densepose_preprocessing_parity():
    """Vectorised DP preprocessing == the reference's python-loop version."""
    import torch
    _ref_path()
    # The reference renderer module imports pytorch3d at top level; extract
    # just the preprocessing function by executing its source up to the
    # pytorch3d imports.
    src = open("/root/reference/renderers/pytorch3d_textured_renderer.py").read()
    func_src = src[src.index("def preprocess_densepose_UV"):src.index("class TexturedIUVRenderer")]
    ns = {"torch": torch, "np": np, "loadmat": __import__("scipy.io", fromlist=["loadmat"]).loadmat}
    exec(func_src, ns)
    ref_uv_offset, ref_iuv, ref_map, ref_faces = ns["preprocess_densepose_UV"](
        "model_files/UV_Processed.mat", batch_size=1)

    from hierarchicalprobabilistic3dhuman_tpu.renderers.textured_iuv_renderer import (
        preprocess_densepose_UV)
    ours = preprocess_densepose_UV()

    np.testing.assert_array_equal(ours["faces"], ref_faces[0].numpy())
    np.testing.assert_array_equal(ours["verts_map"], ref_map.numpy())
    np.testing.assert_allclose(ours["verts_uv_offset"],
                               ref_uv_offset[0].numpy(), atol=1e-6)
    np.testing.assert_allclose(ours["verts_iuv"], ref_iuv[0].numpy(), atol=1e-6)


def test_heatmap_parity_with_reference_numpy_and_torch():
    """One implementation reproduces BOTH reference heatmap variants
    (whose u/v argument order differs by meshgrid convention)."""
    import torch
    _ref_path()
    from utils.label_conversions import (
        convert_2Djoints_to_gaussian_heatmaps as ref_np,
        convert_2Djoints_to_gaussian_heatmaps_torch as ref_torch)
    from hierarchicalprobabilistic3dhuman_tpu.utils.label_conversions import (
        convert_2Djoints_to_gaussian_heatmaps,
        convert_2Djoints_to_gaussian_heatmaps_batched)

    j2d = RNG.randint(5, 60, (17, 2)).astype(np.float32)
    ours_np = np.asarray(convert_2Djoints_to_gaussian_heatmaps(j2d, 64, std=4))
    theirs_np = ref_np(j2d, 64, std=4)
    np.testing.assert_allclose(ours_np, theirs_np, atol=1e-5)

    ours_t = np.asarray(convert_2Djoints_to_gaussian_heatmaps_batched(
        jnp.asarray(j2d[None]), 64, std=4))
    theirs_t = ref_torch(torch.from_numpy(j2d[None]), 64, std=4).numpy()
    np.testing.assert_allclose(ours_t, theirs_t, atol=1e-5)


def test_heatmap_argmax_parity_with_reference():
    import torch
    _ref_path()
    from utils.label_conversions import (
        convert_heatmaps_to_2Djoints_coordinates_torch as ref_fn)
    from hierarchicalprobabilistic3dhuman_tpu.utils.label_conversions import (
        convert_heatmaps_to_2Djoints_coordinates)

    hm = RNG.rand(2, 17, 32, 32).astype(np.float32)
    hm[0, 3] = 0.0  # invisible joint
    ours_j, ours_v = convert_heatmaps_to_2Djoints_coordinates(jnp.asarray(hm))
    ref_j, ref_v = ref_fn(torch.from_numpy(hm))
    np.testing.assert_allclose(np.asarray(ours_j), ref_j.numpy())
    np.testing.assert_array_equal(np.asarray(ours_v), ref_v.numpy())


def test_cfgnode_matches_reference_defaults():
    """Our default config tree has exactly the reference's keys and values."""
    _ref_path()
    # reference configs import yacs (absent) — compare against the dumped
    # YAML structure instead via our own tree and a hand-check of a few
    # critical values from the reference source.
    from hierarchicalprobabilistic3dhuman_tpu.configs import get_pose_shape_cfg_defaults
    cfg = get_pose_shape_cfg_defaults()
    src = open("/root/reference/configs/poseMF_shapeGaussian_net_config.py").read()
    import re
    # every `_C.A.B.C = value` line in the reference must exist with equal value
    for line in src.splitlines():
        m = re.match(r"_C\.([A-Z0-9_.]+) = (.+?)(\s*#.*)?$", line.strip())
        if not m or "CfgNode" in m.group(2):
            continue
        keypath, value_src = m.group(1), m.group(2)
        node = cfg
        for part in keypath.split("."):
            assert part in node, f"missing config key {keypath}"
            node = node[part]
        try:
            expected = eval(value_src)
        except SyntaxError:
            continue  # value continues on the next source line
        if keypath == "LOSS.SAMPLE_ON_CPU":
            continue  # deliberately False here: no CPU hop needed on TPU
        assert node == expected, (keypath, node, expected)

    # Multi-line value checked explicitly:
    assert cfg.TRAIN.SYNTH_DATA.AUGMENT.PROXY_REP.REMOVE_PARTS_PROBS == [
        0.1, 0.1, 0.1, 0.1, 0.1, 0.1, 0.05, 0.05, 0.05, 0.05, 0.1, 0.1,
        0.1, 0.1, 0.05, 0.05, 0.05, 0.05, 0.1, 0.1, 0.1, 0.1, 0.05, 0.05]
