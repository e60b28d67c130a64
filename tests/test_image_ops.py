"""Affine resample / crop / uncrop / Canny tests vs cv2 and the torch reference."""

import sys

import numpy as np
import cv2
import jax
import jax.numpy as jnp
import pytest

from hierarchicalprobabilistic3dhuman_tpu.ops.resample import (
    affine_resample, invert_affine, transform_points)
from hierarchicalprobabilistic3dhuman_tpu.utils.image_utils import (
    bbox_from_mask, bbox_from_joints2d, batch_crop_affine, batch_uncrop_affine,
    batch_add_rgb_background, convert_bbox_corners_to_centre_hw)
from hierarchicalprobabilistic3dhuman_tpu.models.canny_edge_detector import CannyEdgeDetector

RNG = np.random.RandomState(5)


def test_invert_affine():
    A = np.zeros((4, 2, 3), np.float32)
    A[:, 0, 0] = RNG.rand(4) + 0.5
    A[:, 1, 1] = RNG.rand(4) + 0.5
    A[:, 0, 1] = RNG.rand(4) * 0.1
    A[:, :, 2] = RNG.randn(4, 2) * 10
    inv = np.asarray(invert_affine(jnp.asarray(A)))
    for i in range(4):
        M = np.eye(3); M[:2] = A[i]
        Minv = np.linalg.inv(M)
        np.testing.assert_allclose(inv[i], Minv[:2], atol=1e-4)


def test_affine_resample_matches_cv2():
    img = RNG.rand(2, 3, 64, 64).astype(np.float32)
    affine = np.zeros((2, 2, 3), np.float32)
    affine[:, 0, 0] = [2.0, 0.8]
    affine[:, 1, 1] = [2.0, 0.8]
    affine[:, 0, 2] = [-10.0, 5.0]
    affine[:, 1, 2] = [-20.0, 3.0]

    ours = np.asarray(affine_resample(jnp.asarray(img), jnp.asarray(affine),
                                      (48, 48), mode="bilinear"))
    for b in range(2):
        ref = cv2.warpAffine(img[b].transpose(1, 2, 0), affine[b], (48, 48),
                             flags=cv2.INTER_LINEAR, borderMode=cv2.BORDER_CONSTANT,
                             borderValue=0).transpose(2, 0, 1)
        # cv2 uses fixed-point arithmetic internally; allow small tolerance.
        diff = np.abs(ours[b] - ref)
        assert np.quantile(diff, 0.99) < 0.02, diff.max()


def test_affine_resample_nearest_pad_val():
    img = jnp.ones((1, 1, 8, 8))
    affine = jnp.asarray([[[1.0, 0.0, -100.0], [0.0, 1.0, -100.0]]])  # everything out of frame
    out = affine_resample(img, affine, (8, 8), mode="nearest", pad_val=7.0)
    np.testing.assert_allclose(np.asarray(out), 7.0)


def test_bbox_from_mask_matches_numpy():
    mask = np.zeros((3, 32, 32), np.float32)
    mask[0, 5:20, 8:25] = 1
    mask[1, 0:4, 30:32] = 1
    mask[2, 16, 16] = 1
    corners = np.asarray(bbox_from_mask(jnp.asarray(mask)))
    for b in range(3):
        pix = np.argwhere(mask[b] != 0)
        expected = np.concatenate([pix.min(axis=0), pix.max(axis=0)])
        np.testing.assert_allclose(corners[b], expected)


def test_bbox_from_mask_empty_fallback():
    mask = jnp.zeros((1, 16, 16))
    corners = np.asarray(bbox_from_mask(mask))
    np.testing.assert_allclose(corners[0], [0, 0, 15, 15])


def test_bbox_from_joints():
    j = np.array([[[10.0, 20.0], [30.0, 5.0], [50.0, 60.0]]], np.float32)
    vis = np.array([[True, True, False]])
    corners = np.asarray(bbox_from_joints2d(jnp.asarray(j), jnp.asarray(vis), (256, 256)))
    np.testing.assert_allclose(corners[0], [5.0, 10.0, 20.0, 30.0])  # [ymin xmin ymax xmax]


def test_crop_centres_the_bbox():
    """A crop around a known box puts its centre at the output centre."""
    seg = np.zeros((1, 128, 128), np.float32)
    seg[0, 30:70, 40:100] = 1.0   # centre (49.5, 69.5), h 39, w 59
    rgb = RNG.rand(1, 3, 128, 128).astype(np.float32)
    out = batch_crop_affine((64, 64), rgb=jnp.asarray(rgb), seg=jnp.asarray(seg),
                            orig_scale_factor=1.2)
    # bbox centre maps to output centre
    affine = np.asarray(out["affine_trans"][0])
    centre_in = np.array([69.5, 49.5, 1.0])  # (x, y, 1)
    mapped = affine @ centre_in
    np.testing.assert_allclose(mapped, [32.0, 32.0], atol=1e-4)
    # cropped seg is centred: foreground present and roughly centred
    cs = np.asarray(out["seg"][0])
    pix = np.argwhere(cs != 0)
    c = (pix.min(0) + pix.max(0)) / 2
    np.testing.assert_allclose(c, [31.5, 31.5], atol=1.0)


def test_crop_uncrop_roundtrip_joints():
    """Joints cropped then mapped back with the inverse affine land where they started."""
    j = jnp.asarray(RNG.rand(2, 17, 2).astype(np.float32) * 200 + 20)
    vis = jnp.ones((2, 17), bool)
    out = batch_crop_affine((256, 256), joints2D=j, joints2D_vis=vis)
    inv = invert_affine(out["affine_trans"])
    back = transform_points(inv, out["joints2D"])
    np.testing.assert_allclose(np.asarray(back), np.asarray(j), atol=1e-3)


def test_uncrop_puts_pixels_back():
    rgb = np.zeros((1, 3, 100, 100), np.float32)
    rgb[:, :, 40:60, 40:60] = 1.0
    seg = (rgb[:, 0] > 0).astype(np.float32)
    out = batch_crop_affine((64, 64), rgb=jnp.asarray(rgb), seg=jnp.asarray(seg),
                            orig_scale_factor=1.0)
    un = batch_uncrop_affine((64, 64), (100, 100), out["bbox_centres"],
                             out["bbox_heights"], out["bbox_widths"],
                             rgb=out["rgb"])
    back = np.asarray(un["rgb"][0, 0])
    # The white square should be back at roughly its original place.
    pix = np.argwhere(back > 0.5)
    assert pix.min(0)[0] >= 38 and pix.max(0)[0] <= 61
    assert pix.min(0)[1] >= 38 and pix.max(0)[1] <= 61


def test_crop_jitter_determinism():
    seg = np.zeros((2, 128, 128), np.float32)
    seg[:, 30:90, 30:90] = 1
    key = jax.random.PRNGKey(0)
    o1 = batch_crop_affine((64, 64), seg=jnp.asarray(seg), delta_scale_range=[-0.3, 0.2],
                           delta_centre_range=[-5, 5], rng_key=key)
    o2 = batch_crop_affine((64, 64), seg=jnp.asarray(seg), delta_scale_range=[-0.3, 0.2],
                           delta_centre_range=[-5, 5], rng_key=key)
    np.testing.assert_allclose(np.asarray(o1["seg"]), np.asarray(o2["seg"]))
    o3 = batch_crop_affine((64, 64), seg=jnp.asarray(seg), delta_scale_range=[-0.3, 0.2],
                           delta_centre_range=[-5, 5], rng_key=jax.random.PRNGKey(1))
    assert not np.allclose(np.asarray(o1["bbox_heights"]), np.asarray(o3["bbox_heights"]))


def test_add_rgb_background():
    rgb = jnp.ones((1, 3, 8, 8)) * 0.5
    bg = jnp.ones((1, 3, 8, 8))
    seg = jnp.zeros((1, 8, 8)).at[0, 2:4, 2:4].set(1.0)
    out = np.asarray(batch_add_rgb_background(bg, rgb, seg))
    assert out[0, 0, 2, 2] == 0.5
    assert out[0, 0, 0, 0] == 1.0


def test_canny_parity_with_reference():
    import torch
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    from models.canny_edge_detector import CannyEdgeDetector as RefCanny

    img = RNG.rand(2, 3, 64, 64).astype(np.float32)
    ours = CannyEdgeDetector(non_max_suppression=True, gaussian_filter_std=1.0,
                             gaussian_filter_size=5, threshold=0.0)(jnp.asarray(img))
    ref = RefCanny(non_max_suppression=True, gaussian_filter_std=1.0,
                   gaussian_filter_size=5, threshold=0.0)
    with torch.no_grad():
        theirs = ref(torch.from_numpy(img))

    for k in ["blurred_img", "grad_magnitude", "thresholded_thin_edges"]:
        a = np.asarray(ours[k])
        b = theirs[k].numpy()
        # NMS flips on exact ties at float precision; compare where not razor-edge
        if k == "thresholded_thin_edges":
            agree = np.mean((a > 0) == (b > 0))
            assert agree > 0.995, agree
        else:
            np.testing.assert_allclose(a, b, atol=1e-5)


def test_canny_edge_on_step_image():
    img = np.zeros((1, 3, 32, 32), np.float32)
    img[:, :, :, 16:] = 1.0
    out = CannyEdgeDetector(threshold=0.0)(jnp.asarray(img))
    edges = np.asarray(out["thresholded_thin_edges"][0, 0])
    # Interior rows only: zero-padding at the image border creates edge
    # responses along the top/bottom of the white region (reference does too).
    interior = edges[8:24, 4:28]
    cols = np.argwhere(interior.max(axis=0) > 0.5).ravel() + 4
    assert set(cols) <= {15, 16}  # thin edge at the step
    assert len(cols) >= 1


def test_separable_resample_matches_gather():
    """Axis-aligned affines: matmul path == gather path (both modes, padding)."""
    img = RNG.rand(3, 4, 40, 40).astype(np.float32)
    affine = np.zeros((3, 2, 3), np.float32)
    affine[:, 0, 0] = [2.0, 0.7, 1.3]
    affine[:, 1, 1] = [2.0, 0.7, 1.3]
    affine[:, 0, 2] = [-10.0, 5.0, 3.0]
    affine[:, 1, 2] = [-25.0, 2.0, -8.0]
    for mode, pad in (("bilinear", 0.0), ("nearest", -1.0), ("bilinear", 2.5)):
        sep = affine_resample(jnp.asarray(img), jnp.asarray(affine), (32, 48),
                              mode=mode, pad_val=pad)
        gat = affine_resample(jnp.asarray(img), jnp.asarray(affine), (32, 48),
                              mode=mode, pad_val=pad, force_gather=True)
        np.testing.assert_allclose(np.asarray(sep), np.asarray(gat),
                                   atol=2e-5, err_msg=f"{mode} pad={pad}")


def test_general_affine_uses_gather():
    """Rotated affines fall back to the gather kernel and stay correct."""
    img = RNG.rand(1, 1, 32, 32).astype(np.float32)
    c, s = np.cos(0.3), np.sin(0.3)
    affine = np.array([[[c, -s, 8.0], [s, c, -3.0]]], np.float32)
    out = affine_resample(jnp.asarray(img), jnp.asarray(affine), (32, 32))
    ref = cv2.warpAffine(img[0, 0], affine[0], (32, 32), flags=cv2.INTER_LINEAR,
                         borderMode=cv2.BORDER_CONSTANT, borderValue=0)
    diff = np.abs(np.asarray(out[0, 0]) - ref)
    assert np.quantile(diff, 0.99) < 0.02


def test_traced_rotation_affine_is_correct_under_jit():
    """A TRACED rotation affine must not silently take the separable path.

    Regression for the round-1 landmine: affine_resample assumed traced
    transforms were axis-aligned. Now traced transforms default to the
    general gather kernel; assume_axis_aligned=True is the explicit opt-in.
    """
    import jax

    img = RNG.rand(2, 1, 32, 32).astype(np.float32)
    c, s = np.cos(0.4), np.sin(0.4)
    affine = np.tile(np.array([[[c, -s, 6.0], [s, c, -2.0]]], np.float32),
                     (2, 1, 1))

    jitted = jax.jit(lambda im, a: affine_resample(im, a, (32, 32)))
    out = np.asarray(jitted(jnp.asarray(img), jnp.asarray(affine)))
    ref = np.asarray(affine_resample(jnp.asarray(img), jnp.asarray(affine),
                                     (32, 32), force_gather=True))
    np.testing.assert_allclose(out, ref, atol=1e-5)

    # Axis-aligned opt-in under jit still matches the gather kernel.
    aligned = np.zeros((2, 2, 3), np.float32)
    aligned[:, 0, 0] = aligned[:, 1, 1] = 1.5
    aligned[:, 0, 2] = -4.0
    jitted_fast = jax.jit(lambda im, a: affine_resample(
        im, a, (32, 32), assume_axis_aligned=True))
    fast = np.asarray(jitted_fast(jnp.asarray(img), jnp.asarray(aligned)))
    ref2 = np.asarray(affine_resample(jnp.asarray(img), jnp.asarray(aligned),
                                      (32, 32), force_gather=True))
    np.testing.assert_allclose(fast, ref2, atol=2e-5)
