"""Joint-set maps, body-part-seg conversions and joint<->heatmap transforms.

JAX/numpy equivalents of the reference's utils/label_conversions.py. The
reference has two heatmap generators whose (u, v) arguments are swapped
relative to each other purely because of numpy-vs-torch meshgrid indexing
conventions (reference :89-124); here there is a single row/col-explicit
implementation used by both entry points, with a regression test guaranteeing
it matches both reference variants.
"""

import numpy as np
import jax.numpy as jnp

COCO_JOINTS = {
    'Right Ankle': 16, 'Right Knee': 14, 'Right Hip': 12,
    'Left Hip': 11, 'Left Knee': 13, 'Left Ankle': 15,
    'Right Wrist': 10, 'Right Elbow': 8, 'Right Shoulder': 6,
    'Left Shoulder': 5, 'Left Elbow': 7, 'Left Wrist': 9,
    'Right Ear': 4, 'Left Ear': 3, 'Right Eye': 2, 'Left Eye': 1,
    'Nose': 0,
}

# The SMPL wrapper (models/smpl.py) returns 90 joints; subsets used downstream
# (reference utils/label_conversions.py:17-20).
ALL_JOINTS_TO_COCO_MAP = [24, 26, 25, 28, 27, 16, 17, 18, 19, 20, 21, 1, 2, 4, 5, 7, 8]
ALL_JOINTS_TO_H36M_MAP = list(range(73, 90))
H36M_TO_J17 = [6, 5, 4, 1, 2, 3, 16, 15, 14, 11, 12, 13, 8, 10, 0, 7, 9]
H36M_TO_J14 = H36M_TO_J17[:14]

# 24-part seg class -> COCO joint (reference :24-35).
TWENTYFOUR_PART_SEG_TO_COCO_JOINTS_MAP = {19: 7, 21: 7, 20: 8, 22: 8, 4: 9, 3: 10,
                                          12: 13, 14: 13, 11: 14, 13: 14, 5: 15, 6: 16}

# DensePose 24-part -> 14-part lookup (reference :38-72), index 0 = background.
_DP24_TO_14 = np.array([0,  # background
                        1, 1, 11, 12, 14, 13, 8, 6, 8, 6, 9, 7,
                        9, 7, 2, 4, 2, 4, 3, 5, 3, 5, 10, 10], dtype=np.int32)


def convert_densepose_seg_to_14part_labels(densepose_seg):
    """24 DensePose part labels -> 14 part labels (reference :38-72).

    On device the 25-entry LUT is evaluated as a sum of equality masks
    (generic gather over a (B, wh, wh) index array was ~44 ms of the fused
    training step on v5e; 25 fused compare+select passes are ~free on VPU).
    """
    if isinstance(densepose_seg, np.ndarray):
        return _DP24_TO_14[densepose_seg.astype(np.int64)]
    seg = densepose_seg.astype(jnp.int32)
    out = jnp.zeros_like(seg)
    for cls in range(1, 25):
        out = out + jnp.int32(_DP24_TO_14[cls]) * (seg == cls)
    return out


def convert_multiclass_to_binary_labels(multiclass_labels):
    """Multiclass segmentation -> binary mask (reference :75-86)."""
    xp = np if isinstance(multiclass_labels, np.ndarray) else jnp
    return (multiclass_labels != 0).astype(xp.int32)


def _gaussian_heatmaps_rowcol(j2d_col, j2d_row, img_wh, std):
    """exp(-((col - u)^2 + (row - v)^2) / (2 std^2)) on an img_wh x img_wh grid.

    Computed SEPARABLY as the outer product of two 1-D Gaussians — 2*W
    transcendentals per joint instead of W^2 (the 2-D exp over a 256^2 grid
    per joint was a measurable cost in the jitted training step).

    :param j2d_col: (..., N) horizontal (column/u) coords
    :param j2d_row: (..., N) vertical (row/v) coords
    :return: (..., N, img_wh, img_wh)
    """
    grid = jnp.arange(img_wh, dtype=jnp.float32)
    gc = jnp.exp(-((grid - j2d_col[..., None]) / std) ** 2 / 2.0)  # (..., N, W)
    gr = jnp.exp(-((grid - j2d_row[..., None]) / std) ** 2 / 2.0)  # (..., N, H)
    return gr[..., :, None] * gc[..., None, :]


def convert_2Djoints_to_gaussian_heatmaps(joints2D, img_wh, std=4):
    """Unbatched heatmaps, channels-last (reference numpy variant :89-102).

    :param joints2D: (N, 2) [u, v] pixel coords
    :return: (img_wh, img_wh, N)
    """
    joints2D = jnp.asarray(joints2D, dtype=jnp.float32)
    hm = _gaussian_heatmaps_rowcol(joints2D[:, 0], joints2D[:, 1], img_wh, float(std))
    return jnp.transpose(hm, (1, 2, 0))


def convert_2Djoints_to_gaussian_heatmaps_batched(joints2D, img_wh, std=4):
    """Batched heatmaps, channels-first (reference torch variant :105-124).

    :param joints2D: (B, N, 2) [u, v] pixel coords
    :return: (B, N, img_wh, img_wh)
    """
    joints2D = jnp.asarray(joints2D, dtype=jnp.float32)
    return _gaussian_heatmaps_rowcol(joints2D[..., 0], joints2D[..., 1], img_wh, float(std))


def convert_heatmaps_to_2Djoints_coordinates(joints2D_heatmaps, eps=1e-6):
    """Heatmaps -> argmax coordinates + visibility (reference :127-155).

    :param joints2D_heatmaps: (B, K, H, W)
    :return: joints2D (B, K, 2) [u=x, v=y] with -1 for invisible joints,
             joints2D_vis (B, K) bool (max heatmap value > eps)
    """
    B, K, H, W = joints2D_heatmaps.shape
    flat = joints2D_heatmaps.reshape(B, K, H * W)
    max_vals = jnp.max(flat, axis=-1)
    max_idx = jnp.argmax(flat, axis=-1)
    x = (max_idx % W).astype(jnp.float32)
    y = jnp.floor(max_idx.astype(jnp.float32) / float(W))
    joints2D = jnp.stack([x, y], axis=-1)
    vis = max_vals > eps
    joints2D = jnp.where(vis[..., None], joints2D, -1.0)
    return joints2D, vis
