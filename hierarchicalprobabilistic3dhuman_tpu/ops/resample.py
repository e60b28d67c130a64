"""Affine image resampling primitive: one gather-based kernel shared by
crop, uncrop and resize.

Replaces both of the reference's warp paths (cv2.warpAffine in
utils/image_utils.py:205-229 and torch affine_grid+grid_sample :336-376)
with a single convention: forward affine maps INPUT pixel coords (x=horizontal,
y=vertical, centres at integers, like OpenCV) to OUTPUT pixel coords as
`out = A @ [x, y, 1]`. Sampling inverts the transform per output pixel and
gathers with bilinear or nearest interpolation and constant out-of-frame
padding. Fully batched, jit/vmap-safe, static shapes.
"""


import numpy as np
import jax
import jax.numpy as jnp


def invert_affine(affine_trans):
    """Invert batched 2x3 affine transforms (..., 2, 3)."""
    A = affine_trans[..., :2]
    t = affine_trans[..., 2]
    det = A[..., 0, 0] * A[..., 1, 1] - A[..., 0, 1] * A[..., 1, 0]
    inv_det = 1.0 / det
    A_inv = jnp.stack([
        jnp.stack([A[..., 1, 1] * inv_det, -A[..., 0, 1] * inv_det], axis=-1),
        jnp.stack([-A[..., 1, 0] * inv_det, A[..., 0, 0] * inv_det], axis=-1),
    ], axis=-2)
    t_inv = -jnp.einsum("...ij,...j->...i", A_inv, t)
    return jnp.concatenate([A_inv, t_inv[..., None]], axis=-1)


def _source_coords(affine_trans, out_hw):
    """Per-output-pixel source coordinates (B, OH, OW) x and y."""
    OH, OW = out_hw
    inv = invert_affine(affine_trans)  # (B, 2, 3)
    xs = jnp.arange(OW, dtype=affine_trans.dtype)
    ys = jnp.arange(OH, dtype=affine_trans.dtype)
    gx, gy = jnp.meshgrid(xs, ys)  # (OH, OW) each
    sx = (inv[:, 0, 0, None, None] * gx + inv[:, 0, 1, None, None] * gy
          + inv[:, 0, 2, None, None])
    sy = (inv[:, 1, 0, None, None] * gx + inv[:, 1, 1, None, None] * gy
          + inv[:, 1, 2, None, None])
    return sx, sy


def _gather_hw(img, iy, ix):
    """img (C, H, W), iy/ix (OH, OW) int32 clipped -> (C, OH, OW)."""
    H, W = img.shape[-2:]
    flat = img.reshape(img.shape[0], H * W)
    idx = iy * W + ix  # (OH, OW)
    return jnp.take(flat, idx.reshape(-1), axis=1).reshape(img.shape[0], *idx.shape)


def _bilinear_one(img, sx, sy, pad_val):
    """img (C, H, W); sx/sy (OH, OW) float source coords."""
    H, W = img.shape[-2:]
    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    wx = sx - x0
    wy = sy - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    vals = 0.0
    for dy in (0, 1):
        for dx in (0, 1):
            xi = x0i + dx
            yi = y0i + dy
            w = ((wx if dx else (1 - wx)) * (wy if dy else (1 - wy)))
            inb = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
            v = _gather_hw(img, jnp.clip(yi, 0, H - 1), jnp.clip(xi, 0, W - 1))
            v = jnp.where(inb[None], v, pad_val)
            vals = vals + w[None] * v
    return vals


def _nearest_one(img, sx, sy, pad_val):
    H, W = img.shape[-2:]
    xi = jnp.round(sx).astype(jnp.int32)
    yi = jnp.round(sy).astype(jnp.int32)
    inb = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
    v = _gather_hw(img, jnp.clip(yi, 0, H - 1), jnp.clip(xi, 0, W - 1))
    return jnp.where(inb[None], v, pad_val)


def _interp_matrix(src, size, mode):
    """1-D interpolation weights W[out, in]: resampled = W @ signal.

    :param src: (B, N_out) fractional source coordinates per output index
    :return: (B, N_out, size); rows for out-of-range sources are all zero.
    """
    grid = jnp.arange(size, dtype=src.dtype)            # (size,)
    d = src[..., None] - grid                           # (B, N_out, size)
    if mode == "bilinear":
        # Tent weights reproduce the gather kernel's semantics exactly,
        # including partial weights at the image border (rest -> padding).
        return jnp.maximum(0.0, 1.0 - jnp.abs(d))
    # Nearest: one-hot at round(src); automatically zero out of range.
    return (jnp.round(src)[..., None] == grid).astype(src.dtype)


def _affine_resample_separable(images, affine_trans, out_hw, mode, pad_val):
    """Axis-aligned affine resample as two MXU matmuls per image.

    For scale+translate transforms (a01 == a10 == 0 — every crop/uncrop/resize
    in this framework) the bilinear/nearest kernel is separable:
        out = Wy @ img @ Wx^T,
    where Wy (OH, H) and Wx (OW, W) are dense 1-D interpolation matrices.
    This replaces 4 random gathers per output pixel (slow on TPU) with
    matmuls, and handles constant padding via the weight-sum correction.
    """
    B, C, H, W = images.shape
    OH, OW = out_hw
    inv = invert_affine(affine_trans)                    # (B, 2, 3)
    xs = jnp.arange(OW, dtype=affine_trans.dtype)
    ys = jnp.arange(OH, dtype=affine_trans.dtype)
    src_x = inv[:, 0, 0, None] * (xs + 0.0) + inv[:, 0, 2, None]   # (B, OW)
    src_y = inv[:, 1, 1, None] * (ys + 0.0) + inv[:, 1, 2, None]   # (B, OH)

    Wx = _interp_matrix(src_x, W, mode)                  # (B, OW, W)
    Wy = _interp_matrix(src_y, H, mode)                  # (B, OH, H)

    out = jnp.einsum("boh,bchw,bpw->bcop", Wy, images, Wx)
    if pad_val != 0.0:
        # Out-of-frame samples have total weight < 1; pad with the constant.
        wsum = Wy.sum(-1)[:, :, None] * Wx.sum(-1)[:, None, :]  # (B, OH, OW)
        out = out + pad_val * (1.0 - wsum[:, None])
    return out


def affine_resample(images, affine_trans, out_hw, mode="bilinear", pad_val=0.0,
                    force_gather=False, assume_axis_aligned=False):
    """Warp a batch of images by forward affine transforms.

    Axis-aligned transforms (pure scale + translate — all crops/uncrops in
    this framework) take a separable matmul path that is far faster on TPU
    than per-pixel gathers; general affines fall back to the gather kernel.

    :param images: (B, C, H, W)
    :param affine_trans: (B, 2, 3) forward transform (input px -> output px)
    :param out_hw: (OH, OW) static output size
    :param mode: 'bilinear' or 'nearest'
    :param pad_val: constant for out-of-frame samples
    :param assume_axis_aligned: callers that construct scale+translate
        transforms under jit (off-diagonals identically zero but traced, so
        not statically inspectable) pass True to take the separable matmul
        path. Traced transforms WITHOUT this flag use the general gather
        kernel — correct for any affine.
    :return: (B, C, OH, OW)
    """
    # Structural (trace-time) check: off-diagonal terms identically zero.
    axis_aligned = bool(assume_axis_aligned)
    if not force_gather and not axis_aligned:
        if isinstance(affine_trans, jax.core.Tracer):
            # Traced values cannot be inspected; stay on the general gather
            # path unless the caller vouches via assume_axis_aligned.
            axis_aligned = False
        else:
            a01 = np.asarray(affine_trans[..., 0, 1])
            a10 = np.asarray(affine_trans[..., 1, 0])
            axis_aligned = bool(np.all(a01 == 0) and np.all(a10 == 0))
    if axis_aligned and not force_gather:
        return _affine_resample_separable(images, affine_trans, out_hw, mode,
                                          pad_val)
    sx, sy = _source_coords(affine_trans, out_hw)  # (B, OH, OW)
    one = _bilinear_one if mode == "bilinear" else _nearest_one
    return jax.vmap(lambda im, a, b: one(im, a, b, pad_val))(images, sx, sy)


def transform_points(affine_trans, points):
    """Apply forward affine transforms to 2D points.

    :param affine_trans: (B, 2, 3)
    :param points: (B, K, 2) [x, y]
    :return: (B, K, 2)
    """
    homo = jnp.concatenate([points, jnp.ones_like(points[..., :1])], axis=-1)
    return jnp.einsum("bij,bkj->bki", affine_trans, homo)
