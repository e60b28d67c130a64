"""Bounding boxes, cropping/uncropping and compositing — batched JAX.

Covers the reference's utils/image_utils.py (bbox converters :7-45,
batch_add_rgb_background :48-59, batch_crop_opencv_affine :62-231,
batch_crop_pytorch_affine :234-378) with a single fixed-shape implementation:

  * bounding boxes from masks/joints are masked min/max reductions, not
    python loops over torch.nonzero (static shapes, TPU-friendly);
  * cropping and UNcropping share one forward-affine construction and the
    `ops.resample.affine_resample` gather kernel;
  * scale/centre jitter augmentation is driven by an explicit jax.random key.

Coordinate conventions follow the reference: bbox centres are (vertical,
horizontal); affine transforms act on (x=horizontal, y=vertical) pixel coords.
"""

import jax
import jax.numpy as jnp

from hierarchicalprobabilistic3dhuman_tpu.ops.resample import (
    affine_resample, transform_points)

_BIG = 1e9


def convert_bbox_corners_to_centre_hw(bbox_corners):
    """[x1, y1, x2, y2] (vert, hor) corners -> centre (vert, hor), height, width.

    :param bbox_corners: (..., 4)
    """
    centre = jnp.stack([(bbox_corners[..., 0] + bbox_corners[..., 2]) / 2.0,
                        (bbox_corners[..., 1] + bbox_corners[..., 3]) / 2.0], axis=-1)
    heights = bbox_corners[..., 2] - bbox_corners[..., 0]
    widths = bbox_corners[..., 3] - bbox_corners[..., 1]
    return centre, heights, widths


def convert_bbox_centre_hw_to_corners(centre, height, width):
    """Centre (vert, hor) + height/width -> [x1, y1, x2, y2]."""
    return jnp.stack([centre[..., 0] - height / 2.0,
                      centre[..., 1] - width / 2.0,
                      centre[..., 0] + height / 2.0,
                      centre[..., 1] + width / 2.0], axis=-1)


def batch_add_rgb_background(backgrounds, rgb, seg):
    """Composite rendered bodies onto backgrounds (reference :48-59).

    :param backgrounds: (B, 3, wh, wh)
    :param rgb: (B, 3, wh, wh)
    :param seg: (B, wh, wh)  body pixels > 0, out-of-frame -1, background 0
    """
    background_pixels = (seg[:, None] == 0)
    return rgb * (~background_pixels) + backgrounds * background_pixels


def bbox_from_mask(mask):
    """Tight bbox corners around non-zero mask pixels, batched.

    :param mask: (B, H, W) any dtype (non-zero = foreground)
    :return: (B, 4) [row_min, col_min, row_max, col_max] float
    """
    B, H, W = mask.shape
    fg = mask != 0
    rows = jnp.arange(H, dtype=jnp.float32)[None, :, None]
    cols = jnp.arange(W, dtype=jnp.float32)[None, None, :]
    row_min = jnp.min(jnp.where(fg, rows, _BIG), axis=(1, 2))
    row_max = jnp.max(jnp.where(fg, rows, -_BIG), axis=(1, 2))
    col_min = jnp.min(jnp.where(fg, cols, _BIG), axis=(1, 2))
    col_max = jnp.max(jnp.where(fg, cols, -_BIG), axis=(1, 2))
    # Empty mask fallback: full image.
    empty = ~jnp.any(fg, axis=(1, 2))
    row_min = jnp.where(empty, 0.0, row_min)
    col_min = jnp.where(empty, 0.0, col_min)
    row_max = jnp.where(empty, H - 1.0, row_max)
    col_max = jnp.where(empty, W - 1.0, col_max)
    return jnp.stack([row_min, col_min, row_max, col_max], axis=-1)


def bbox_from_joints2d(joints2d, joints2d_vis, fallback_wh):
    """Tight bbox corners around visible joints (reference :291-300).

    :param joints2d: (B, K, 2) [x, y]
    :param joints2d_vis: (B, K) bool
    :param fallback_wh: (w, h) used when the box degenerates (<=1 visible joint)
    :return: (B, 4) [row_min, col_min, row_max, col_max]
    """
    vis = joints2d_vis[..., None]
    x_min = jnp.min(jnp.where(vis, joints2d[..., 0:1], _BIG), axis=1)[:, 0]
    y_min = jnp.min(jnp.where(vis, joints2d[..., 1:2], _BIG), axis=1)[:, 0]
    x_max = jnp.max(jnp.where(vis, joints2d[..., 0:1], -_BIG), axis=1)[:, 0]
    y_max = jnp.max(jnp.where(vis, joints2d[..., 1:2], -_BIG), axis=1)[:, 0]
    degenerate = (x_min == x_max) & (y_min == y_max)
    y_max = jnp.where(degenerate, y_min + fallback_wh[1], y_max)
    x_max = jnp.where(degenerate, x_min + fallback_wh[0], x_max)
    return jnp.stack([y_min, x_min, y_max, x_max], axis=-1)


def _fix_aspect_ratio(heights, widths, output_wh):
    """Grow the smaller bbox side to match the output aspect ratio (reference :309-312)."""
    aspect = output_wh[1] / output_wh[0]  # h / w
    widths = jnp.where(heights > widths * aspect, heights / aspect, widths)
    heights = jnp.where(heights < widths * aspect, widths * aspect, heights)
    return heights, widths


def crop_affine_from_bbox(bbox_centres, bbox_heights, bbox_widths, output_wh):
    """Forward affine (input px -> output px) for a crop (reference :328-334)."""
    B = bbox_centres.shape[0]
    out_w, out_h = output_wh
    a00 = out_w / bbox_widths
    a11 = out_h / bbox_heights
    tx = out_w * 0.5 - a00 * bbox_centres[:, 1]
    ty = out_h * 0.5 - a11 * bbox_centres[:, 0]
    zeros = jnp.zeros_like(a00)
    return jnp.stack([
        jnp.stack([a00, zeros, tx], axis=-1),
        jnp.stack([zeros, a11, ty], axis=-1),
    ], axis=1)  # (B, 2, 3)


def uncrop_affine_from_bbox(bbox_centres, bbox_heights, bbox_widths, output_wh):
    """Forward affine mapping a cropped image back into the original frame
    (reference :195-201, the `uncrop=True` path)."""
    out_w, out_h = output_wh
    a00 = bbox_widths / out_w
    a11 = bbox_heights / out_h
    tx = bbox_centres[:, 1] - a00 * (out_w * 0.5)
    ty = bbox_centres[:, 0] - a11 * (out_h * 0.5)
    zeros = jnp.zeros_like(a00)
    return jnp.stack([
        jnp.stack([a00, zeros, tx], axis=-1),
        jnp.stack([zeros, a11, ty], axis=-1),
    ], axis=1)


def batch_crop_affine(output_wh,
                      iuv=None,
                      joints2D=None,
                      rgb=None,
                      seg=None,
                      bbox_determiner=None,
                      bbox_centres=None,
                      bbox_heights=None,
                      bbox_widths=None,
                      bbox_whs=None,
                      joints2D_vis=None,
                      orig_scale_factor=1.2,
                      delta_scale_range=None,
                      delta_centre_range=None,
                      out_of_frame_pad_val=0.0,
                      rng_key=None):
    """Batched crop-and-resize around person bounding boxes.

    Functional equivalent of both reference crop paths
    (batch_crop_opencv_affine / batch_crop_pytorch_affine): bbox from
    IUV > seg > joints (or provided explicitly / via bbox_determiner),
    aspect-ratio fix, scale factor, optional random scale/centre jitter,
    one affine warp per modality (nearest for iuv/seg, bilinear for rgb),
    affine applied to joints2D coordinates.

    :return: dict with cropped 'iuv' (B,3,oh,ow), 'joints2D' (B,K,2),
             'rgb' (B,3,oh,ow), 'seg' (B,oh,ow) for the provided inputs,
             plus 'bbox_centres'/'bbox_heights'/'bbox_widths' (post-jitter,
             needed later for uncropping) and 'affine_trans'.
    """
    out_w, out_h = int(output_wh[0]), int(output_wh[1])

    if bbox_centres is None:
        if bbox_determiner is not None:
            corners = bbox_from_mask(bbox_determiner)
        elif iuv is not None:
            corners = bbox_from_mask(iuv[:, 0])
        elif seg is not None:
            corners = bbox_from_mask(seg)
        elif joints2D is not None:
            corners = bbox_from_joints2d(joints2D, joints2D_vis, (out_w, out_h))
        else:
            raise ValueError("Need IUV, seg, joints2D or explicit bboxes")
        bbox_centres, bbox_heights, bbox_widths = convert_bbox_corners_to_centre_hw(corners)
    elif bbox_whs is not None:
        bbox_heights = jnp.asarray(bbox_whs, jnp.float32)
        bbox_widths = jnp.asarray(bbox_whs, jnp.float32)
    bbox_centres = jnp.asarray(bbox_centres, jnp.float32)
    bbox_heights = jnp.asarray(bbox_heights, jnp.float32)
    bbox_widths = jnp.asarray(bbox_widths, jnp.float32)
    # Degenerate-box guard: a (near-)empty mask or single-pixel body gives a
    # zero-size bbox, whose crop affine divides to inf and whose joint
    # transform then produces inf + (-inf) = NaN (seen poisoning training
    # when random_extreme_crop empties an already-marginal synthetic body).
    # A few-pixel floor never engages for real bodies.
    bbox_heights = jnp.maximum(bbox_heights, 2.0)
    bbox_widths = jnp.maximum(bbox_widths, 2.0)

    B = bbox_centres.shape[0]
    bbox_heights, bbox_widths = _fix_aspect_ratio(bbox_heights, bbox_widths,
                                                  (float(out_w), float(out_h)))

    scale_factor = orig_scale_factor
    if delta_scale_range is not None:
        assert rng_key is not None, "jitter augmentation needs an rng key"
        rng_key, sub = jax.random.split(rng_key)
        l, h = delta_scale_range
        scale_factor = orig_scale_factor + jax.random.uniform(
            sub, (B,), minval=l, maxval=h)
    bbox_heights = bbox_heights * scale_factor
    bbox_widths = bbox_widths * scale_factor
    if delta_centre_range is not None:
        assert rng_key is not None, "jitter augmentation needs an rng key"
        rng_key, sub = jax.random.split(rng_key)
        l, h = delta_centre_range
        bbox_centres = bbox_centres + jax.random.uniform(
            sub, (B, 2), minval=l, maxval=h)

    affine = crop_affine_from_bbox(bbox_centres, bbox_heights, bbox_widths,
                                   (float(out_w), float(out_h)))

    out = {"bbox_centres": bbox_centres, "bbox_heights": bbox_heights,
           "bbox_widths": bbox_widths, "affine_trans": affine}
    if iuv is not None:
        out["iuv"] = affine_resample(iuv, affine, (out_h, out_w), mode="nearest",
                                     pad_val=out_of_frame_pad_val,
                                     assume_axis_aligned=True)
    if rgb is not None:
        out["rgb"] = affine_resample(rgb, affine, (out_h, out_w), mode="bilinear",
                                     pad_val=0.0, assume_axis_aligned=True)
    if seg is not None:
        out["seg"] = affine_resample(seg[:, None], affine, (out_h, out_w),
                                     mode="nearest", pad_val=0.0,
                                     assume_axis_aligned=True)[:, 0]
    if joints2D is not None:
        out["joints2D"] = transform_points(affine, joints2D)
    return out


def batch_uncrop_affine(output_wh, uncrop_wh, bbox_centres, bbox_heights,
                        bbox_widths, iuv=None, rgb=None, seg=None,
                        out_of_frame_pad_val=0.0):
    """Inverse of batch_crop_affine: paste crops back into the original frame.

    :param output_wh: (w, h) of the cropped images
    :param uncrop_wh: (w, h) of the original frame
    """
    affine = uncrop_affine_from_bbox(jnp.asarray(bbox_centres, jnp.float32),
                                     jnp.asarray(bbox_heights, jnp.float32),
                                     jnp.asarray(bbox_widths, jnp.float32),
                                     (float(output_wh[0]), float(output_wh[1])))
    oh, ow = int(uncrop_wh[1]), int(uncrop_wh[0])
    out = {}
    if iuv is not None:
        out["iuv"] = affine_resample(iuv, affine, (oh, ow), mode="nearest",
                                     pad_val=out_of_frame_pad_val,
                                     assume_axis_aligned=True)
    if rgb is not None:
        out["rgb"] = affine_resample(rgb, affine, (oh, ow), mode="bilinear",
                                     pad_val=0.0, assume_axis_aligned=True)
    if seg is not None:
        out["seg"] = affine_resample(seg[:, None], affine, (oh, ow),
                                     mode="nearest", pad_val=0.0,
                                     assume_axis_aligned=True)[:, 0]
    return out
