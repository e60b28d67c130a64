"""HRNet 2D-pose prediction with a pluggable person-bbox detector.

JAX equivalent of reference predict/predict_hrnet.py:7-116. The reference
hard-depends on torchvision Mask-RCNN (C++ NMS/roi_align) for person boxes;
porting a detector is out of scope for parity, so the detector is an
interface: any callable `image (3, H, W) in [0,1] -> dict(boxes (N, 4) xyxy,
labels (N,), scores (N,))` works (e.g. a torchvision CPU model wrapped
host-side, or None to use the whole image — the reference's `--cropped_images`
demo path).
"""

import numpy as np
import jax.numpy as jnp

from hierarchicalprobabilistic3dhuman_tpu.utils.image_utils import (
    convert_bbox_corners_to_centre_hw, batch_crop_affine)
from hierarchicalprobabilistic3dhuman_tpu.utils.label_conversions import (
    convert_heatmaps_to_2Djoints_coordinates)

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def get_kp_locations_confs_from_heatmaps(batch_heatmaps):
    """Argmax keypoints + confidences (reference :7-30).

    :param batch_heatmaps: (B, K, h, w)
    :return: kps (B, K, 2) [x, y] (0 where conf <= 0), confs (B, K)
    """
    B, K, h, w = batch_heatmaps.shape
    flat = batch_heatmaps.reshape(B, K, -1)
    max_confs = jnp.max(flat, axis=-1)
    max_idx = jnp.argmax(flat, axis=-1)
    x = (max_idx % w).astype(jnp.float32)
    y = jnp.floor(max_idx.astype(jnp.float32) / float(w))
    kps = jnp.stack([x, y], axis=-1)
    return kps * (max_confs > 0.0)[..., None], max_confs


def select_centremost_person_box(detections, image_hw, threshold=0.8):
    """Centre-most high-confidence person box, whole image fallback
    (reference :49-80). Host-side numpy (detector outputs are host data).

    :param detections: dict with boxes (N, 4) xyxy, labels (N,), scores (N,)
        or None
    :return: (centre (2,) [vert, hor], height, width)
    """
    H, W = image_hw
    if detections is not None:
        boxes = np.asarray(detections["boxes"], np.float32)
        labels = np.asarray(detections["labels"])
        scores = np.asarray(detections["scores"], np.float32)
        person = (labels == 1) & (scores > threshold)
        boxes = boxes[person]
        if boxes.shape[0] > 0:
            corners = boxes[:, [1, 0, 3, 2]]  # -> (vert, hor) ordering
            centres, heights, widths = (np.asarray(a) for a in
                                        convert_bbox_corners_to_centre_hw(jnp.asarray(corners)))
            dists = (centres[:, 0] - H / 2.0) ** 2 + (centres[:, 1] - W / 2.0) ** 2
            i = int(np.argmin(dists))
            return centres[i], float(heights[i]), float(widths[i])
        print("Could not find person bounding box - using entire image!")
    return np.array([H / 2.0, W / 2.0], np.float32), float(H), float(W)


def _is_nhwc(images):
    """True for a (B, H, W, 3) batch (vs the canonical (B, 3, H, W))."""
    return (images.ndim == 4 and images.shape[-1] == 3
            and images.shape[1] != 3)


def _as_float_rgb(images):
    """uint8 [0,255] -> float32 [0,1] and NHWC -> NCHW, ON DEVICE; float
    NCHW inputs pass through.

    Accepting uint8 lets callers ship 4x less over the host->device link —
    decoded photos are naturally uint8, and a tunnel-attached TPU moves only
    ~10-40 MB/s, so a (16,512,512,3) float32 batch costs ~900 ms of upload
    vs ~300 ms as uint8 (measured; see predict_folder_batched). Accepting
    HWC keeps the host free of the ~100-300 ms strided transpose copy that
    cv2-decoded images would otherwise need before upload."""
    if images.dtype == jnp.uint8:
        images = images.astype(jnp.float32) / 255.0
    if _is_nhwc(images):
        images = jnp.transpose(images, (0, 3, 1, 2))
    return images


def make_hrnet_predictor(hrnet_apply, hrnet_config, bbox_scale_factor=1.2,
                         hrnet_vars=None):
    """Build a per-image HRNet keypoint predictor with its device path jitted.

    The detector + box selection stay host-side (detector outputs are host
    data); everything from the 384x288 crop through the heatmap argmax is ONE
    jitted function, re-traced only per distinct input image shape. On a
    tunnel-attached TPU each *eager* jnp op pays a ~0.5-3 s dispatch RPC, so
    the reference-style eager flow (crop, normalise, forward, argmax as
    separate dispatches per image) is catastrophically slow there.

    :param hrnet_vars: when given, `hrnet_apply` must be the params-explicit
        form `hrnet_apply(variables, images)` and the variable tree is passed
        to the jitted stage as an ARGUMENT. Without it (legacy form,
        `hrnet_apply(images)` closing over its weights) tracing embeds the
        weights as compiled-program constants — which a tunnel-attached TPU
        pays for with a full weight download at trace time plus a
        weight-sized serialized executable.
    :return: predict(image (3, H, W) in [0,1], object_detect_fn=None,
        object_detect_threshold=0.8) -> dict (see predict_hrnet)
    """
    import jax

    in_w, in_h = hrnet_config.MODEL.IMAGE_SIZE  # (288, 384)
    aspect = float(in_h) / float(in_w)
    kp_rescale = in_w / float(hrnet_config.MODEL.HEATMAP_SIZE[0])
    mean = jnp.asarray(IMAGENET_MEAN)[:, None, None]
    std = jnp.asarray(IMAGENET_STD)[:, None, None]
    if hrnet_vars is None:
        apply_fn = lambda _unused_vars, images: hrnet_apply(images)
        hrnet_vars = ()
    else:
        apply_fn = hrnet_apply

    @jax.jit
    def _device_stage(variables, image, centre, height, width):
        cropped = batch_crop_affine(
            (in_w, in_h),
            rgb=_as_float_rgb(image)[None],
            bbox_centres=centre[None],
            bbox_heights=height[None],
            bbox_widths=width[None],
            orig_scale_factor=bbox_scale_factor)["rgb"][0]  # (3, 384, 288)
        heatmaps = apply_fn(variables, ((cropped - mean) / std)[None])
        joints2D, confs = get_kp_locations_confs_from_heatmaps(heatmaps)
        return joints2D[0] * kp_rescale, confs[0], cropped

    def predict(image, object_detect_fn=None, object_detect_threshold=0.8):
        H, W = image.shape[1:]
        det_input = image
        if object_detect_fn is not None and image.dtype == jnp.uint8:
            # detectors take float [0,1]; only materialise it when needed
            det_input = np.asarray(image).astype(np.float32) / 255.0
        detections = (object_detect_fn(det_input)
                      if object_detect_fn is not None else None)
        centre, height, width = select_centremost_person_box(
            detections, (H, W), threshold=object_detect_threshold)
        if height > width * aspect:
            width = height / aspect
        elif height < width * aspect:
            height = width * aspect

        joints2D, confs, cropped = _device_stage(
            hrnet_vars,
            jnp.asarray(image), jnp.asarray(centre, jnp.float32),
            jnp.asarray(height, jnp.float32), jnp.asarray(width, jnp.float32))
        return {"joints2D": joints2D,
                "joints2Dconfs": confs,
                "cropped_image": cropped,
                # bbox metadata stays host-side numpy (figure assembly uses it
                # in Python control flow; device scalars would cost a tunnel
                # round-trip each).
                "bbox_centre": np.asarray(centre, np.float32),
                "bbox_height": float(height),
                "bbox_width": float(width)}

    return predict


def make_hrnet_batch_predictor(hrnet_apply, hrnet_config,
                               bbox_scale_factor=1.2, hrnet_vars=None):
    """Batched variant of make_hrnet_predictor: B same-resolution images in
    ONE device dispatch (crop + normalise + HRNet + argmax). Per-image box
    selection stays host-side; the device stage re-traces only per distinct
    (B, H, W).

    :param hrnet_vars: see make_hrnet_predictor — when given, `hrnet_apply`
        is the params-explicit `hrnet_apply(variables, images)` form and the
        weights are jit ARGUMENTS, not compiled-in constants.
    :return: predict_batch(images, object_detect_fn=None,
        object_detect_threshold=0.8, host_images=None) -> dict with
        joints2D (B, 17, 2), joints2Dconfs (B, 17), cropped_image
        (B, 3, 384, 288), bbox_centres (B, 2) np, bbox_heights/widths (B,) np.
        `images` may be (B, 3, H, W) float [0,1] or — the cheap-upload form —
        (B, H, W, 3) uint8 [0,255] (layout/dtype converted on device).
    """
    import jax

    in_w, in_h = hrnet_config.MODEL.IMAGE_SIZE  # (288, 384)
    aspect = float(in_h) / float(in_w)
    kp_rescale = in_w / float(hrnet_config.MODEL.HEATMAP_SIZE[0])
    mean = jnp.asarray(IMAGENET_MEAN)[:, None, None]
    std = jnp.asarray(IMAGENET_STD)[:, None, None]
    if hrnet_vars is None:
        apply_fn = lambda _unused_vars, images: hrnet_apply(images)
        hrnet_vars = ()
    else:
        apply_fn = hrnet_apply

    @jax.jit
    def _device_stage(variables, images, centres, heights, widths):
        cropped = batch_crop_affine(
            (in_w, in_h), rgb=_as_float_rgb(images), bbox_centres=centres,
            bbox_heights=heights, bbox_widths=widths,
            orig_scale_factor=bbox_scale_factor)["rgb"]  # (B, 3, 384, 288)
        heatmaps = apply_fn(variables, (cropped - mean) / std)
        joints2D, confs = get_kp_locations_confs_from_heatmaps(heatmaps)
        return joints2D * kp_rescale, confs, cropped

    def predict_batch(images, object_detect_fn=None,
                      object_detect_threshold=0.8, host_images=None):
        """images may be float [0,1] or uint8 [0,255] (converted on device),
        and may already LIVE on device (the folder driver uploads uint8 on a
        lookahead thread so the transfer overlaps the previous chunk's
        compute). host_images: optional host-side per-image array/list for
        the detector, so a device-resident `images` is not fetched back."""
        B = images.shape[0]
        H, W = (images.shape[1:3] if _is_nhwc(images) else images.shape[2:4])
        centres = np.empty((B, 2), np.float32)
        heights = np.empty((B,), np.float32)
        widths = np.empty((B,), np.float32)
        det_src = None
        if object_detect_fn is not None:
            det_src = host_images
            if det_src is None:
                arr = np.asarray(images)
                if arr.dtype == np.uint8:
                    arr = arr.astype(np.float32) / 255.0
                if arr.shape[-1] == 3 and arr.shape[1] != 3:
                    arr = arr.transpose(0, 3, 1, 2)
                det_src = arr
        for i in range(B):
            det = (object_detect_fn(det_src[i])
                   if object_detect_fn is not None else None)
            c, h, w = select_centremost_person_box(
                det, (H, W), threshold=object_detect_threshold)
            if h > w * aspect:
                w = h / aspect
            elif h < w * aspect:
                h = w * aspect
            centres[i], heights[i], widths[i] = c, h, w

        joints2D, confs, cropped = _device_stage(
            hrnet_vars, jnp.asarray(images), jnp.asarray(centres),
            jnp.asarray(heights), jnp.asarray(widths))
        return {"joints2D": joints2D, "joints2Dconfs": confs,
                "cropped_image": cropped, "bbox_centres": centres,
                "bbox_heights": heights, "bbox_widths": widths}

    return predict_batch


# One-shot-API predictor cache: repeated predict_hrnet calls in a loop must
# reuse the compiled crop+HRNet+argmax stage instead of re-tracing per call.
# Keyed on identity of the apply fn (a fresh closure means fresh weights),
# the config object and the scale factor.
_PREDICTOR_CACHE = {}


def predict_hrnet(hrnet_apply,
                  hrnet_config,
                  image,
                  object_detect_fn=None,
                  object_detect_threshold=0.8,
                  bbox_scale_factor=1.2,
                  hrnet_vars=None):
    """Person bbox -> crop to 384x288 -> HRNet heatmaps -> 2D joints.

    One-shot convenience wrapper around make_hrnet_predictor. The built
    predictor (and thus its jitted device stage) is cached per
    (hrnet_apply, vars, config, scale factor), so looping this API over
    images compiles once, same as holding a make_hrnet_predictor result.

    :param hrnet_apply: callable (B, 3, 384, 288) normalised -> (B, 17, 96, 72),
        or the params-explicit form `hrnet_apply(variables, images)` when
        `hrnet_vars` is given (see make_hrnet_predictor).
    :param image: (3, H, W) jnp array, RGB in [0, 1]
    :param object_detect_fn: callable(image) -> detections dict, or None
    :return: dict joints2D (17, 2), joints2Dconfs (17,), cropped_image
        (3, 384, 288), bbox_centre (2,), bbox_height, bbox_width
    """
    cache_key = (id(hrnet_apply), id(hrnet_vars), id(hrnet_config),
                 float(bbox_scale_factor))
    predictor = _PREDICTOR_CACHE.get(cache_key)
    if predictor is None:
        predictor = make_hrnet_predictor(hrnet_apply, hrnet_config,
                                         bbox_scale_factor=bbox_scale_factor,
                                         hrnet_vars=hrnet_vars)
        _PREDICTOR_CACHE[cache_key] = predictor
    return predictor(image, object_detect_fn=object_detect_fn,
                     object_detect_threshold=object_detect_threshold)
