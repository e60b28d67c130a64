"""Torch-free person localisation: HRNet keypoint bootstrap.

The reference bundles a torchvision Mask-RCNN solely to find the person
bounding box before the HRNet crop (reference run_predict.py:43,
predict/predict_hrnet.py:52-57). That makes uncropped-image prediction
depend on torchvision + its pretrained weights at runtime. This module
removes the dependency by reusing the 2D keypoint model the pipeline
already carries:

  1. run HRNet on the whole frame (aspect-fixed full-image crop);
  2. take the bounding box of the confident keypoints, inverse-mapped to
     original-image coordinates through the same crop affine;
  3. expand it by anatomical margins (COCO keypoints stop at nose/ankles —
     heads and feet extend beyond) and iterate once more on the refined
     crop, which sharpens the heatmaps considerably on small subjects.

Returns detections in the same torchvision-style dict the pluggable
`object_detect_fn` interface expects ({boxes xyxy, labels, scores}), so it
drops into predict_hrnet.select_centremost_person_box unchanged. With
trained HRNet weights this localises the dominant person well on
single-person photos (the reference's target regime — its own fallback when
Mask-RCNN finds nothing is the whole frame); it does not handle crowded
multi-person frames, where Mask-RCNN (if installed) remains the better
detector. Accuracy caveat: no pretrained weights ship in this build
environment, so the IoU-vs-Mask-RCNN comparison could not be run here; the
geometry loop is pinned by tests with a content-aware HRNet stub
(tests/test_keypoint_detector.py).
"""

import numpy as np
import jax
import jax.numpy as jnp

from hierarchicalprobabilistic3dhuman_tpu.predict.predict_hrnet import (
    IMAGENET_MEAN, IMAGENET_STD, get_kp_locations_confs_from_heatmaps,
    _as_float_rgb)
from hierarchicalprobabilistic3dhuman_tpu.utils.image_utils import (
    batch_crop_affine)


def make_keypoint_bootstrap_detector(hrnet_apply, hrnet_config,
                                     hrnet_vars=None,
                                     conf_threshold=0.3,
                                     min_visible=6,
                                     n_iters=2,
                                     margins=(0.25, 0.10, 0.125)):
    """Build an `object_detect_fn`-compatible person detector from HRNet.

    :param hrnet_apply: params-explicit `hrnet_apply(variables, images)`
        when hrnet_vars is given, else `hrnet_apply(images)`.
    :param conf_threshold: heatmap peak value below which a keypoint is
        treated as invisible.
    :param min_visible: fewer confident keypoints than this -> no detection
        (the caller falls back to the whole frame, reference behaviour).
    :param n_iters: localisation iterations (1 = whole-frame pass only).
    :param margins: (top, bottom, sides) expansion as fractions of the raw
        keypoint bbox height/width — COCO-17 stops at the nose and ankles,
        so the head above and feet below must be margined in.
    :return: callable image (3, H, W) float [0,1] ->
        {"boxes": (N, 4) xyxy, "labels": (N,), "scores": (N,)}
    """
    in_w, in_h = hrnet_config.MODEL.IMAGE_SIZE  # (288, 384)
    kp_rescale = in_w / float(hrnet_config.MODEL.HEATMAP_SIZE[0])
    mean = jnp.asarray(IMAGENET_MEAN)[:, None, None]
    std = jnp.asarray(IMAGENET_STD)[:, None, None]
    if hrnet_vars is None:
        apply_fn = lambda _unused, images: hrnet_apply(images)
        hrnet_vars = ()
    else:
        apply_fn = hrnet_apply

    @jax.jit
    def _stage(variables, image, centre, height, width):
        crop = batch_crop_affine(
            (in_w, in_h), rgb=_as_float_rgb(image)[None],
            bbox_centres=centre[None], bbox_heights=height[None],
            bbox_widths=width[None],
            orig_scale_factor=1.0)          # margins handle the context pad
        heatmaps = apply_fn(variables, ((crop["rgb"][0] - mean) / std)[None])
        joints2D, confs = get_kp_locations_confs_from_heatmaps(heatmaps)
        # crop px -> original px through the SAME (aspect-fixed) box the
        # affine used: orig = centre + (p - out/2) * (box_extent / out).
        kp = joints2D[0] * kp_rescale                        # (K, 2) x, y
        bw = crop["bbox_widths"][0]
        bh = crop["bbox_heights"][0]
        cx = crop["bbox_centres"][0, 1]
        cy = crop["bbox_centres"][0, 0]
        x = cx + (kp[:, 0] - in_w * 0.5) * (bw / in_w)
        y = cy + (kp[:, 1] - in_h * 0.5) * (bh / in_h)
        return jnp.stack([x, y], axis=-1), confs[0]

    def detect(image):
        H, W = int(image.shape[1]), int(image.shape[2])
        centre = np.array([H / 2.0, W / 2.0], np.float32)
        height, width = float(H), float(W)
        image = jnp.asarray(image)

        accepted = None  # last (x0, y0, x1, y1, confs) that passed min_visible
        for _ in range(max(1, int(n_iters))):
            kp, confs = _stage(hrnet_vars, image,
                               jnp.asarray(centre, jnp.float32),
                               jnp.asarray(height, jnp.float32),
                               jnp.asarray(width, jnp.float32))
            kp = np.asarray(kp)
            confs = np.asarray(confs)
            vis = confs > conf_threshold
            if vis.sum() < min_visible:
                # A later refinement pass losing the subject (e.g. the
                # tightened crop clipping limbs) must not discard a valid
                # earlier detection — fall back to the last accepted box.
                break
            x0, x1 = kp[vis, 0].min(), kp[vis, 0].max()
            y0, y1 = kp[vis, 1].min(), kp[vis, 1].max()
            h, w = y1 - y0, x1 - x0
            top, bottom, sides = margins
            x0, x1 = x0 - sides * w, x1 + sides * w
            y0, y1 = y0 - top * h, y1 + bottom * h
            x0, y0 = max(0.0, float(x0)), max(0.0, float(y0))
            x1, y1 = min(float(W), float(x1)), min(float(H), float(y1))
            # Near-collinear/coincident keypoints can collapse the box to
            # ~zero extent, which would feed a degenerate affine into the
            # re-crop (NaN scale). Clamp to a sane minimum, centred.
            min_ext = 8.0
            if x1 - x0 < min_ext:
                cx_ = (x0 + x1) / 2.0
                x0 = max(0.0, cx_ - min_ext / 2.0)
                x1 = min(float(W), x0 + min_ext)
            if y1 - y0 < min_ext:
                cy_ = (y0 + y1) / 2.0
                y0 = max(0.0, cy_ - min_ext / 2.0)
                y1 = min(float(H), y0 + min_ext)
            accepted = (x0, y0, x1, y1, confs)
            centre = np.array([(y0 + y1) / 2.0, (x0 + x1) / 2.0], np.float32)
            height, width = y1 - y0, x1 - x0

        if accepted is None:
            return {"boxes": np.zeros((0, 4), np.float32),
                    "labels": np.zeros((0,), np.int64),
                    "scores": np.zeros((0,), np.float32)}
        x0, y0, x1, y1, confs = accepted

        # Acceptance happens HERE (>= min_visible confident keypoints), not
        # via the downstream score threshold: keypoint-peak confidences are
        # not calibrated like detector scores (a confident trained-HRNet
        # detection averages ~0.5-0.9, under typical 0.8-0.95 detector
        # thresholds), so an accepted box reports score 1.0 and the raw mean
        # keypoint confidence rides along for diagnostics.
        raw = float(confs[confs > conf_threshold].mean())
        return {"boxes": np.array([[x0, y0, x1, y1]], np.float32),
                "labels": np.array([1], np.int64),       # COCO person
                "scores": np.array([1.0], np.float32),
                "kp_mean_conf": np.array([raw], np.float32)}

    return detect
