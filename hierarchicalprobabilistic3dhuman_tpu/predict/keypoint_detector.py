"""Torch-free person localisation: HRNet keypoint bootstrap.

The reference bundles a torchvision Mask-RCNN solely to find person
bounding boxes before the HRNet crop (reference run_predict.py:43,
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

Two detectors share that machinery:

  * make_keypoint_bootstrap_detector — single person (the dominant
    subject), the reference's own regime for its demo photos;
  * make_multi_person_bootstrap_detector — N people: per-joint TOP-K local
    heatmap maxima (not just the argmax) from the whole-frame pass, greedy
    spatial clustering of the peaks into skeleton seeds (at most one peak
    per joint channel per cluster), an independent refinement loop per
    seed, then box-IoU NMS. Over-segmented seeds (one person split into
    two clusters) self-heal — both refinement loops converge onto the same
    person and NMS merges them; the clustering radius only needs to be
    small enough not to MERGE different people's joints into one seed.

Both return detections in the torchvision-style dict the pluggable
`object_detect_fn` interface expects ({boxes xyxy, labels, scores}), so
they drop into predict_hrnet.select_centremost_person_box unchanged.
Accuracy evidence (no pretrained HRNet ships in this environment, so the
IoU-vs-Mask-RCNN comparison cannot be run here): the geometry loop is
pinned by tests with a content-aware HRNet stub
(tests/test_keypoint_detector.py), and benchmarks/detector_validation.py
smoke-trains a reduced HRNet on the framework's own synthetic renders and
measures box IoU against rendered silhouette-mask GT for BOTH detectors.
Recorded result (benchmarks/DETECTOR_VALIDATION_OUTPUT.txt, TPU): single
person median IoU 0.838 (96% of scenes >= 0.7, detection rate 1.00 across
subject scales 0.28-0.83 of the frame); 2-person composites median IoU
0.712 with both people localised at IoU >= 0.5 in 75% of scenes.
"""

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from hierarchicalprobabilistic3dhuman_tpu.predict.predict_hrnet import (
    IMAGENET_MEAN, IMAGENET_STD, get_kp_locations_confs_from_heatmaps,
    _as_float_rgb)
from hierarchicalprobabilistic3dhuman_tpu.utils.image_utils import (
    batch_crop_affine)

_MIN_BOX_EXT = 8.0   # px; degenerate-keypoint-cloud clamp (advisor round-4)


def _build_stage(hrnet_apply, hrnet_config, hrnet_vars):
    """Shared jitted crop->HRNet->inverse-mapped-keypoints stage.

    Returns (stage, peaks_stage_factory, in_w, in_h, hrnet_vars) where
    `stage(vars, image, centre, h, w) -> (kp_orig (K, 2), confs (K,))` is
    the argmax path and `peaks_stage_factory(P)` builds the top-P
    local-maxima variant `-> (kp_orig (K, P, 2), confs (K, P))`.
    """
    in_w, in_h = hrnet_config.MODEL.IMAGE_SIZE  # (288, 384)
    hm_w = float(hrnet_config.MODEL.HEATMAP_SIZE[0])
    kp_rescale = in_w / hm_w
    mean = jnp.asarray(IMAGENET_MEAN)[:, None, None]
    std = jnp.asarray(IMAGENET_STD)[:, None, None]
    if hrnet_vars is None:
        apply_fn = lambda _unused, images: hrnet_apply(images)
        hrnet_vars = ()
    else:
        apply_fn = hrnet_apply

    def _run_hrnet(variables, image, centre, height, width):
        crop = batch_crop_affine(
            (in_w, in_h), rgb=_as_float_rgb(image)[None],
            bbox_centres=centre[None], bbox_heights=height[None],
            bbox_widths=width[None],
            orig_scale_factor=1.0)          # margins handle the context pad
        heatmaps = apply_fn(variables, ((crop["rgb"][0] - mean) / std)[None])
        return crop, heatmaps

    def _to_orig(crop, kp):
        """crop-resolution keypoints (..., 2) -> original-image px through
        the SAME (aspect-fixed) box the affine used:
        orig = centre + (p - out/2) * (box_extent / out)."""
        kp = kp * kp_rescale
        bw = crop["bbox_widths"][0]
        bh = crop["bbox_heights"][0]
        cx = crop["bbox_centres"][0, 1]
        cy = crop["bbox_centres"][0, 0]
        x = cx + (kp[..., 0] - in_w * 0.5) * (bw / in_w)
        y = cy + (kp[..., 1] - in_h * 0.5) * (bh / in_h)
        return jnp.stack([x, y], axis=-1)

    @jax.jit
    def stage(variables, image, centre, height, width):
        crop, heatmaps = _run_hrnet(variables, image, centre, height, width)
        joints2D, confs = get_kp_locations_confs_from_heatmaps(heatmaps)
        return _to_orig(crop, joints2D[0]), confs[0]

    def peaks_stage_factory(P):
        @jax.jit
        def peaks_stage(variables, image, centre, height, width):
            crop, hm = _run_hrnet(variables, image, centre, height, width)
            # Per-channel top-P LOCAL maxima: a peak is a cell equal to the
            # max of its 3x3 neighbourhood (plateau ties count as peaks —
            # harmless, clustering dedups them spatially).
            pooled = lax.reduce_window(
                hm, -jnp.inf, lax.max,
                (1, 1, 3, 3), (1, 1, 1, 1), "SAME")
            K, h, w = hm.shape[1], hm.shape[2], hm.shape[3]
            masked = jnp.where(hm >= pooled, hm, -jnp.inf)
            confs, idx = lax.top_k(masked.reshape(K, h * w), P)  # (K, P)
            kp = jnp.stack([(idx % w).astype(jnp.float32),
                            (idx // w).astype(jnp.float32)], axis=-1)
            return _to_orig(crop, kp), confs

        return peaks_stage

    return stage, peaks_stage_factory, in_w, in_h, hrnet_vars


def _box_from_kps(kp, vis, H, W, margins):
    """Confident-keypoint bbox -> margin-expanded, clamped (x0, y0, x1, y1)."""
    x0, x1 = kp[vis, 0].min(), kp[vis, 0].max()
    y0, y1 = kp[vis, 1].min(), kp[vis, 1].max()
    h, w = y1 - y0, x1 - x0
    top, bottom, sides = margins
    x0, x1 = x0 - sides * w, x1 + sides * w
    y0, y1 = y0 - top * h, y1 + bottom * h
    x0, y0 = max(0.0, float(x0)), max(0.0, float(y0))
    x1, y1 = min(float(W), float(x1)), min(float(H), float(y1))
    # Near-collinear/coincident keypoints can collapse the box to ~zero
    # extent, which would feed a degenerate affine into the re-crop
    # (NaN scale). Clamp to a sane minimum, centred.
    if x1 - x0 < _MIN_BOX_EXT:
        cx = (x0 + x1) / 2.0
        x0 = max(0.0, cx - _MIN_BOX_EXT / 2.0)
        x1 = min(float(W), x0 + _MIN_BOX_EXT)
    if y1 - y0 < _MIN_BOX_EXT:
        cy = (y0 + y1) / 2.0
        y0 = max(0.0, cy - _MIN_BOX_EXT / 2.0)
        y1 = min(float(H), y0 + _MIN_BOX_EXT)
    return x0, y0, x1, y1


def _effective_threshold(confs, conf_threshold, conf_floor, rel_conf_frac):
    """Amplitude-adaptive visibility threshold:
    clip(rel_conf_frac * max_conf, conf_floor, conf_threshold).

    Heatmap peak AMPLITUDE is a property of the model/training, not of the
    scene (a fully-trained HRNet-W48 peaks ~0.9; a lightly-trained or
    distilled one can peak ~0.3 with the same localisation quality), so a
    fixed absolute cut rejects every detection from a weak-amplitude
    model. Relative-to-max peak picking is the standard remedy; the clip
    keeps `conf_threshold` as the strong-model behaviour (identical to the
    previous fixed threshold when peaks are high) and `conf_floor` as the
    noise floor below which nothing counts.
    """
    return float(np.clip(rel_conf_frac * float(confs.max()),
                         conf_floor, conf_threshold))


def _refine(stage, hrnet_vars, image, H, W, centre, height, width,
            n_iters, conf_threshold, min_visible, margins,
            conf_floor, rel_conf_frac):
    """Iterated crop->HRNet->confident-kp-box loop from a starting crop.

    Returns the last (x0, y0, x1, y1, confs, eff_thr) that passed
    min_visible, or None if no pass did. A later refinement pass losing the
    subject (e.g. the tightened crop clipping limbs) must not discard a
    valid earlier detection — hence last-accepted, not last-computed.
    """
    accepted = None
    for _ in range(max(1, int(n_iters))):
        kp, confs = stage(hrnet_vars, image,
                          jnp.asarray(centre, jnp.float32),
                          jnp.asarray(height, jnp.float32),
                          jnp.asarray(width, jnp.float32))
        kp = np.asarray(kp)
        confs = np.asarray(confs)
        eff = _effective_threshold(confs, conf_threshold, conf_floor,
                                   rel_conf_frac)
        vis = confs > eff
        if vis.sum() < min_visible:
            break
        x0, y0, x1, y1 = _box_from_kps(kp, vis, H, W, margins)
        accepted = (x0, y0, x1, y1, confs, eff)
        centre = np.array([(y0 + y1) / 2.0, (x0 + x1) / 2.0], np.float32)
        height, width = y1 - y0, x1 - x0
    return accepted


def _empty_detections():
    return {"boxes": np.zeros((0, 4), np.float32),
            "labels": np.zeros((0,), np.int64),
            "scores": np.zeros((0,), np.float32)}


def make_keypoint_bootstrap_detector(hrnet_apply, hrnet_config,
                                     hrnet_vars=None,
                                     conf_threshold=0.3,
                                     min_visible=6,
                                     n_iters=2,
                                     margins=(0.25, 0.10, 0.125),
                                     conf_floor=0.1,
                                     rel_conf_frac=0.35):
    """Build an `object_detect_fn`-compatible person detector from HRNet.

    :param hrnet_apply: params-explicit `hrnet_apply(variables, images)`
        when hrnet_vars is given, else `hrnet_apply(images)`.
    :param conf_threshold: heatmap peak value below which a keypoint is
        treated as invisible — for strong-amplitude models; the effective
        per-image threshold is amplitude-adaptive, see
        `_effective_threshold` (clip(rel_conf_frac * max_conf, conf_floor,
        conf_threshold)).
    :param min_visible: fewer confident keypoints than this -> no detection
        (the caller falls back to the whole frame, reference behaviour).
    :param conf_floor: noise floor — peaks below this never count.
    :param rel_conf_frac: fraction of the image's strongest peak that other
        peaks must reach.
    :param n_iters: localisation iterations (1 = whole-frame pass only).
    :param margins: (top, bottom, sides) expansion as fractions of the raw
        keypoint bbox height/width — COCO-17 stops at the nose and ankles,
        so the head above and feet below must be margined in.
    :return: callable image (3, H, W) float [0,1] ->
        {"boxes": (N, 4) xyxy, "labels": (N,), "scores": (N,)}
    """
    stage, _, _, _, hrnet_vars = _build_stage(
        hrnet_apply, hrnet_config, hrnet_vars)

    def detect(image):
        H, W = int(image.shape[1]), int(image.shape[2])
        image = jnp.asarray(image)
        accepted = _refine(
            stage, hrnet_vars, image, H, W,
            centre=np.array([H / 2.0, W / 2.0], np.float32),
            height=float(H), width=float(W),
            n_iters=n_iters, conf_threshold=conf_threshold,
            min_visible=min_visible, margins=margins,
            conf_floor=conf_floor, rel_conf_frac=rel_conf_frac)
        if accepted is None:
            return _empty_detections()
        x0, y0, x1, y1, confs, eff = accepted

        # Acceptance happens HERE (>= min_visible confident keypoints), not
        # via the downstream score threshold: keypoint-peak confidences are
        # not calibrated like detector scores (a confident trained-HRNet
        # detection averages ~0.5-0.9, under typical 0.8-0.95 detector
        # thresholds), so an accepted box reports score 1.0 and the raw mean
        # keypoint confidence rides along for diagnostics.
        raw = float(confs[confs > eff].mean())
        return {"boxes": np.array([[x0, y0, x1, y1]], np.float32),
                "labels": np.array([1], np.int64),       # COCO person
                "scores": np.array([1.0], np.float32),
                "kp_mean_conf": np.array([raw], np.float32)}

    return detect


def _cluster_peaks(kp, confs, conf_threshold, radius):
    """Greedy spatial clustering of per-joint heatmap peaks into skeleton
    seeds: strongest-first assignment to the nearest cluster centroid
    within `radius`, at most ONE peak per joint channel per cluster (two
    right-wrists cannot belong to one person).

    :param kp: (K, P, 2) peak xy in original-image px
    :param confs: (K, P)
    :return: list of clusters, each {"pts": (n, 2), "confs": (n,),
        "cx", "cy"}, sorted by total confidence descending.
    """
    K, P = confs.shape
    entries = [(float(confs[k, p]), k, float(kp[k, p, 0]), float(kp[k, p, 1]))
               for k in range(K) for p in range(P)
               if confs[k, p] > conf_threshold]
    entries.sort(key=lambda e: -e[0])
    clusters = []
    for c, k, x, y in entries:
        best, best_d = None, radius
        for cl in clusters:
            if k in cl["chan"]:
                continue
            d = np.hypot(x - cl["cx"], y - cl["cy"])
            if d < best_d:
                best, best_d = cl, d
        if best is None:
            clusters.append({"pts": [(x, y)], "confs": [c], "chan": {k}})
        else:
            best["pts"].append((x, y))
            best["confs"].append(c)
            best["chan"].add(k)
        cl = best if best is not None else clusters[-1]
        w = np.asarray(cl["confs"])
        pts = np.asarray(cl["pts"])
        cl["cx"], cl["cy"] = (pts * (w / w.sum())[:, None]).sum(axis=0)
    for cl in clusters:
        cl["pts"] = np.asarray(cl["pts"], np.float32)
        cl["confs"] = np.asarray(cl["confs"], np.float32)
    clusters.sort(key=lambda cl: -float(cl["confs"].sum()))
    return clusters


def _iou_xyxy(a, b):
    ix = max(0.0, min(a[2], b[2]) - max(a[0], b[0]))
    iy = max(0.0, min(a[3], b[3]) - max(a[1], b[1]))
    inter = ix * iy
    ua = ((a[2] - a[0]) * (a[3] - a[1])
          + (b[2] - b[0]) * (b[3] - b[1]) - inter)
    return inter / ua if ua > 0 else 0.0


def make_multi_person_bootstrap_detector(hrnet_apply, hrnet_config,
                                         hrnet_vars=None,
                                         conf_threshold=0.3,
                                         min_visible=6,
                                         max_people=4,
                                         n_iters=2,
                                         margins=(0.25, 0.10, 0.125),
                                         cluster_radius_frac=0.18,
                                         min_seed_joints=3,
                                         seed_min_frac=0.15,
                                         nms_iou=0.55,
                                         conf_floor=0.1,
                                         rel_conf_frac=0.35):
    """N-person variant of the keypoint bootstrap (round-4 VERDICT next #7).

    Whole-frame pass extracts up to `max_people` LOCAL maxima per joint
    channel; greedy clustering groups them into skeleton seeds (radius
    `cluster_radius_frac` * max(H, W) — small enough that two side-by-side
    people don't merge; a person split across seeds self-heals via
    refinement + NMS); each seed with >= `min_seed_joints` channels gets
    its own `n_iters` refinement loop starting from its peak bbox (floored
    to `seed_min_frac` of the frame so a tight peak cloud still crops in
    enough context); duplicate convergences are merged by IoU NMS, kept
    strongest-first by mean keypoint confidence.

    Cost: 1 peaks pass + (n_clusters * n_iters) HRNet passes per image.

    The reference capability bar is Mask-RCNN's N person boxes
    (/root/reference/predict/predict_hrnet.py:52-66); measured accuracy on
    synthetic 2-person composites is recorded by
    benchmarks/detector_validation.py --multi.

    :return: callable image (3, H, W) float [0,1] ->
        {"boxes": (N, 4) xyxy, "labels": (N,), "scores": (N,)}
    """
    stage, peaks_factory, _, _, hrnet_vars = _build_stage(
        hrnet_apply, hrnet_config, hrnet_vars)
    peaks_stage = peaks_factory(int(max_people))

    def detect(image):
        H, W = int(image.shape[1]), int(image.shape[2])
        image = jnp.asarray(image)
        kp, confs = peaks_stage(
            hrnet_vars, image,
            jnp.asarray([H / 2.0, W / 2.0], jnp.float32),
            jnp.asarray(float(H), jnp.float32),
            jnp.asarray(float(W), jnp.float32))
        confs_np = np.asarray(confs)
        eff0 = _effective_threshold(confs_np, conf_threshold, conf_floor,
                                    rel_conf_frac)
        clusters = _cluster_peaks(np.asarray(kp), confs_np, eff0,
                                  radius=cluster_radius_frac * max(H, W))
        clusters = [c for c in clusters if len(c["chan"]) >= min_seed_joints]

        boxes, raws = [], []
        for cl in clusters:
            pts = cl["pts"]
            x0, y0 = pts.min(axis=0)
            x1, y1 = pts.max(axis=0)
            # Seed crop: peak bbox + margins, floored to seed_min_frac of
            # the frame (a 3-joint seed can be a tiny cloud; the refinement
            # pass needs enough context around it to see the whole person).
            top, bottom, sides = margins
            h, w = y1 - y0, x1 - x0
            hh = max((1 + top + bottom) * h, seed_min_frac * H, _MIN_BOX_EXT)
            ww = max((1 + 2 * sides) * w, seed_min_frac * W, _MIN_BOX_EXT)
            centre = np.array([(y0 + y1) / 2.0, (x0 + x1) / 2.0], np.float32)
            accepted = _refine(
                stage, hrnet_vars, image, H, W,
                centre=centre, height=float(hh), width=float(ww),
                n_iters=n_iters, conf_threshold=conf_threshold,
                min_visible=min_visible, margins=margins,
                conf_floor=conf_floor, rel_conf_frac=rel_conf_frac)
            if accepted is None:
                continue
            bx0, by0, bx1, by1, rconfs, reff = accepted
            boxes.append((bx0, by0, bx1, by1))
            raws.append(float(rconfs[rconfs > reff].mean()))

        # Greedy IoU NMS, strongest mean-keypoint-confidence first.
        order = np.argsort(-np.asarray(raws)) if raws else []
        kept, kept_raw = [], []
        for i in order:
            if len(kept) >= max_people:
                break
            if all(_iou_xyxy(boxes[i], kb) < nms_iou for kb in kept):
                kept.append(boxes[i])
                kept_raw.append(raws[i])
        if not kept:
            return _empty_detections()
        n = len(kept)
        return {"boxes": np.asarray(kept, np.float32),
                "labels": np.ones((n,), np.int64),       # COCO person
                "scores": np.ones((n,), np.float32),
                "kp_mean_conf": np.asarray(kept_raw, np.float32)}

    return detect
