"""HRNet keypoint-bootstrap person detector (predict/keypoint_detector.py).

No trained HRNet ships in this environment, so accuracy-vs-Mask-RCNN cannot
be measured here; what these tests pin is the part that CAN silently break —
the geometry loop: crop affine -> heatmap peak -> inverse mapping to
original-image coordinates -> margin expansion -> refined crop. The stub
HRNet is CONTENT-AWARE (its heatmap peaks sit at the centroid of image
brightness in whatever crop it is given), so a wrong inverse mapping or a
wrong margin sign sends the bbox away from the bright "person" and the
convergence assertion fails.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from hierarchicalprobabilistic3dhuman_tpu.configs import (
    get_pose2d_hrnet_cfg_defaults)
from hierarchicalprobabilistic3dhuman_tpu.predict.keypoint_detector import (
    make_keypoint_bootstrap_detector)

HRNET_CFG = get_pose2d_hrnet_cfg_defaults()
HM_W, HM_H = HRNET_CFG.MODEL.HEATMAP_SIZE


def _centroid_stub(spread=4):
    """Heatmaps whose 17 peaks form a small 2-D cloud around the brightness
    centroid of the (normalised) input crop — a fake 'person detector' that
    actually looks at pixels, so a wrong inverse mapping moves the box off
    the bright subject."""

    def stub(x):  # (B, 3, 384, 288) normalised
        B, _, H, W = x.shape
        lum = x.sum(axis=1)                                   # (B, H, W)
        lum = lum - lum.min(axis=(1, 2), keepdims=True)
        total = lum.sum(axis=(1, 2)) + 1e-6
        ys = (lum * jnp.arange(H)[None, :, None]).sum(axis=(1, 2)) / total
        xs = (lum * jnp.arange(W)[None, None, :]).sum(axis=(1, 2)) / total
        hm = jnp.zeros((B, 17, HM_H, HM_W))
        for j in range(17):
            dy = (j // 3 - 2.5) * spread                      # ~person-shaped
            dx = (j % 3 - 1) * spread                         # 2-D cloud
            py = jnp.clip((ys / 4.0 + dy).astype(jnp.int32), 0, HM_H - 1)
            px = jnp.clip((xs / 4.0 + dx).astype(jnp.int32), 0, HM_W - 1)
            hm = hm.at[jnp.arange(B), j, py, px].set(0.9)
        return hm

    return stub


def test_bbox_converges_on_bright_subject():
    H, W = 512, 384
    # the "person": an off-centre gaussian blob (smooth brightness, so the
    # stub's centroid stays well-defined inside ANY sub-crop — a uniform
    # block saturates the refined crop and degenerates the centroid)
    sy, sx = 240.0, 120.0
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    img = np.broadcast_to(
        np.exp(-(((yy - sy) / 80.0) ** 2 + ((xx - sx) / 40.0) ** 2)),
        (3, H, W)).astype(np.float32)

    detect = make_keypoint_bootstrap_detector(
        _centroid_stub(), HRNET_CFG, n_iters=2, conf_threshold=0.3,
        min_visible=6)
    out = detect(jnp.asarray(img))
    assert out["boxes"].shape == (1, 4)
    assert out["labels"][0] == 1 and out["scores"][0] == 1.0
    bx0, by0, bx1, by1 = out["boxes"][0]
    # The stub's peaks cluster on the blob centroid, so the detected box
    # must be centred on the blob...
    cx, cy = (bx0 + bx1) / 2, (by0 + by1) / 2
    assert abs(cx - sx) < 25, out["boxes"]
    assert abs(cy - sy) < 35, out["boxes"]
    # ...a real localisation (neither degenerate nor the whole frame), and
    # inside it.
    assert 10 < (bx1 - bx0) < 0.8 * W, out["boxes"]
    assert 30 < (by1 - by0) < 0.9 * H, out["boxes"]
    assert bx0 >= 0 and by0 >= 0 and bx1 <= W and by1 <= H


def test_no_confident_keypoints_means_no_detection():
    def dead_stub(x):
        return jnp.zeros((x.shape[0], 17, HM_H, HM_W))

    detect = make_keypoint_bootstrap_detector(dead_stub, HRNET_CFG)
    out = detect(jnp.zeros((3, 256, 256)))
    assert out["boxes"].shape == (0, 4)
    # select_centremost_person_box must fall back to the whole frame on this
    from hierarchicalprobabilistic3dhuman_tpu.predict.predict_hrnet import (
        select_centremost_person_box)
    centre, h, w = select_centremost_person_box(out, (256, 256))
    assert h == 256 and w == 256


def test_detection_feeds_box_selection():
    """The emitted dict plugs into select_centremost_person_box (the
    torchvision-contract consumer) and survives its person/score filter."""
    from hierarchicalprobabilistic3dhuman_tpu.predict.predict_hrnet import (
        select_centremost_person_box)
    H, W = 400, 300
    img = np.zeros((3, H, W), np.float32)
    img[:, 100:300, 80:220] = 1.0
    detect = make_keypoint_bootstrap_detector(_centroid_stub(), HRNET_CFG)
    out = detect(jnp.asarray(img))
    centre, h, w = select_centremost_person_box(out, (H, W), threshold=0.95)
    assert h < H and w < W  # a real (non-fallback) box survived


def test_refinement_failure_falls_back_to_accepted_box():
    """A refinement pass that drops below min_visible must return the LAST
    accepted box, not discard a valid first-pass detection (advisor
    round-4): stub is confident on the whole frame but goes dead on the
    refined (smaller) crop."""
    H, W = 512, 384
    sy, sx = 240.0, 120.0
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    img = np.broadcast_to(
        np.exp(-(((yy - sy) / 80.0) ** 2 + ((xx - sx) / 40.0) ** 2)),
        (3, H, W)).astype(np.float32)

    base = _centroid_stub()
    calls = {"n": 0}

    def flaky_stub(x):
        calls["n"] += 1
        if calls["n"] > 1:          # second (refined) pass: nothing visible
            return jnp.zeros((x.shape[0], 17, HM_H, HM_W))
        return base(x)

    detect = make_keypoint_bootstrap_detector(
        flaky_stub, HRNET_CFG, n_iters=2, conf_threshold=0.3, min_visible=6)
    out = detect(jnp.asarray(img))
    assert out["boxes"].shape == (1, 4), "first-pass detection was discarded"
    bx0, by0, bx1, by1 = out["boxes"][0]
    cx, cy = (bx0 + bx1) / 2, (by0 + by1) / 2
    assert abs(cx - sx) < 30 and abs(cy - sy) < 40


def test_degenerate_keypoint_cloud_gets_min_extent_box():
    """Coincident keypoints (zero-extent raw bbox) must yield a clamped
    minimum-size box, never a ~zero-extent one that degenerates the re-crop
    affine (advisor round-4)."""

    def point_stub(x):  # all 17 peaks at the same heatmap cell
        B = x.shape[0]
        hm = jnp.zeros((B, 17, HM_H, HM_W))
        hm = hm.at[:, :, HM_H // 2, HM_W // 2].set(0.9)
        return hm

    detect = make_keypoint_bootstrap_detector(
        point_stub, HRNET_CFG, n_iters=2, conf_threshold=0.3, min_visible=6)
    out = detect(jnp.ones((3, 256, 256)))
    assert out["boxes"].shape == (1, 4)
    bx0, by0, bx1, by1 = out["boxes"][0]
    assert (bx1 - bx0) >= 7.9 and (by1 - by0) >= 7.9, out["boxes"]
    assert np.isfinite(out["boxes"]).all()


def _two_person_stub(spread=4):
    """Two 'people' encoded in DIFFERENT colour channels: person A is a red
    gaussian blob, person B a blue one. Per joint channel the stub emits a
    peak at the centroid of each colour channel's brightness — but only if
    that channel actually has contrast in the crop (an isolated crop of one
    person gives the other colour zero amplitude -> conf 0). So the
    whole-frame pass sees TWO local maxima per joint and a refined
    single-person crop sees one: exactly the multi-peak + refinement
    contract the multi-person detector relies on.

    Unlike the fixed-heatmap-spread _centroid_stub, the joint cloud here
    scales with the blob's APPARENT size in the crop (weighted std of its
    brightness) — like a real person, whose joints have fixed
    original-image extent however far the detector zooms in. A fixed
    heatmap-space cloud would collapse to the minimum-extent clamp under
    the multi path's seed-crop + refinement zooms."""

    def stub(x):  # (B, 3, 384, 288) ImageNet-normalised
        B, _, H, W = x.shape
        hm = jnp.zeros((B, 17, HM_H, HM_W))
        for ch in (0, 2):
            lum = x[:, ch]
            lum = lum - lum.min(axis=(1, 2), keepdims=True)
            amp = lum.max(axis=(1, 2))                      # (B,)
            conf = jnp.where(amp > 0.2, 0.9, 0.0)
            total = lum.sum(axis=(1, 2)) + 1e-6
            ys = (lum * jnp.arange(H)[None, :, None]).sum(axis=(1, 2)) / total
            xs = (lum * jnp.arange(W)[None, None, :]).sum(axis=(1, 2)) / total
            var_y = (lum * (jnp.arange(H)[None, :, None] - ys[:, None, None])
                     ** 2).sum(axis=(1, 2)) / total
            var_x = (lum * (jnp.arange(W)[None, None, :] - xs[:, None, None])
                     ** 2).sum(axis=(1, 2)) / total
            sd_y = jnp.sqrt(var_y) + 1.0                    # crop px
            sd_x = jnp.sqrt(var_x) + 1.0
            for j in range(17):
                dy = (j // 3 - 2.5) / 2.5 * sd_y            # +- 1 std cloud
                dx = (j % 3 - 1) * sd_x
                py = jnp.clip(((ys + dy) / 4.0).astype(jnp.int32),
                              0, HM_H - 1)
                px = jnp.clip(((xs + dx) / 4.0).astype(jnp.int32),
                              0, HM_W - 1)
                hm = hm.at[jnp.arange(B), j, py, px].max(conf)
        return hm

    return stub


def _blob(H, W, sy, sx, sig_y=60.0, sig_x=35.0):
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    return np.exp(-(((yy - sy) / sig_y) ** 2 + ((xx - sx) / sig_x) ** 2))


def test_multi_person_finds_both_people():
    from hierarchicalprobabilistic3dhuman_tpu.predict.keypoint_detector import (
        make_multi_person_bootstrap_detector)
    H, W = 512, 384
    ay, ax = 200.0, 100.0          # person A (red channel)
    by, bx = 300.0, 280.0          # person B (blue channel)
    img = np.zeros((3, H, W), np.float32)
    img[0] = _blob(H, W, ay, ax)
    img[2] = _blob(H, W, by, bx)

    detect = make_multi_person_bootstrap_detector(
        _two_person_stub(), HRNET_CFG, n_iters=2, conf_threshold=0.3,
        min_visible=6, max_people=4)
    out = detect(jnp.asarray(img))
    assert out["boxes"].shape == (2, 4), out["boxes"]
    assert (out["labels"] == 1).all() and (out["scores"] == 1.0).all()
    centres = np.stack([(out["boxes"][:, 0] + out["boxes"][:, 2]) / 2,
                        (out["boxes"][:, 1] + out["boxes"][:, 3]) / 2], axis=1)
    # one box per person, each centred on its blob
    d_a = np.hypot(centres[:, 0] - ax, centres[:, 1] - ay)
    d_b = np.hypot(centres[:, 0] - bx, centres[:, 1] - by)
    assert d_a.min() < 35, (centres, out["boxes"])
    assert d_b.min() < 35, (centres, out["boxes"])
    assert np.argmin(d_a) != np.argmin(d_b)
    # real localisations, inside the frame
    bxs = out["boxes"]
    assert (bxs[:, 2] - bxs[:, 0] > 10).all()
    assert (bxs[:, 3] - bxs[:, 1] > 10).all()
    assert (bxs[:, 2] - bxs[:, 0] < 0.8 * W).all()


def test_multi_person_single_subject_yields_one_box():
    """One person must NOT be split into several detections: duplicate seed
    clusters converge onto the same subject and NMS merges them."""
    from hierarchicalprobabilistic3dhuman_tpu.predict.keypoint_detector import (
        make_multi_person_bootstrap_detector)
    H, W = 512, 384
    sy, sx = 240.0, 120.0
    img = np.zeros((3, H, W), np.float32)
    img[0] = _blob(H, W, sy, sx, 80.0, 40.0)

    detect = make_multi_person_bootstrap_detector(
        _two_person_stub(), HRNET_CFG, n_iters=2, conf_threshold=0.3,
        min_visible=6, max_people=4)
    out = detect(jnp.asarray(img))
    assert out["boxes"].shape == (1, 4), out["boxes"]
    cx = (out["boxes"][0, 0] + out["boxes"][0, 2]) / 2
    cy = (out["boxes"][0, 1] + out["boxes"][0, 3]) / 2
    assert abs(cx - sx) < 30 and abs(cy - sy) < 40


def test_multi_person_empty_image_yields_no_detection():
    from hierarchicalprobabilistic3dhuman_tpu.predict.keypoint_detector import (
        make_multi_person_bootstrap_detector)

    def dead_stub(x):
        return jnp.zeros((x.shape[0], 17, HM_H, HM_W))

    detect = make_multi_person_bootstrap_detector(dead_stub, HRNET_CFG)
    out = detect(jnp.zeros((3, 256, 256)))
    assert out["boxes"].shape == (0, 4)
