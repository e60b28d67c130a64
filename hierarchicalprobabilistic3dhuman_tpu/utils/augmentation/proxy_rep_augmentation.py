"""Proxy-representation augmentation: body-part removal, occlusion, joint noise.

Batched JAX equivalents of the reference's utils/augmentation/
proxy_rep_augmentation.py — every per-example python loop and boolean-index
assignment becomes a broadcasted mask, so the whole augmentation pipeline jits
into the synthetic-data step. All randomness flows from explicit PRNG keys.
"""

import numpy as np
import jax
import jax.numpy as jnp

from hierarchicalprobabilistic3dhuman_tpu.utils.label_conversions import (
    TWENTYFOUR_PART_SEG_TO_COCO_JOINTS_MAP)

# DensePose part classes removed by extreme-crop (reference :246-251).
_EXTREME_CROP_LEGS = np.array([5, 6, 7, 8, 9, 10, 11, 12, 13, 14])
_EXTREME_CROP_LEGS_ARMS = np.array([3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14,
                                    19, 20, 21, 22])


def _class_lut(classes, num_classes=25):
    lut = np.zeros(num_classes, np.bool_)
    lut[classes] = True
    return jnp.asarray(lut)


def random_joints2D_deviation(key, joints2D,
                              delta_j2d_dev_range=(-5, 5),
                              delta_j2d_hip_dev_range=(-15, 15)):
    """Uniform jitter on 2D joints; hips may use a different range (reference :7-24)."""
    B, K, _ = joints2D.shape
    key_o, key_h = jax.random.split(key)
    l, h = delta_j2d_dev_range
    dev = jax.random.uniform(key_o, (B, K, 2), minval=l, maxval=h,
                             dtype=joints2D.dtype)
    lh, hh = delta_j2d_hip_dev_range
    hip_dev = jax.random.uniform(key_h, (B, 2, 2), minval=lh, maxval=hh,
                                 dtype=joints2D.dtype)
    dev = dev.at[:, jnp.asarray([11, 12])].set(hip_dev)
    return joints2D + dev


def random_remove_bodyparts(key, seg, classes_to_remove,
                            probabilities_to_remove_classes,
                            joints2D_visib=None,
                            probability_to_remove_joints=0.5):
    """Randomly zero whole body-part classes; optionally hide linked joints
    (reference :27-59).

    :param seg: (B, wh, wh) 24-part seg
    :param joints2D_visib: (B, 17) bool or None
    """
    B = seg.shape[0]
    n = len(classes_to_remove)
    key_cls, key_joints = jax.random.split(key)
    remove = jax.random.uniform(key_cls, (n, B)) < jnp.asarray(
        probabilities_to_remove_classes)[:, None]                 # (n, B)
    joint_rand = jax.random.uniform(key_joints, (n, B)) < probability_to_remove_joints

    for i, cls in enumerate(classes_to_remove):
        hit = remove[i][:, None, None] & (seg == cls)
        seg = jnp.where(hit, 0, seg)
        if joints2D_visib is not None and cls in TWENTYFOUR_PART_SEG_TO_COCO_JOINTS_MAP:
            joint = TWENTYFOUR_PART_SEG_TO_COCO_JOINTS_MAP[cls]
            hide = remove[i] & joint_rand[i]
            joints2D_visib = joints2D_visib.at[:, joint].set(
                joints2D_visib[:, joint] & ~hide)
    return seg, joints2D_visib


def random_remove_joints2D(key, joints2D_visib, joints_to_remove,
                           probability_to_remove=0.1):
    """Randomly hide specific joints (reference :62-70)."""
    B = joints2D_visib.shape[0]
    rand = jax.random.uniform(key, (len(joints_to_remove), B)) < probability_to_remove
    for i, joint in enumerate(joints_to_remove):
        joints2D_visib = joints2D_visib.at[:, joint].set(
            joints2D_visib[:, joint] & ~rand[i])
    return joints2D_visib


def random_swap_joints2D(key, joints2D, joints_to_swap, swap_probability=0.1):
    """Randomly swap L/R joint pairs (reference :73-91)."""
    B = joints2D.shape[0]
    rand = jax.random.uniform(key, (len(joints_to_swap), B)) < swap_probability
    for i, (a, b) in enumerate(joints_to_swap):
        swap = rand[i][:, None]
        ja = jnp.where(swap, joints2D[:, b], joints2D[:, a])
        jb = jnp.where(swap, joints2D[:, a], joints2D[:, b])
        joints2D = joints2D.at[:, a].set(ja).at[:, b].set(jb)
    return joints2D


def random_occlude_box(key, seg, occlude_probability=0.2, occlude_box_dim=32.0):
    """Zero a random square box near the image centre (reference :94-118)."""
    B, H, W = seg.shape
    key_p, key_x, key_y = jax.random.split(key, 3)
    apply = jax.random.uniform(key_p, (B,)) < occlude_probability
    centre = W / 2.0
    lo, hi = centre - 0.3 * W / 2.0, centre + 0.3 * W / 2.0
    cx = jax.random.uniform(key_x, (B,), minval=lo, maxval=hi)
    cy = jax.random.uniform(key_y, (B,), minval=lo, maxval=hi)
    x1 = (cx - occlude_box_dim / 2).astype(jnp.int32)
    x2 = (cx + occlude_box_dim / 2).astype(jnp.int32)
    y1 = (cy - occlude_box_dim / 2).astype(jnp.int32)
    y2 = (cy + occlude_box_dim / 2).astype(jnp.int32)
    rows = jnp.arange(H)[None, :, None]
    cols = jnp.arange(W)[None, None, :]
    in_box = ((rows >= x1[:, None, None]) & (rows < x2[:, None, None])
              & (cols >= y1[:, None, None]) & (cols < y2[:, None, None]))
    return jnp.where(apply[:, None, None] & in_box, 0, seg)


def _occlude_half(key, img, joints2D, joints2D_visib, occlude_probability,
                  axis, jitter_div, channels_first_rgb=False):
    """Shared bottom/top/vertical half-occlusion.

    axis: 'bottom' (rows >= t), 'top' (rows < t), 'vertical' (random side cols).
    img: (B, wh, wh) seg or (B, 3, wh, wh) rgb.
    """
    B = img.shape[0]
    wh = img.shape[-1]
    key_p, key_t, key_side = jax.random.split(key, 3)
    apply = jax.random.uniform(key_p, (B,)) < occlude_probability
    jit = wh // jitter_div
    t = wh // 2 + jax.random.randint(key_t, (B,), -jit, jit)

    rows = jnp.arange(wh)
    if axis == "bottom":
        mask2d = rows[None, :, None] >= t[:, None, None]          # rows
        jmask = (joints2D[..., 1] > t[:, None]) if joints2D is not None else None
    elif axis == "top":
        mask2d = rows[None, :, None] < t[:, None, None]
        jmask = (joints2D[..., 1] < t[:, None]) if joints2D is not None else None
    else:  # vertical
        side = jax.random.uniform(key_side, (B,)) > 0.5
        left = rows[None, None, :] < t[:, None, None]             # cols
        mask2d = jnp.where(side[:, None, None], left, ~left)
        if joints2D is not None:
            jleft = joints2D[..., 0] < t[:, None]
            jmask = jnp.where(side[:, None], jleft,
                              joints2D[..., 0] > t[:, None])
        else:
            jmask = None

    full = apply[:, None, None] & mask2d
    if img.ndim == 4:  # rgb (B, 3, wh, wh)
        img = jnp.where(full[:, None], 0.0, img)
    else:
        img = jnp.where(full, 0, img)
    if joints2D_visib is not None and jmask is not None:
        joints2D_visib = joints2D_visib & ~(apply[:, None] & jmask)
    return img, joints2D, joints2D_visib


def random_occlude_bottom_half(key, img, joints2D, joints2D_visib,
                               occlude_probability=0.05):
    return _occlude_half(key, img, joints2D, joints2D_visib,
                         occlude_probability, "bottom", 5)


def random_occlude_top_half(key, img, joints2D, joints2D_visib,
                            occlude_probability=0.05):
    return _occlude_half(key, img, joints2D, joints2D_visib,
                         occlude_probability, "top", 5)


def random_occlude_vertical_half(key, img, joints2D, joints2D_visib,
                                 occlude_probability=0.05):
    return _occlude_half(key, img, joints2D, joints2D_visib,
                         occlude_probability, "vertical", 30)


def augment_proxy_representation(key, seg, joints2D, joints2D_visib,
                                 proxy_rep_augment_config):
    """Full proxy-rep augmentation pipeline (reference :186-235)."""
    cfg = proxy_rep_augment_config
    keys = jax.random.split(key, 7)

    seg, joints2D_visib = random_remove_bodyparts(
        keys[0], seg,
        classes_to_remove=cfg.REMOVE_PARTS_CLASSES,
        probabilities_to_remove_classes=cfg.REMOVE_PARTS_PROBS,
        joints2D_visib=joints2D_visib,
        probability_to_remove_joints=cfg.REMOVE_APPENDAGE_JOINTS_PROB)
    seg = random_occlude_box(keys[1], seg,
                             occlude_probability=cfg.OCCLUDE_BOX_PROB,
                             occlude_box_dim=cfg.OCCLUDE_BOX_DIM)
    joints2D = random_swap_joints2D(keys[2], joints2D,
                                    joints_to_swap=cfg.JOINTS_TO_SWAP,
                                    swap_probability=cfg.JOINTS_SWAP_PROB)
    # Reference passes the same range for hips (orchestrator :212-214).
    joints2D = random_joints2D_deviation(keys[3], joints2D,
                                         delta_j2d_dev_range=cfg.DELTA_J2D_DEV_RANGE,
                                         delta_j2d_hip_dev_range=cfg.DELTA_J2D_DEV_RANGE)
    joints2D_visib = random_remove_joints2D(keys[4], joints2D_visib,
                                            joints_to_remove=cfg.REMOVE_JOINTS_INDICES,
                                            probability_to_remove=cfg.REMOVE_JOINTS_PROB)
    seg, joints2D, joints2D_visib = random_occlude_bottom_half(
        keys[5], seg, joints2D, joints2D_visib,
        occlude_probability=cfg.OCCLUDE_BOTTOM_PROB)
    key_top, key_vert = jax.random.split(keys[6])
    seg, joints2D, joints2D_visib = random_occlude_top_half(
        key_top, seg, joints2D, joints2D_visib,
        occlude_probability=cfg.OCCLUDE_TOP_PROB)
    seg, joints2D, joints2D_visib = random_occlude_vertical_half(
        key_vert, seg, joints2D, joints2D_visib,
        occlude_probability=cfg.OCCLUDE_VERTICAL_PROB)
    return seg, joints2D, joints2D_visib


def random_extreme_crop(key, seg, extreme_crop_probability=0.05):
    """Remove legs (or legs+arms) from the seg before bbox computation
    (reference :238-275)."""
    B = seg.shape[0]
    rand = jax.random.uniform(key, (B,))
    legs_only = rand < extreme_crop_probability * 0.5
    legs_arms = (rand > extreme_crop_probability * 0.5) & (rand < extreme_crop_probability)

    # Range tests instead of LUT gathers (generic gathers over (B, wh, wh)
    # were ~74 ms of the fused training step on v5e).
    seg_idx = seg.astype(jnp.int32)
    is_leg = (seg_idx >= 5) & (seg_idx <= 14)                       # classes 5-14
    is_leg_arm = (((seg_idx >= 3) & (seg_idx <= 14))                # 3-14
                  | ((seg_idx >= 19) & (seg_idx <= 22)))            # 19-22
    seg = jnp.where(legs_only[:, None, None] & is_leg, 0, seg)
    seg = jnp.where(legs_arms[:, None, None] & is_leg_arm, 0, seg)
    return seg
