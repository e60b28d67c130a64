"""Augmentation suite: statistical behaviour + jit-safety tests."""

import numpy as np
import jax
import jax.numpy as jnp

from hierarchicalprobabilistic3dhuman_tpu.configs import get_pose_shape_cfg_defaults
from hierarchicalprobabilistic3dhuman_tpu.utils.augmentation.smpl_augmentation import (
    normal_sample_shape, uniform_sample_shape)
from hierarchicalprobabilistic3dhuman_tpu.utils.augmentation.cam_augmentation import augment_cam_t
from hierarchicalprobabilistic3dhuman_tpu.utils.augmentation.lighting_augmentation import augment_light
from hierarchicalprobabilistic3dhuman_tpu.utils.augmentation.proxy_rep_augmentation import (
    augment_proxy_representation, random_extreme_crop, random_remove_bodyparts,
    random_swap_joints2D, random_occlude_box)
from hierarchicalprobabilistic3dhuman_tpu.utils.augmentation.rgb_augmentation import (
    augment_rgb, random_gaussian_blur)

KEY = jax.random.PRNGKey(0)
CFG = get_pose_shape_cfg_defaults()


def test_shape_sampling_stats():
    mean = jnp.zeros(10)
    s = normal_sample_shape(KEY, 4000, mean, jnp.full((10,), 1.25))
    np.testing.assert_allclose(np.asarray(s).std(axis=0), 1.25, atol=0.08)
    u = uniform_sample_shape(KEY, 4000, mean, (-2.0, 2.0))
    assert np.asarray(u).min() >= -2.0 and np.asarray(u).max() <= 2.0


def test_cam_augmentation_stats():
    mean = jnp.broadcast_to(jnp.asarray([0.0, -0.2, 2.5]), (4000, 3))
    out = np.asarray(augment_cam_t(KEY, mean, xy_std=0.05, delta_z_range=(-0.5, 0.5)))
    np.testing.assert_allclose(out[:, 0].std(), 0.05, atol=0.01)
    assert out[:, 2].min() >= 2.0 - 1e-5 and out[:, 2].max() <= 3.0 + 1e-5


def test_light_augmentation():
    lights = augment_light(KEY, 1000, CFG.TRAIN.SYNTH_DATA.AUGMENT.RGB)
    loc = np.asarray(lights["location"])
    r = np.linalg.norm(loc, axis=-1)
    assert r.min() >= 0.05 - 1e-5 and r.max() <= 3.0 + 1e-5
    amb = np.asarray(lights["ambient_color"])
    assert amb.min() >= 0.4 - 1e-6 and amb.max() <= 0.8 + 1e-6
    np.testing.assert_allclose(amb[:, 0], amb[:, 1])  # white light


def test_remove_bodyparts_probability():
    B = 2000
    seg = jnp.full((B, 8, 8), 5, dtype=jnp.int32)  # all pixels class 5
    vis = jnp.ones((B, 17), bool)
    seg_out, vis_out = random_remove_bodyparts(
        KEY, seg, classes_to_remove=[5], probabilities_to_remove_classes=[0.3],
        joints2D_visib=vis, probability_to_remove_joints=1.0)
    removed = np.asarray(seg_out).reshape(B, -1).max(axis=1) == 0
    np.testing.assert_allclose(removed.mean(), 0.3, atol=0.04)
    # class 5 -> COCO joint 15; removed samples also hide that joint
    vis_out = np.asarray(vis_out)
    assert np.all(vis_out[removed, 15] == 0)
    assert np.all(vis_out[~removed, 15] == 1)
    # other joints untouched
    assert np.all(vis_out[:, 0] == 1)


def test_swap_joints():
    B = 2000
    j = jnp.zeros((B, 17, 2)).at[:, 5].set(1.0).at[:, 6].set(2.0)
    out = np.asarray(random_swap_joints2D(KEY, j, [[5, 6]], swap_probability=0.5))
    swapped = out[:, 5, 0] == 2.0
    np.testing.assert_allclose(swapped.mean(), 0.5, atol=0.05)
    # swap is an exchange, never a copy
    assert np.all(out[swapped, 6, 0] == 1.0)
    assert np.all(out[~swapped, 6, 0] == 2.0)


def test_occlude_box_geometry():
    seg = jnp.ones((64, 64, 64), dtype=jnp.int32)
    out = np.asarray(random_occlude_box(KEY, seg, occlude_probability=1.0,
                                        occlude_box_dim=16))
    zeros_per_sample = (out == 0).sum(axis=(1, 2))
    assert np.all(zeros_per_sample > 0)
    np.testing.assert_allclose(zeros_per_sample, 256, atol=32)  # ~16x16 box


def test_full_proxy_augmentation_jits():
    B = 8
    seg = jnp.ones((B, 64, 64), dtype=jnp.int32) * 3
    j2d = jnp.asarray(np.random.RandomState(0).rand(B, 17, 2).astype(np.float32) * 64)
    vis = jnp.ones((B, 17), bool)

    @jax.jit
    def run(key, seg, j2d, vis):
        return augment_proxy_representation(key, seg, j2d, vis,
                                            CFG.TRAIN.SYNTH_DATA.AUGMENT.PROXY_REP)

    seg_o, j2d_o, vis_o = run(KEY, seg, j2d, vis)
    assert seg_o.shape == seg.shape and j2d_o.shape == j2d.shape and vis_o.shape == vis.shape
    assert bool(jnp.all(jnp.isfinite(j2d_o)))


def test_extreme_crop():
    B = 4000
    seg = jnp.full((B, 4, 4), 7, dtype=jnp.int32)  # class 7 = upper leg (removed in both modes)
    out = np.asarray(random_extreme_crop(KEY, seg, extreme_crop_probability=0.5))
    removed = (out == 0).all(axis=(1, 2))
    np.testing.assert_allclose(removed.mean(), 0.5, atol=0.05)
    # class 2 (torso) only removed in the legs+arms branch: never
    seg2 = jnp.full((B, 4, 4), 2, dtype=jnp.int32)
    out2 = np.asarray(random_extreme_crop(KEY, seg2, extreme_crop_probability=0.5))
    assert ((out2 == 0).all(axis=(1, 2))).mean() == 0.0


def test_rgb_augmentation_jits():
    B = 8
    rgb = jnp.asarray(np.random.RandomState(1).rand(B, 3, 64, 64).astype(np.float32))
    j2d = jnp.asarray(np.random.RandomState(2).rand(B, 17, 2).astype(np.float32) * 64)
    vis = jnp.ones((B, 17), bool)

    @jax.jit
    def run(key, rgb, j2d, vis):
        return augment_rgb(key, rgb, j2d, vis, CFG.TRAIN.SYNTH_DATA.AUGMENT.RGB)

    rgb_o, j2d_o, vis_o = run(KEY, rgb, j2d, vis)
    assert rgb_o.shape == rgb.shape
    assert float(rgb_o.max()) <= 1.0


def test_gaussian_blur_preserves_mean():
    rgb = jnp.asarray(np.random.RandomState(3).rand(2, 3, 32, 32).astype(np.float32))
    out = random_gaussian_blur(KEY, rgb, sigma_range=(0.8, 0.8))
    # interior mean preserved by normalised kernel
    np.testing.assert_allclose(float(out[:, :, 8:24, 8:24].mean()),
                               float(rgb[:, :, 8:24, 8:24].mean()), atol=0.01)
