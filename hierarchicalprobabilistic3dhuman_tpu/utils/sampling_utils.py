"""High-level sampling utilities: vertex uncertainty and J2D-error sorting.

JAX equivalents of the reference's utils/sampling_utils.py:146-233, built on
the vectorised sampler in ops/bingham_sampling.py. Unlike the reference these
support batch size > 1 throughout.
"""

import numpy as np
import jax
import jax.numpy as jnp

from hierarchicalprobabilistic3dhuman_tpu.ops.bingham_sampling import (
    pose_matrix_fisher_sampling, shape_gaussian_sampling)
from hierarchicalprobabilistic3dhuman_tpu.utils.rotation_utils import aa_rotate_translate_points
from hierarchicalprobabilistic3dhuman_tpu.utils.cam_utils import orthographic_project
from hierarchicalprobabilistic3dhuman_tpu.utils.joints2d_utils import undo_keypoint_normalisation
from hierarchicalprobabilistic3dhuman_tpu.utils.label_conversions import (
    ALL_JOINTS_TO_COCO_MAP, convert_heatmaps_to_2Djoints_coordinates)


def compute_vertex_uncertainties_by_sampling(key,
                                             pose_U,
                                             pose_S,
                                             pose_V,
                                             shape_mean,
                                             shape_std,
                                             glob_rotmats,
                                             num_samples,
                                             smpl,
                                             use_mean_shape=False,
                                             b=1.5,
                                             oversampling_ratio=8,
                                             mesh=None):
    """Per-vertex mean distance-from-mean over N (pose, shape) SMPL samples.

    reference :146-192, generalised to batch size B (the reference asserts
    B == 1); the (B x N) SMPL evaluations run as ONE batched LBS.

    :param pose_U/S/V: (B, 23, 3, 3) / (B, 23, 3) / (B, 23, 3, 3)
    :param shape_mean, shape_std: (B, num_betas)
    :param glob_rotmats: (B, 3, 3)
    :param mesh: optional ("data", "sample") jax.sharding.Mesh — shards the
        N samples (and the flattened B*N SMPL batch) over the "sample" axis.
    :return: avg_distance (B, 6890), vertices_samples (B, N, 6890, 3),
             joints_samples (B, N, 90, 3)
    """
    from hierarchicalprobabilistic3dhuman_tpu.parallel.mesh import (
        sample_sharding, flat_sample_sharding, constrain)

    if mesh is not None and mesh.shape.get("sample", 1) > 1:
        samp_sh = sample_sharding(mesh)
        flat_sh = flat_sample_sharding(mesh)
    else:
        samp_sh = flat_sh = None

    B = pose_U.shape[0]
    key_pose, key_shape = jax.random.split(key)
    pose_samples = pose_matrix_fisher_sampling(key_pose, pose_U, pose_S, pose_V,
                                               num_samples, b=b,
                                               oversampling_ratio=oversampling_ratio)
    if use_mean_shape:
        shapes = jnp.broadcast_to(shape_mean[:, None],
                                  (B, num_samples, shape_mean.shape[-1]))
    else:
        shapes = shape_gaussian_sampling(key_shape, shape_mean, shape_std, num_samples)
    pose_samples = constrain(pose_samples, samp_sh)
    shapes = constrain(shapes, samp_sh)

    flat_pose = constrain(pose_samples.reshape(B * num_samples, 23, 3, 3),
                          flat_sh)
    flat_shape = shapes.reshape(B * num_samples, -1)
    flat_glob = jnp.broadcast_to(glob_rotmats[:, None], (B, num_samples, 3, 3)) \
        .reshape(B * num_samples, 1, 3, 3)
    out = smpl(body_pose=flat_pose, global_orient=flat_glob, betas=flat_shape,
               pose2rot=False)
    verts = out["vertices"].reshape(B, num_samples, -1, 3)
    joints = out["joints"].reshape(B, num_samples, -1, 3)

    mean_verts = verts.mean(axis=1, keepdims=True)
    avg_distance = jnp.linalg.norm(verts - mean_verts, axis=-1).mean(axis=1)
    return avg_distance, verts, joints


def joints2D_error_sorted_verts_sampling(pred_vertices_samples,
                                         pred_joints_samples,
                                         input_joints2D_heatmaps,
                                         pred_cam_wp):
    """Sort sample meshes by max visible-joint 2D reprojection error (reference :195-233).

    :param pred_vertices_samples: (N, 6890, 3)
    :param pred_joints_samples: (N, 90, 3)
    :param input_joints2D_heatmaps: (1, 17, D, D)
    :param pred_cam_wp: (1, 3)
    :return: (N, 6890, 3) sorted ascending by error
    """
    N = pred_vertices_samples.shape[0]
    coco = pred_joints_samples[:, jnp.asarray(ALL_JOINTS_TO_COCO_MAP), :]
    coco = aa_rotate_translate_points(coco, jnp.asarray([1.0, 0.0, 0.0]),
                                      np.pi, jnp.zeros(3))
    j2d = orthographic_project(coco, jnp.broadcast_to(pred_cam_wp, (N, 3)))
    j2d = undo_keypoint_normalisation(j2d, input_joints2D_heatmaps.shape[-1])

    input_j2d, input_vis = convert_heatmaps_to_2Djoints_coordinates(
        input_joints2D_heatmaps, eps=1e-6)  # (1, 17, 2), (1, 17)
    err = jnp.linalg.norm(j2d - input_j2d, axis=-1)  # (N, 17)
    err = jnp.where(input_vis, err, -jnp.inf)        # invisible joints can't dominate max
    max_err = jnp.max(err, axis=-1)                  # (N,)
    order = jnp.argsort(max_err)
    return pred_vertices_samples[order]
