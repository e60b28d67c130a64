"""Shared realistic-scene builder for the rasterizer benchmarks.

One place for the train-step scene recipe (train driver :95-109): random
axis-angle pose, global row x-flipped 180 degrees, the training camera —
so raster_micro.py and raster_trace.py measure the SAME geometry.
"""

import numpy as np


def build_scene(B, seed=0):
    """Returns (renderer, verts (B,V,3), cam_t (B,3), verts_dp, screen)."""
    import jax.numpy as jnp

    from hierarchicalprobabilistic3dhuman_tpu.configs import (
        get_pose_shape_cfg_defaults)
    from hierarchicalprobabilistic3dhuman_tpu.models.smpl import SMPL
    from hierarchicalprobabilistic3dhuman_tpu.renderers import (
        TexturedIUVRenderer)
    from hierarchicalprobabilistic3dhuman_tpu.utils.rotation_utils import (
        batch_rodrigues)

    cfg = get_pose_shape_cfg_defaults()
    D = cfg.DATA.PROXY_REP_SIZE
    smpl = SMPL.synthetic()
    renderer = TexturedIUVRenderer(
        img_wh=D, projection_type="perspective",
        perspective_focal_length=cfg.TRAIN.SYNTH_DATA.FOCAL_LENGTH,
        render_rgb=True)

    rng = np.random.RandomState(seed)
    pose_aa = jnp.asarray((rng.randn(B, 72) * 0.3).astype(np.float32))
    rotmats = batch_rodrigues(pose_aa.reshape(B * 24, 3)).reshape(B, 24, 3, 3)
    Rx = jnp.asarray([[1.0, 0, 0], [0, -1.0, 0], [0, 0, -1.0]], jnp.float32)
    out = smpl(body_pose=rotmats[:, 1:],
               global_orient=(rotmats[:, 0] @ Rx)[:, None],
               betas=jnp.asarray(rng.randn(B, 10).astype(np.float32)),
               pose2rot=False)
    cam_t = jnp.asarray(
        np.stack([rng.randn(B) * 0.05,
                  rng.randn(B) * 0.05 - 0.2,
                  2.5 + rng.randn(B) * 0.15], axis=1).astype(np.float32))
    verts = out["vertices"]
    verts_dp = verts[:, renderer.verts_map, :]
    screen = renderer._to_screen(verts_dp, cam_t, None)
    return renderer, verts, cam_t, verts_dp, screen
