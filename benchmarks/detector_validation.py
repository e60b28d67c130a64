"""Validate the keypoint-bootstrap person detector with NON-RANDOM weights.

Round-4 gap: the torch-free uncropped-predict detector
(predict/keypoint_detector.py) shipped with its geometry pinned by a stub
but zero accuracy evidence — no trained HRNet exists in this environment.
This harness closes the in-env-closable part (round-4 VERDICT missing #3 /
next #4) using the framework's own synthetic pipeline end to end:

  1. GENERATE uncropped scenes: textured synthetic-SMPL bodies rendered at
     512^2 over cluttered backgrounds, subjects at varied scale (camera z)
     and position (camera xy) — each with GT silhouette-mask box and GT
     projected COCO-17 2D joints (the same projection convention as the
     train driver, train_pose_mf_shape_gaussian_net.make_synth_data_fn);
  2. SMOKE-TRAIN a reduced HRNet (width=16, stage_modules=(1,2,1) — the
     detector only needs coarse heatmap peaks) on random-looseness crops of
     those scenes: crops from near-tight to 3.2x-loose cover exactly the
     views the 2-pass bootstrap sees (whole frame, then refined box);
  3. MEASURE the bootstrap detector's box IoU against held-out GT boxes,
     bucketed by subject scale.

The reference bar is Mask-RCNN's person box selected centre-most
(/root/reference/predict/predict_hrnet.py:52-66); the round-4 verdict's
target is median IoU >= 0.7 in the single-person regime.

Usage: python benchmarks/detector_validation.py [steps] [n_eval]
Writes benchmarks/DETECTOR_VALIDATION_OUTPUT.txt.
"""

import os
import sys
import time

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

FRAME = 512
TRAIN_SCENES = 256
BATCH = 16

# Fixed 8-texture bank (seeded once, shared by train and eval scenes):
# low-frequency colour fields + fine noise, so body parts have a STABLE
# appearance across scenes via the UV atlas — see the note in gen().
_TEXTURE_BANK_NP = None


def _texture_bank():
    global _TEXTURE_BANK_NP
    if _TEXTURE_BANK_NP is None:
        rng = np.random.RandomState(7)
        coarse = rng.rand(8, 8, 8, 3)
        coarse = np.repeat(np.repeat(coarse, 16, axis=1), 16, axis=2)
        fine = rng.rand(8, 128, 128, 3)
        _TEXTURE_BANK_NP = np.clip(
            0.75 * coarse + 0.25 * fine, 0.0, 1.0).astype(np.float32)
    return _TEXTURE_BANK_NP


def build_scene_generator():
    import jax
    import jax.numpy as jnp

    from hierarchicalprobabilistic3dhuman_tpu.configs import (
        get_pose_shape_cfg_defaults)
    from hierarchicalprobabilistic3dhuman_tpu.models.smpl import SMPL
    from hierarchicalprobabilistic3dhuman_tpu.renderers import (
        TexturedIUVRenderer)
    from hierarchicalprobabilistic3dhuman_tpu.utils.cam_utils import (
        perspective_project)
    from hierarchicalprobabilistic3dhuman_tpu.utils.image_utils import (
        batch_add_rgb_background, bbox_from_mask)
    from hierarchicalprobabilistic3dhuman_tpu.utils.label_conversions import (
        ALL_JOINTS_TO_COCO_MAP)
    from hierarchicalprobabilistic3dhuman_tpu.utils.rotation_utils import (
        batch_rodrigues, aa_rotate_translate_points)

    cfg = get_pose_shape_cfg_defaults()
    focal = cfg.TRAIN.SYNTH_DATA.FOCAL_LENGTH
    smpl = SMPL.synthetic()
    renderer = TexturedIUVRenderer(
        img_wh=FRAME, projection_type="perspective",
        perspective_focal_length=focal, render_rgb=True)
    coco_map = jnp.asarray(ALL_JOINTS_TO_COCO_MAP)
    x_axis = jnp.asarray([1.0, 0.0, 0.0])
    zero_t = jnp.zeros(3)
    TEXTURE_BANK = jnp.asarray(_texture_bank())

    @jax.jit
    def gen(key):
        """-> scenes uint8 (B, 3, F, F), joints2d (B, 17, 2) xy px,
        boxes (B, 4) xyxy, all in frame coordinates."""
        B = BATCH
        keys = jax.random.split(key, 8)
        pose_aa = jax.random.normal(keys[0], (B, 24, 3)) * 0.35
        betas = jax.random.normal(keys[1], (B, 10))
        # Camera: z controls subject scale (~300*1.8/z px body height:
        # z in [1.3, 3.8] -> ~0.28..0.83 of the 512 frame), xy moves the
        # subject around the frame (scaled by z so the px offset stays
        # bounded; some edge clipping is intentional — real uncropped
        # photos have it).
        z = jax.random.uniform(keys[2], (B,), minval=1.3, maxval=3.8)
        xo = jax.random.uniform(keys[3], (B,), minval=-0.22, maxval=0.22) * z
        yo = (jax.random.uniform(keys[4], (B,), minval=-0.18, maxval=0.18)
              * z - 0.2)
        cam_t = jnp.stack([xo, yo, z], axis=1)

        rotmats = batch_rodrigues(pose_aa.reshape(B * 24, 3)) \
            .reshape(B, 24, 3, 3)
        Rx = batch_rodrigues((x_axis * np.pi)[None])[0]
        out = smpl(body_pose=rotmats[:, 1:],
                   global_orient=(rotmats[:, 0] @ Rx)[:, None],
                   betas=betas, pose2rot=False)

        verts_render = aa_rotate_translate_points(out["vertices"], x_axis,
                                                  np.pi, zero_t)
        joints_coco = aa_rotate_translate_points(out["joints"][:, coco_map],
                                                 x_axis, np.pi, zero_t)
        joints2d = perspective_project(joints_coco, None, cam_t,
                                       focal_length=focal, img_wh=FRAME)

        # Textures from a FIXED bank (module-level, seeded once): per-scene
        # iid noise gave body parts no stable appearance across scenes, so
        # the smoke-trained net could only use silhouette shape and its
        # heatmap peaks stayed too diffuse to clear any confidence
        # threshold (first recorded run: det rate 0.00). Real keypoint
        # models learn stable appearance statistics (skin, clothing); a
        # reused texture bank is the synthetic analog.
        texture = TEXTURE_BANK[
            jax.random.randint(keys[5], (B,), 0, TEXTURE_BANK.shape[0])]
        bg_small = jax.random.uniform(keys[6], (B, 3, 16, 16))
        bg = jnp.broadcast_to(
            bg_small[:, :, :, None, :, None],
            (B, 3, 16, FRAME // 16, 16, FRAME // 16)) \
            .reshape(B, 3, FRAME, FRAME)

        render = renderer(verts_render, textures=texture, cam_t=cam_t)
        seg = render["iuv_images"][..., 0]                 # (B, F, F) >0 body
        rgb = jnp.transpose(render["rgb_images"], (0, 3, 1, 2))
        rgb = batch_add_rgb_background(bg, rgb, seg)

        box_rc = bbox_from_mask(seg > 0)     # (B, 4) [rmin, cmin, rmax, cmax]
        boxes = jnp.stack([box_rc[:, 1], box_rc[:, 0],
                           box_rc[:, 3], box_rc[:, 2]], axis=1)
        scenes = jnp.clip(jnp.round(rgb * 255.0), 0, 255).astype(jnp.uint8)
        return scenes, joints2d, boxes

    return gen


def build_multi_scene_generator():
    """2-person composites for the multi-person bootstrap detector
    (round-4 VERDICT next #7): two independently posed/shaped/textured
    bodies rendered into ONE frame, person A placed left of centre and B
    right (60-190 px apart at focal 300 — from clearly separated down to
    abutting/partially overlapping), B compositing in front of A.

    -> scenes uint8 (B, 3, F, F), boxes_a (B, 4) xyxy, boxes_b (B, 4).
    """
    import jax
    import jax.numpy as jnp

    from hierarchicalprobabilistic3dhuman_tpu.configs import (
        get_pose_shape_cfg_defaults)
    from hierarchicalprobabilistic3dhuman_tpu.models.smpl import SMPL
    from hierarchicalprobabilistic3dhuman_tpu.renderers import (
        TexturedIUVRenderer)
    from hierarchicalprobabilistic3dhuman_tpu.utils.image_utils import (
        batch_add_rgb_background, bbox_from_mask)
    from hierarchicalprobabilistic3dhuman_tpu.utils.rotation_utils import (
        batch_rodrigues, aa_rotate_translate_points)

    cfg = get_pose_shape_cfg_defaults()
    focal = cfg.TRAIN.SYNTH_DATA.FOCAL_LENGTH
    smpl = SMPL.synthetic()
    renderer = TexturedIUVRenderer(
        img_wh=FRAME, projection_type="perspective",
        perspective_focal_length=focal, render_rgb=True)
    x_axis = jnp.asarray([1.0, 0.0, 0.0])
    zero_t = jnp.zeros(3)
    Rx = batch_rodrigues((x_axis * np.pi)[None])[0]
    TEXTURE_BANK = jnp.asarray(_texture_bank())

    def render_person(keys, side):
        B = BATCH
        pose_aa = jax.random.normal(keys[0], (B, 24, 3)) * 0.35
        betas = jax.random.normal(keys[1], (B, 10))
        z = jax.random.uniform(keys[2], (B,), minval=1.7, maxval=3.2)
        xo = jax.random.uniform(keys[3], (B,), minval=0.10,
                                maxval=0.32) * side * z
        yo = (jax.random.uniform(keys[4], (B,), minval=-0.12, maxval=0.12)
              * z - 0.2)
        cam_t = jnp.stack([xo, yo, z], axis=1)
        rotmats = batch_rodrigues(pose_aa.reshape(B * 24, 3)) \
            .reshape(B, 24, 3, 3)
        out = smpl(body_pose=rotmats[:, 1:],
                   global_orient=(rotmats[:, 0] @ Rx)[:, None],
                   betas=betas, pose2rot=False)
        verts = aa_rotate_translate_points(out["vertices"], x_axis,
                                           np.pi, zero_t)
        texture = TEXTURE_BANK[
            jax.random.randint(keys[5], (B,), 0, TEXTURE_BANK.shape[0])]
        render = renderer(verts, textures=texture, cam_t=cam_t)
        seg = render["iuv_images"][..., 0]               # (B, F, F) >0 body
        rgb = jnp.transpose(render["rgb_images"], (0, 3, 1, 2))
        box_rc = bbox_from_mask(seg > 0)
        boxes = jnp.stack([box_rc[:, 1], box_rc[:, 0],
                           box_rc[:, 3], box_rc[:, 2]], axis=1)
        return rgb, seg, boxes

    @jax.jit
    def gen2(key):
        B = BATCH
        keys = jax.random.split(key, 13)
        rgb_a, seg_a, box_a = render_person(keys[0:6], side=-1.0)
        rgb_b, seg_b, box_b = render_person(keys[6:12], side=+1.0)
        bg_small = jax.random.uniform(keys[12], (B, 3, 16, 16))
        bg = jnp.broadcast_to(
            bg_small[:, :, :, None, :, None],
            (B, 3, 16, FRAME // 16, 16, FRAME // 16)) \
            .reshape(B, 3, FRAME, FRAME)
        rgb = batch_add_rgb_background(bg, rgb_a, seg_a)
        rgb = batch_add_rgb_background(rgb, rgb_b, seg_b)  # B in front
        scenes = jnp.clip(jnp.round(rgb * 255.0), 0, 255).astype(jnp.uint8)
        return scenes, box_a, box_b

    return gen2


def make_reduced_hrnet():
    from hierarchicalprobabilistic3dhuman_tpu.models.hrnet import (
        PoseHighResolutionNet)
    return PoseHighResolutionNet(num_joints=17, width=16,
                                 stage_modules=(1, 2, 1))


def train_reduced_hrnet(scenes, joints2d, boxes, steps, seed=0):
    """Smoke-train on random-looseness crops; returns trained variables."""
    import jax
    import jax.numpy as jnp
    import optax

    from hierarchicalprobabilistic3dhuman_tpu.configs import (
        get_pose2d_hrnet_cfg_defaults)
    from hierarchicalprobabilistic3dhuman_tpu.predict.predict_hrnet import (
        IMAGENET_MEAN, IMAGENET_STD)
    from hierarchicalprobabilistic3dhuman_tpu.utils.image_utils import (
        batch_crop_affine)

    hrnet_cfg = get_pose2d_hrnet_cfg_defaults()
    in_w, in_h = hrnet_cfg.MODEL.IMAGE_SIZE        # (288, 384)
    hm_w, hm_h = hrnet_cfg.MODEL.HEATMAP_SIZE      # (72, 96)
    stride = in_w / float(hm_w)                    # 4
    mean = jnp.asarray(IMAGENET_MEAN)[:, None, None]
    std = jnp.asarray(IMAGENET_STD)[:, None, None]

    model = make_reduced_hrnet()
    variables = model.init(jax.random.PRNGKey(seed),
                           jnp.zeros((1, 3, in_h, in_w)), train=True)
    params = variables["params"]
    batch_stats = variables["batch_stats"]
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)

    N = scenes.shape[0]
    scenes = jax.device_put(scenes)
    joints2d = jax.device_put(joints2d)
    boxes = jax.device_put(boxes)

    def heatmap_targets(j_crop):
        """(B, 17, 2) crop px -> (B, 17, hm_h, hm_w) gaussians (std 2 hm px),
        zeroed for out-of-crop joints."""
        jx = j_crop[..., 0] / stride
        jy = j_crop[..., 1] / stride
        xs = jnp.arange(hm_w, dtype=jnp.float32)
        ys = jnp.arange(hm_h, dtype=jnp.float32)
        d2 = ((xs[None, None, None, :] - jx[..., None, None]) ** 2
              + (ys[None, None, :, None] - jy[..., None, None]) ** 2)
        hm = jnp.exp(-d2 / (2.0 * 2.0 ** 2))
        vis = ((jx >= 0) & (jx < hm_w) & (jy >= 0) & (jy < hm_h))
        return hm * vis[..., None, None].astype(jnp.float32)

    def sample_batch(key):
        keys = jax.random.split(key, 4)
        idx = jax.random.randint(keys[0], (BATCH,), 0, N)
        rgb = scenes[idx].astype(jnp.float32) / 255.0
        bx = boxes[idx]
        j2d = joints2d[idx]
        ch = bx[:, 3] - bx[:, 1]
        cw = bx[:, 2] - bx[:, 0]
        base = jnp.maximum(ch, cw * (in_h / in_w))
        # Looseness from near-tight to 3.2x: the bootstrap's pass 1 sees the
        # whole frame (loose), pass 2 a margined tight box.
        lam = jnp.exp(jax.random.uniform(keys[1], (BATCH,),
                                         minval=np.log(1.1),
                                         maxval=np.log(3.2)))
        jit_c = jax.random.uniform(keys[2], (BATCH, 2), minval=-0.15,
                                   maxval=0.15) * base[:, None]
        centres = jnp.stack([(bx[:, 1] + bx[:, 3]) * 0.5,
                             (bx[:, 0] + bx[:, 2]) * 0.5], axis=1) + jit_c
        heights = base * lam
        widths = heights * (in_w / in_h)
        crop = batch_crop_affine((in_w, in_h), rgb=rgb, joints2D=j2d,
                                 bbox_centres=centres, bbox_heights=heights,
                                 bbox_widths=widths, orig_scale_factor=1.0)
        x = (crop["rgb"] - mean) / std
        return x, heatmap_targets(crop["joints2D"])

    def loss_fn(params, batch_stats, key):
        x, targets = sample_batch(key)
        pred, updates = model.apply(
            {"params": params, "batch_stats": batch_stats}, x, train=True,
            mutable=["batch_stats"])
        # POSITIVE-WEIGHTED MSE: a gaussian peak (std 2) covers ~0.2% of the
        # 72x96 heatmap, so plain MSE's optimum within reach of a few
        # thousand smoke-train steps is the all-zeros map (its loss is
        # sum(target^2)/N = pi*std^2*17/(17*6912) ~ 0.0018 — EXACTLY where
        # the first recorded run plateaued, with peak amplitudes ~0.09 that
        # no threshold survives). Weighting the peak region 40x makes the
        # peak/background gradient ratio ~12:1 instead of ~1:3.4; full
        # HRNet training (170k steps) escapes the collapse by sheer step
        # count, a 3-6k-step smoke train needs the reweighting.
        w = 1.0 + 40.0 * targets
        loss = jnp.mean(w * (pred - targets) ** 2)
        # Diagnostic: mean over (image, visible joint) of the predicted
        # heatmap max — collapse shows up as ~0.0x, healthy peaks ~0.5+.
        vis = targets.max(axis=(-2, -1)) > 0.5
        peak = ((pred.max(axis=(-2, -1)) * vis).sum()
                / jnp.maximum(vis.sum(), 1))
        return loss, (updates["batch_stats"], peak)

    # Chunked device program: ONE tunnel-attached TPU execution must stay
    # short (a single 3000-step fori_loop program ran for minutes with no
    # host contact and the axon worker killed it — "TPU worker process
    # crashed or restarted"). 100-step segments sync with the host between
    # executions; the jit compiles once (segment length is static).
    SEG = 100

    @jax.jit
    def run_segment(params, batch_stats, opt_state, key, base):
        def body(i, carry):
            params, batch_stats, opt_state, loss0, peak0 = carry
            k = jax.random.fold_in(key, base + i)
            (loss, (new_stats, peak)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params, batch_stats, k)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, new_stats, opt_state, loss, peak
        return jax.lax.fori_loop(0, SEG, body,
                                 (params, batch_stats, opt_state,
                                  jnp.float32(0), jnp.float32(0)))

    t0 = time.perf_counter()
    key = jax.random.PRNGKey(seed + 1)
    last_loss, last_peak = float("nan"), float("nan")
    for base in range(0, steps, SEG):
        params, batch_stats, opt_state, last_loss, last_peak = run_segment(
            params, batch_stats, opt_state, key, jnp.int32(base))
        last_loss = float(last_loss)      # host sync per segment
        last_peak = float(last_peak)
        if base % 500 == 0:
            print(f"[train] step {base + SEG}/{steps} "
                  f"weighted MSE {last_loss:.5f} peak {last_peak:.3f} "
                  f"({time.perf_counter() - t0:.0f}s)", flush=True)
    dt = time.perf_counter() - t0
    print(f"[train] {steps} steps in {dt:.1f}s "
          f"({steps / dt:.1f} steps/s), final weighted MSE {last_loss:.5f} "
          f"peak {last_peak:.3f}", flush=True)
    return {"params": params, "batch_stats": batch_stats}, last_loss


WEIGHTS_PATH = os.path.join(_REPO, "benchmarks", "_detval_weights.npz")


def save_trained(trained):
    from flax.traverse_util import flatten_dict
    flat = flatten_dict(trained)
    np.savez(WEIGHTS_PATH,
             **{"/".join(k): np.asarray(v) for k, v in flat.items()})
    print(f"[weights] saved {WEIGHTS_PATH}", flush=True)


def load_trained():
    from flax.traverse_util import unflatten_dict
    with np.load(WEIGHTS_PATH) as z:
        flat = {tuple(k.split("/")): z[k] for k in z.files}
    return unflatten_dict(flat)


def whole_frame_conf_stats(trained_vars, gen, n_images, seed=1000):
    """Diagnostic: the min_visible-th order statistic of whole-frame peak
    confidences — the confidence threshold at which detection would first
    succeed on each image."""
    import jax
    import jax.numpy as jnp

    from hierarchicalprobabilistic3dhuman_tpu.configs import (
        get_pose2d_hrnet_cfg_defaults)
    from hierarchicalprobabilistic3dhuman_tpu.predict.keypoint_detector import (
        _build_stage)

    hrnet_cfg = get_pose2d_hrnet_cfg_defaults()
    model = make_reduced_hrnet()

    def hrnet_apply(variables, images):
        return model.apply(variables, images, train=False)

    stage, _, _, _, _ = _build_stage(hrnet_apply, hrnet_cfg, trained_vars)
    centre = jnp.asarray([FRAME / 2.0, FRAME / 2.0], jnp.float32)
    hw = jnp.asarray(float(FRAME), jnp.float32)
    sixth, top = [], []
    n_batches = -(-n_images // BATCH)
    done = 0
    for b in range(n_batches):
        scenes, _, _ = gen(jax.random.PRNGKey(seed + b))
        scenes = np.asarray(scenes)
        for i in range(scenes.shape[0]):
            if done >= n_images:
                break
            _, confs = stage(trained_vars,
                             jnp.asarray(scenes[i].astype(np.float32) / 255.0),
                             centre, hw, hw)
            c = np.sort(np.asarray(confs))[::-1]
            top.append(float(c[0]))
            sixth.append(float(c[5]))
            done += 1
    return (float(np.median(top)), float(np.median(sixth)),
            float(np.percentile(sixth, 10)))


def iou_xyxy(a, b):
    ix0, iy0 = max(a[0], b[0]), max(a[1], b[1])
    ix1, iy1 = min(a[2], b[2]), min(a[3], b[3])
    iw, ih = max(0.0, ix1 - ix0), max(0.0, iy1 - iy0)
    inter = iw * ih
    ua = ((a[2] - a[0]) * (a[3] - a[1])
          + (b[2] - b[0]) * (b[3] - b[1]) - inter)
    return inter / ua if ua > 0 else 0.0


def evaluate_detector(trained_vars, gen, n_eval, seed=1000):
    import jax
    import jax.numpy as jnp

    from hierarchicalprobabilistic3dhuman_tpu.configs import (
        get_pose2d_hrnet_cfg_defaults)
    from hierarchicalprobabilistic3dhuman_tpu.predict.keypoint_detector import (
        make_keypoint_bootstrap_detector)

    hrnet_cfg = get_pose2d_hrnet_cfg_defaults()
    model = make_reduced_hrnet()

    def hrnet_apply(variables, images):
        return model.apply(variables, images, train=False)

    detect = make_keypoint_bootstrap_detector(
        hrnet_apply, hrnet_cfg, hrnet_vars=trained_vars,
        conf_threshold=0.3, min_visible=6, n_iters=2)

    rows = []
    n_batches = -(-n_eval // BATCH)
    for b in range(n_batches):
        scenes, _, boxes = gen(jax.random.PRNGKey(seed + b))
        scenes = np.asarray(scenes)
        boxes = np.asarray(boxes)
        for i in range(scenes.shape[0]):
            if len(rows) >= n_eval:
                break
            gt = boxes[i]
            if gt[3] - gt[1] < 40:            # subject fully clipped away
                continue
            out = detect(jnp.asarray(scenes[i].astype(np.float32) / 255.0))
            scale = (gt[3] - gt[1]) / FRAME
            if out["boxes"].shape[0] == 0:
                rows.append((scale, 0.0, False))
                continue
            rows.append((scale, iou_xyxy(out["boxes"][0], gt), True))
    return rows


def evaluate_multi_detector(trained_vars, gen2, n_scenes, seed=5000):
    """2-person composites -> greedy IoU matching of predicted boxes to the
    two GT boxes. Returns rows (sep_px, iou_a, iou_b, n_pred)."""
    import jax
    import jax.numpy as jnp

    from hierarchicalprobabilistic3dhuman_tpu.configs import (
        get_pose2d_hrnet_cfg_defaults)
    from hierarchicalprobabilistic3dhuman_tpu.predict.keypoint_detector import (
        make_multi_person_bootstrap_detector)

    hrnet_cfg = get_pose2d_hrnet_cfg_defaults()
    model = make_reduced_hrnet()

    def hrnet_apply(variables, images):
        return model.apply(variables, images, train=False)

    detect = make_multi_person_bootstrap_detector(
        hrnet_apply, hrnet_cfg, hrnet_vars=trained_vars,
        conf_threshold=0.3, min_visible=6, n_iters=2, max_people=4)

    rows = []
    n_batches = -(-n_scenes // BATCH)
    for b in range(n_batches):
        scenes, box_a, box_b = gen2(jax.random.PRNGKey(seed + b))
        scenes = np.asarray(scenes)
        box_a, box_b = np.asarray(box_a), np.asarray(box_b)
        for i in range(scenes.shape[0]):
            if len(rows) >= n_scenes:
                break
            gts = [box_a[i], box_b[i]]
            if any(g[3] - g[1] < 40 for g in gts):   # a subject clipped away
                continue
            out = detect(jnp.asarray(scenes[i].astype(np.float32) / 255.0))
            preds = [tuple(bx) for bx in out["boxes"]]
            # Greedy best-IoU matching, each pred used at most once.
            ious = []
            for g in gts:
                best_j, best = -1, 0.0
                for j, p in enumerate(preds):
                    v = iou_xyxy(p, g)
                    if v > best:
                        best_j, best = j, v
                if best_j >= 0:
                    preds.pop(best_j)
                ious.append(best)
            sep = abs((box_a[i, 0] + box_a[i, 2]) / 2
                      - (box_b[i, 0] + box_b[i, 2]) / 2)
            rows.append((sep, ious[0], ious[1], out["boxes"].shape[0]))
    return rows


def main():
    argv = [a for a in sys.argv[1:] if a != "--eval-only"]
    eval_only = "--eval-only" in sys.argv[1:]
    steps = int(argv[0]) if len(argv) > 0 else 3000
    n_eval = int(argv[1]) if len(argv) > 1 else 96
    n_multi = int(argv[2]) if len(argv) > 2 else 48

    import jax
    from benchmarks import _scratch_cache
    _scratch_cache.enable()

    print(f"backend: {jax.default_backend()} ({jax.devices()[0]})",
          flush=True)
    gen = build_scene_generator()

    if eval_only and os.path.exists(WEIGHTS_PATH):
        print(f"[weights] loading {WEIGHTS_PATH} (--eval-only)", flush=True)
        trained = load_trained()
        final_loss = float("nan")
    else:
        scene_cache = os.path.join("/tmp", "detval_scenes.npz")
        if os.path.exists(scene_cache):
            print(f"[scenes] loading cached {scene_cache}", flush=True)
            with np.load(scene_cache) as z:
                scenes, joints2d, boxes = z["s"], z["j"], z["b"]
        else:
            print(f"[scenes] generating {TRAIN_SCENES} training scenes at "
                  f"{FRAME}^2...", flush=True)
            t0 = time.perf_counter()
            sc, j2, bx = [], [], []
            for b in range(TRAIN_SCENES // BATCH):
                s, j, x = gen(jax.random.PRNGKey(b))
                sc.append(np.asarray(s))
                j2.append(np.asarray(j))
                bx.append(np.asarray(x))
            scenes = np.concatenate(sc)
            joints2d = np.concatenate(j2)
            boxes = np.concatenate(bx)
            print(f"[scenes] {scenes.shape[0]} scenes in "
                  f"{time.perf_counter() - t0:.1f}s; subject height "
                  f"{np.median((boxes[:, 3] - boxes[:, 1]) / FRAME):.2f} "
                  "median frame-fraction", flush=True)
            np.savez(scene_cache, s=scenes, j=joints2d, b=boxes)

        trained, final_loss = train_reduced_hrnet(scenes, joints2d, boxes,
                                                  steps)
        save_trained(trained)

    top_med, sixth_med, sixth_p10 = whole_frame_conf_stats(
        trained, gen, min(n_eval, 32))
    print(f"[confs] whole-frame peak confidence: median max {top_med:.3f}, "
          f"median 6th-highest {sixth_med:.3f} (p10 {sixth_p10:.3f})",
          flush=True)

    rows = evaluate_detector(trained, gen, n_eval)
    scales = np.array([r[0] for r in rows])
    ious = np.array([r[1] for r in rows])
    det = np.array([r[2] for r in rows])

    buckets = [("small  (<0.45 frame)", scales < 0.45),
               ("medium (0.45-0.65)", (scales >= 0.45) & (scales < 0.65)),
               ("large  (>=0.65)", scales >= 0.65)]
    lines = [
        f"# python benchmarks/detector_validation.py {steps} {n_eval} — "
        f"recorded {time.strftime('%Y-%m-%d')}",
        f"backend: {jax.default_backend()} ({jax.devices()[0]})",
        f"reduced HRNet width=16 modules=(1,2,1), {steps} smoke-train "
        f"steps, final weighted heatmap MSE {final_loss:.5f}",
        f"whole-frame peak confidence: median max {top_med:.3f}, median "
        f"6th-highest {sixth_med:.3f} (p10 {sixth_p10:.3f}); detector runs "
        "its shipped amplitude-adaptive threshold "
        "(keypoint_detector._effective_threshold)",
        f"eval: {len(rows)} held-out synthetic 512^2 scenes, GT = rendered "
        "silhouette-mask box",
        "",
        f"{'bucket':<22} {'n':>4} {'median IoU':>11} {'mean IoU':>9} "
        f"{'IoU>=0.7':>9} {'det rate':>9}",
    ]
    for name, m in [("ALL", np.ones_like(det, bool))] + buckets:
        if not m.any():
            continue
        lines.append(
            f"{name:<22} {int(m.sum()):>4} {np.median(ious[m]):>11.3f} "
            f"{ious[m].mean():>9.3f} {(ious[m] >= 0.7).mean():>9.2f} "
            f"{det[m].mean():>9.2f}")
    med = float(np.median(ious))
    verdict = "PASS" if med >= 0.7 else "BELOW-TARGET"
    lines.append("")
    lines.append(f"[{verdict}] overall median IoU {med:.3f} "
                 "(round-4 target: >= 0.7 single-person regime)")

    if n_multi > 0:
        print(f"[multi] evaluating {n_multi} 2-person composites...",
              flush=True)
        gen2 = build_multi_scene_generator()
        mrows = evaluate_multi_detector(trained, gen2, n_multi)
        seps = np.array([r[0] for r in mrows])
        iou_ab = np.array([[r[1], r[2]] for r in mrows])
        npred = np.array([r[3] for r in mrows])
        both = (iou_ab >= 0.5).all(axis=1)
        mbuckets = [("separated (>=130 px)", seps >= 130),
                    ("close     (<130 px)", seps < 130)]
        lines += [
            "",
            f"multi-person: {len(mrows)} 2-person composites, greedy "
            "best-IoU matching pred->GT",
            f"{'bucket':<22} {'n':>4} {'med IoU':>8} {'both>=0.5':>10} "
            f"{'mean #pred':>11}",
        ]
        for name, m in ([("ALL", np.ones_like(both, bool))] + mbuckets):
            if not m.any():
                continue
            lines.append(
                f"{name:<22} {int(m.sum()):>4} "
                f"{np.median(iou_ab[m]):>8.3f} {both[m].mean():>10.2f} "
                f"{npred[m].mean():>11.2f}")
        mmed = float(np.median(iou_ab))
        mver = "PASS" if mmed >= 0.5 else "BELOW-TARGET"
        lines.append(f"[{mver}] multi-person median IoU {mmed:.3f} "
                     "(round-4 next #7: N-box output with measured "
                     "synthetic IoU)")
    report = "\n".join(lines)
    print(report, flush=True)
    out_path = os.path.join(_REPO, "benchmarks",
                            "DETECTOR_VALIDATION_OUTPUT.txt")
    with open(out_path, "w") as f:
        f.write(report + "\n")
    print(f"[written] {out_path}", flush=True)


if __name__ == "__main__":
    main()
