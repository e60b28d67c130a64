"""Combined training loss: MF pose NLL + Gaussian shape NLL + MSE terms.

JAX equivalent of the reference's PoseMFShapeGaussianLoss
(losses/matrix_fisher_loss.py:231-301): weighted sum of
  - matrix-Fisher NLL over the 23 body-joint rotations,
  - diagonal-Gaussian NLL over SMPL betas,
  - MSE over visible 2D joints (targets normalised to [-1, 1]),
  - MSE over global rotation matrices,
  - optional MSE over vertices and 3D joints (stage 2).

The visible-joint MSE uses masked averaging instead of boolean gather so the
whole loss is fixed-shape and jit-safe.
"""

import math

import jax.numpy as jnp

from hierarchicalprobabilistic3dhuman_tpu.ops.matrix_fisher import matrix_fisher_nll

_LOG_2PI = math.log(2.0 * math.pi)


def gaussian_nll(mean, log_std, target):
    """Elementwise diagonal-Gaussian negative log likelihood.

    Matches torch.distributions.Normal(...).log_prob with scale = exp(log_std).
    :return: same shape as target
    """
    var = jnp.exp(2.0 * log_std)
    return 0.5 * ((target - mean) ** 2 / var + 2.0 * log_std + _LOG_2PI)


def _reduce(x, reduction):
    if reduction == "mean":
        return jnp.mean(x)
    if reduction == "sum":
        return jnp.sum(x)
    raise ValueError(f"Unsupported reduction {reduction}")


class PoseMFShapeGaussianLoss:
    """Stateless callable configured by a LOSS.STAGE* config node.

    :param loss_config: CfgNode with REDUCTION, MF_OVERREG, WEIGHTS.{POSE,
        SHAPE, JOINTS2D, GLOB_ROTMATS, VERTS3D, JOINTS3D}
    :param img_wh: proxy representation size (for [-1,1] joint normalisation)
    """

    def __init__(self, loss_config, img_wh):
        self.cfg = loss_config
        self.img_wh = img_wh

    def __call__(self, target_dict, pred_dict):
        """
        target_dict keys: pose_params_rotmats (B, 23, 3, 3), shape_params (B, nb),
            joints2D (B, K, 2) pixel coords, joints2D_vis (B, K) bool,
            glob_rotmats (B, 3, 3), verts (B, V, 3), joints3D (B, J, 3).
        pred_dict keys: pose_params_{F,U,S,V}, shape_mean, shape_log_std,
            joints2D (B, num_sets, K, 2) in [-1, 1] (num_sets >= 1: mode [+
            samples]), glob_rotmats, verts, joints3D.
        :return: (total_loss scalar, dict of unweighted per-term scalars)
        """
        reduction = self.cfg.REDUCTION

        pose_nll = matrix_fisher_nll(pred_dict["pose_params_F"],
                                     pred_dict["pose_params_U"],
                                     pred_dict["pose_params_S"],
                                     pred_dict["pose_params_V"],
                                     target_dict["pose_params_rotmats"],
                                     overreg=self.cfg.MF_OVERREG)
        pose_nll = _reduce(pose_nll, reduction)

        shape_nll = gaussian_nll(pred_dict["shape_mean"], pred_dict["shape_log_std"],
                                 target_dict["shape_params"]).sum(axis=1)
        shape_nll = _reduce(shape_nll, reduction)

        # Joints2D masked MSE over visible joints, broadcast over sample sets.
        target_j2d = (2.0 * target_dict["joints2D"]) / self.img_wh - 1.0  # (B, K, 2)
        pred_j2d = pred_dict["joints2D"]                                  # (B, S, K, 2)
        vis = target_dict["joints2D_vis"].astype(pred_j2d.dtype)          # (B, K)
        sq = (pred_j2d - target_j2d[:, None]) ** 2                        # (B, S, K, 2)
        # where-masking, not multiplication: an invisible joint's target may
        # be degenerate (huge off-frame projection), and NaN/inf * 0 = NaN
        # would leak into the loss.
        masked = jnp.where(vis[:, None, :, None] > 0, sq, 0.0)
        if reduction == "mean":
            denom = jnp.maximum(jnp.sum(vis) * pred_j2d.shape[1] * 2, 1.0)
            joints2D_loss = jnp.sum(masked) / denom
        else:
            joints2D_loss = jnp.sum(masked)

        glob_loss = _reduce((pred_dict["glob_rotmats"] - target_dict["glob_rotmats"]) ** 2,
                            reduction)
        verts_loss = _reduce((pred_dict["verts"] - target_dict["verts"]) ** 2, reduction)
        joints3D_loss = _reduce((pred_dict["joints3D"] - target_dict["joints3D"]) ** 2,
                                reduction)

        W = self.cfg.WEIGHTS
        total = (pose_nll * W.POSE
                 + shape_nll * W.SHAPE
                 + joints2D_loss * W.JOINTS2D
                 + glob_loss * W.GLOB_ROTMATS
                 + verts_loss * W.VERTS3D
                 + joints3D_loss * W.JOINTS3D)
        terms = {"pose_nll": pose_nll, "shape_nll": shape_nll,
                 "joints2D": joints2D_loss, "glob_rotmats": glob_loss,
                 "verts3D": verts_loss, "joints3D": joints3D_loss}
        return total, terms
