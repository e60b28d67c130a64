from hierarchicalprobabilistic3dhuman_tpu.losses.matrix_fisher_loss import (
    PoseMFShapeGaussianLoss, gaussian_nll)

__all__ = ["PoseMFShapeGaussianLoss", "gaussian_nll"]
