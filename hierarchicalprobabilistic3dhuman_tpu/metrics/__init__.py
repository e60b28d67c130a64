from hierarchicalprobabilistic3dhuman_tpu.metrics.eval_metrics_tracker import EvalMetricsTracker
from hierarchicalprobabilistic3dhuman_tpu.metrics.train_loss_and_metrics_tracker import (
    TrainingLossesAndMetricsTracker)

__all__ = ["EvalMetricsTracker", "TrainingLossesAndMetricsTracker"]
