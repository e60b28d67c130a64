"""Checkpoint save/load with the reference's logical contents.

The reference saves torch dicts {epoch, best_epoch, best_epoch_val_metrics,
model_state_dict, best_model_state_dict, optimiser_state_dict} to
saved_models/epoch_{N:03d}.tar every EPOCHS_PER_SAVE epochs
(train driver :388-399). Here the same logical structure is stored as
msgpack-serialised pytrees (flax.serialization), with the same file-naming
scheme so experiment directories look identical.
"""

import os
import pickle

import numpy as np
import jax
from flax import serialization


def _to_host(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_variables(path, variables):
    """Serialise a pytree of arrays (e.g. flax variables) to one file."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        f.write(serialization.msgpack_serialize(_to_host(variables)))


def load_variables(path):
    with open(path, "rb") as f:
        return serialization.msgpack_restore(f.read())


def checkpoint_path(model_save_dir, epoch):
    """Same naming scheme as the reference: epoch_{N:03d}.tar (run_train.py:47)."""
    return os.path.join(model_save_dir, f"epoch_{epoch:03d}.tar")


def save_training_checkpoint(path, *, epoch, best_epoch, best_epoch_val_metrics,
                             model_variables, best_model_variables, opt_state):
    """Full training checkpoint with the reference's keys (train driver :388-399)."""
    ckpt = {
        "epoch": epoch,
        "best_epoch": best_epoch,
        "best_epoch_val_metrics": best_epoch_val_metrics,
        "model_state_dict": _to_host(model_variables),
        "best_model_state_dict": _to_host(best_model_variables),
        "optimiser_state_dict": _to_host(opt_state),
    }
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        pickle.dump(ckpt, f, protocol=pickle.HIGHEST_PROTOCOL)


def load_training_checkpoint(path):
    with open(path, "rb") as f:
        return pickle.load(f)


def load_training_info_from_checkpoint(checkpoint, save_val_metrics):
    """Resume bookkeeping (reference utils/checkpoint_utils.py:4-26):
    start epoch, best epoch, best model weights, best metric values —
    reconciling changed save-metric sets with inf fill."""
    current_epoch = checkpoint["epoch"] + 1
    best_epoch = checkpoint["best_epoch"]
    best_model_wts = checkpoint["best_model_state_dict"]
    best_epoch_val_metrics = {}
    for metric in save_val_metrics:
        if metric in checkpoint["best_epoch_val_metrics"]:
            best_epoch_val_metrics[metric] = checkpoint["best_epoch_val_metrics"][metric]
        else:
            print(f"{metric} not in best_epoch_val_metrics — resetting to inf.")
            best_epoch_val_metrics[metric] = np.inf
    return current_epoch, best_epoch, best_model_wts, best_epoch_val_metrics
