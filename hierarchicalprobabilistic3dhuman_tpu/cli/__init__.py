"""Command-line entry points (reference: run_{predict,train,evaluate}.py).

Installed as console scripts by pyproject.toml:

    hp3d-predict   = cli.predict:main
    hp3d-train     = cli.train:main
    hp3d-evaluate  = cli.evaluate:main

The repo-root run_*.py shims keep the reference's `python run_predict.py ...`
invocation working from a source checkout.
"""

from hierarchicalprobabilistic3dhuman_tpu.cli import evaluate, predict, train

__all__ = ["predict", "train", "evaluate"]
