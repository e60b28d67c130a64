"""Evaluation CLI shim — the implementation lives in
hierarchicalprobabilistic3dhuman_tpu/cli/evaluate.py (pip console script:
hp3d-evaluate). This file keeps the reference's invocation working from a
source checkout (reference run_evaluate.py:97-115):

python run_evaluate.py --dataset ssp3d [--pose_shape_weights ...] [--batch_size 8]
"""

from hierarchicalprobabilistic3dhuman_tpu.cli.evaluate import (  # noqa: F401
    build_parser, main, run_evaluate)

if __name__ == "__main__":
    main()
