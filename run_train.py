"""Training CLI shim — the implementation lives in
hierarchicalprobabilistic3dhuman_tpu/cli/train.py (pip console script:
hp3d-train). This file keeps the reference's invocation working from a
source checkout (reference run_train.py:121-140):

python run_train.py -E experiments/exp_001 [-O TRAIN.BATCH_SIZE 8 ...] [-R 20]
"""

from hierarchicalprobabilistic3dhuman_tpu.cli.train import (  # noqa: F401
    build_parser, main, run_train)

if __name__ == "__main__":
    main()
