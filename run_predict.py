"""Prediction CLI shim — the implementation lives in
hierarchicalprobabilistic3dhuman_tpu/cli/predict.py (pip console script:
hp3d-predict). This file keeps the reference's invocation working from a
source checkout (reference run_predict.py:92-125):

python run_predict.py --image_dir demo/ --save_dir output/ --cropped_images
"""

from hierarchicalprobabilistic3dhuman_tpu.cli.predict import (  # noqa: F401
    _load_hrnet_variables, _load_predictor_variables, build_parser, main,
    run_predict)

if __name__ == "__main__":
    main()
