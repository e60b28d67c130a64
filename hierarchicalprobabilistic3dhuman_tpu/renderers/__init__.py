from hierarchicalprobabilistic3dhuman_tpu.renderers.textured_iuv_renderer import (
    TexturedIUVRenderer, preprocess_densepose_UV)

__all__ = ["TexturedIUVRenderer", "preprocess_densepose_UV"]
