from quick_tpu.models.model import (
    ModelParams,
    init_float_params,
    init_quant_params,
    model_forward,
    quantize_params,
)

__all__ = [
    "ModelParams",
    "model_forward",
    "init_float_params",
    "init_quant_params",
    "quantize_params",
]
