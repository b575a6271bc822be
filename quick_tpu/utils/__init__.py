from quick_tpu.utils.checkpoint import (
    load_autoawq,
    load_hf_float,
    load_quantized,
    save_quantized,
)

__all__ = [
    "save_quantized",
    "load_quantized",
    "load_hf_float",
    "load_autoawq",
]
