from quick_tpu.ops.quantized_matmul import (
    quantize_activations,
    quantized_matmul,
    quantized_matmul_reference,
)

__all__ = [
    "quantize_activations",
    "quantized_matmul",
    "quantized_matmul_reference",
]
