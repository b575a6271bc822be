from quick_tpu.ops.quantized_matmul import (
    quantized_matmul,
    quantized_matmul_reference,
)

__all__ = ["quantized_matmul", "quantized_matmul_reference"]
