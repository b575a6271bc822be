from quick_tpu.quantize.numerics import (
    QuantizedTensor,
    dequantize_tensor,
    pseudo_quantize_tensor,
    quantize_tensor,
)
from quick_tpu.quantize.packing import (
    export_awq_gemm,
    gemm_to_exllama,
    import_awq_gemm,
    import_exllama,
    pack_awq_gemm,
    pack_exllama,
    pack_qtpu,
    unpack_awq_gemm,
    unpack_exllama,
    unpack_qtpu,
)

__all__ = [
    "QuantizedTensor",
    "quantize_tensor",
    "dequantize_tensor",
    "pseudo_quantize_tensor",
    "pack_qtpu",
    "unpack_qtpu",
    "pack_awq_gemm",
    "unpack_awq_gemm",
    "import_awq_gemm",
    "export_awq_gemm",
    "pack_exllama",
    "unpack_exllama",
    "gemm_to_exllama",
    "import_exllama",
]
