"""quick_tpu — TPU-native W4A16 quantized-inference framework.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of
SqueezeBits/QUICK (AutoAWQ fork): group-wise INT4 AWQ quantization, an
offline weight interleave co-designed with the TPU MXU/VPU layout so
dequantization fuses into the matmul, a fused decoder runtime with paged KV
cache, and mesh parallelism (TP/DP/EP) over ICI.
"""

__version__ = "0.1.0"

from quick_tpu.config import ModelConfig, QuantConfig

__all__ = ["ModelConfig", "QuantConfig", "AutoQuickModel", "__version__"]


def __getattr__(name):
    # lazy: AutoQuickModel pulls in the full model stack
    if name == "AutoQuickModel":
        from quick_tpu.models.auto import AutoQuickModel

        return AutoQuickModel
    raise AttributeError(f"module 'quick_tpu' has no attribute {name!r}")
