"""quick_tpu — TPU-native W4A16 quantized-inference framework.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of
SqueezeBits/QUICK (AutoAWQ fork): group-wise INT4 AWQ quantization, an
offline weight interleave co-designed with the TPU MXU/VPU layout so
dequantization fuses into the matmul, a fused decoder runtime with paged KV
cache, and mesh parallelism (TP/DP/EP) over ICI.
"""

__version__ = "0.1.0"

from quick_tpu.config import ModelConfig, QuantConfig

__all__ = ["ModelConfig", "QuantConfig", "__version__"]
