from quick_tpu.modules.cache import KVCache
from quick_tpu.modules.linear import Linear, QuantLinear, concat_linears

__all__ = ["KVCache", "Linear", "QuantLinear", "concat_linears"]
