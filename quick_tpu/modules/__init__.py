from quick_tpu.modules.cache import KVCache
from quick_tpu.modules.linear import Linear, QuantLinear, concat_linears
from quick_tpu.modules.paged_cache import PageAllocator, PagedKVCache

__all__ = [
    "KVCache", "Linear", "QuantLinear", "concat_linears",
    "PagedKVCache", "PageAllocator",
]
