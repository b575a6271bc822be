"""ALiBi positional bias (MPT / Bloom / Baichuan-13B family).

TPU re-design of the reference's ``ALiBi`` module
(quick/awq/modules/fused/attn.py:67-98) which builds a per-head slope table
and a cached bias matrix added to attention scores. Here the slopes are a
static numpy constant folded into the jitted attention; the bias is computed
from the same position indices the causal mask already uses, so no [H, S, S]
buffer is materialized ahead of time.
"""
from __future__ import annotations

import math

import numpy as np


def alibi_slopes(n_heads: int) -> np.ndarray:
    """Per-head ALiBi slopes (the "closest power of two" recipe from the
    ALiBi paper; matches the reference's get_slopes, fused/attn.py:73-87)."""

    def pow2_slopes(n: int) -> list:
        start = 2.0 ** (-(2.0 ** -(math.log2(n) - 3)))
        return [start ** (i + 1) for i in range(n)]

    if math.log2(n_heads).is_integer():
        out = pow2_slopes(n_heads)
    else:
        closest = 2 ** math.floor(math.log2(n_heads))
        out = (
            pow2_slopes(closest)
            + pow2_slopes(2 * closest)[0::2][: n_heads - closest]
        )
    return np.asarray(out, dtype=np.float32)
