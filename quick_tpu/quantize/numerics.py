"""Group-wise INT4 quantization numerics (pure JAX).

Semantics match the reference's ``pseudo_quantize_tensor``
(quick/awq/quantize/quantizer.py:46-72): asymmetric min/max quantization per
group of ``group_size`` consecutive input-channel elements, 4-bit grid
[0, 15], zero point = round(-min/scale). Symmetric mode mirrors the
zero_point=False branch (quantizer.py:57-63).

The dequantized "golden" path here is the numerics oracle for the fused
Pallas kernels (analog of the reference's pure-torch ``dequantize_gemm``
fallback, quick/awq/utils/packing_utils.py:82-96).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class QuantizedTensor(NamedTuple):
    """Group-quantized weight, pre-packing.

    For a weight ``w`` of shape [K, N] (K = input channels, reduction dim;
    N = output channels) with ``n_groups = K // group_size``:

    - ``q``:      [K, N] uint8 codes in [0, 2^bits)
    - ``scales``: [n_groups, N] float32
    - ``zeros``:  [n_groups, N] float32 (integer-valued zero points)
    """

    q: jax.Array
    scales: jax.Array
    zeros: jax.Array


def quantize_tensor(
    w: jax.Array,
    group_size: int = 128,
    bits: int = 4,
    zero_point: bool = True,
) -> QuantizedTensor:
    """Quantize weight [K, N] group-wise along K.

    Matches reference quantizer.py:46-72 (which operates on [out, in] and
    groups along the last dim; we use [in, out] = [K, N], grouping along K —
    same math, layout chosen for TPU's reduction-major packing).
    """
    K, N = w.shape
    if K % group_size != 0:
        raise ValueError(f"K={K} not divisible by group_size={group_size}")
    ng = K // group_size
    wg = w.astype(jnp.float32).reshape(ng, group_size, N)
    qmax = 2**bits - 1
    if zero_point:
        mx = jnp.max(wg, axis=1)
        mn = jnp.min(wg, axis=1)
        # clamp values match the reference exactly (quantizer.py:57-59):
        # range floor 1e-5, zero point clamped into the code grid (an
        # all-positive group gets z=0, all-negative gets z=qmax)
        scales = jnp.clip((mx - mn), 1e-5, None) / qmax
        zeros = jnp.clip(jnp.round(-mn / scales), 0, qmax)
        q = jnp.clip(jnp.round(wg / scales[:, None, :]) + zeros[:, None, :], 0, qmax)
    else:
        # symmetric: grid [-2^(b-1), 2^(b-1)-1] shifted into unsigned storage
        # (reference quantizer.py:57-63)
        half = 2 ** (bits - 1)
        mxa = jnp.clip(jnp.max(jnp.abs(wg), axis=1), 1e-5, None)
        scales = mxa / (half - 1)
        zeros = jnp.full_like(scales, float(half))
        q = jnp.clip(jnp.round(wg / scales[:, None, :]) + half, 0, qmax)
    return QuantizedTensor(
        q=q.reshape(K, N).astype(jnp.uint8),
        scales=scales.astype(jnp.float32),
        zeros=zeros.astype(jnp.float32),
    )


def dequantize_tensor(qt: QuantizedTensor, group_size: int = 0) -> jax.Array:
    """Golden dequantization: w = (q - z) * s, float32 [K, N].

    ``group_size`` defaults to the one implied by ``qt.scales``' shape —
    passing it explicitly is only needed for disagreement checks.
    """
    K, N = qt.q.shape
    ng = qt.scales.shape[0] if not group_size else K // group_size
    group_size = K // ng
    q = qt.q.astype(jnp.float32).reshape(ng, group_size, N)
    w = (q - qt.zeros[:, None, :]) * qt.scales[:, None, :]
    return w.reshape(K, N)


def pseudo_quantize_tensor(
    w: jax.Array,
    group_size: int = 128,
    bits: int = 4,
    zero_point: bool = True,
) -> jax.Array:
    """Quantize-dequantize round trip (fake quant) used by the AWQ search
    (reference quantizer.py:46-72 returns exactly this when not packing)."""
    return dequantize_tensor(
        quantize_tensor(w, group_size, bits, zero_point), group_size
    ).astype(w.dtype)
