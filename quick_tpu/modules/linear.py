"""Linear layers: float and W4A16-quantized, as JAX pytrees.

``QuantLinear`` is the TPU re-design of the reference's ``WQLinear_QUICK``
(quick/awq/modules/linear/quick.py:15-171): the packer ``from_float`` is the
analog of ``from_linear`` (quick.py:61-156), but the interleave targets the
MXU/VPU layout (see quick_tpu/quantize/packing.py) instead of ``ldmatrix``
fragments, and no scale/zero duplication is needed. Weights are stored
[K(in), N(out)] — reduction-major, the natural layout for the TPU kernel.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from quick_tpu.ops.quantized_matmul import quantized_matmul
from quick_tpu.quantize.numerics import quantize_tensor
from quick_tpu.quantize.packing import pack_qtpu


def _a8_enabled() -> bool:
    """QUICK_TPU_A8=1 routes every quantized linear with >8 flattened rows
    through the W4A8 kernel (dynamic per-row INT8 activations, 2x MXU rate
    — see ops/quantized_matmul.py). Read at trace time: set it before the
    first forward. Decode at small batch keeps W4A16 via the M-gate."""
    import os

    return os.environ.get("QUICK_TPU_A8", "0") == "1"


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class Linear:
    """Plain (non-quantized) linear, weight [K, N]."""

    weight: jax.Array
    bias: Optional[jax.Array] = None

    def __call__(self, x: jax.Array) -> jax.Array:
        y = jnp.dot(x, self.weight.astype(x.dtype))
        if self.bias is not None:
            y = y + self.bias.astype(y.dtype)
        return y

    @property
    def in_features(self) -> int:
        return self.weight.shape[0]

    @property
    def out_features(self) -> int:
        return self.weight.shape[1]


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class QuantLinear:
    """W4A16 linear in the QTPU packed layout.

    qweight: int32 [K//8, N]; scales / zeros_x_scales: f32 [K//G, N].
    """

    qweight: jax.Array
    scales: jax.Array
    zeros_x_scales: jax.Array
    bias: Optional[jax.Array] = None
    group_size: int = dataclasses.field(default=128, metadata={"static": True})

    def __call__(
        self, x: jax.Array, fuse_norm: Optional[tuple] = None,
        fuse_glu: bool = False,
    ) -> jax.Array:
        # fuse_norm = (rms_weight, eps): x is RAW; the RMSNorm runs inside
        # the decode kernel's prologue (ops/quantized_matmul.py) — or is
        # applied first on routes that cannot fuse. Numerics identical.
        # fuse_glu: x is the RAW [., 2K] fused gate_up output; silu(gate) *
        # up runs inside the decode kernel's prologue likewise.
        return quantized_matmul(
            x, self.qweight, self.scales, self.zeros_x_scales,
            group_size=self.group_size, bias=self.bias, a8=_a8_enabled(),
            fuse_norm=fuse_norm, fuse_glu=fuse_glu,
        )

    @property
    def in_features(self) -> int:
        return self.qweight.shape[0] * 8

    @property
    def out_features(self) -> int:
        return self.qweight.shape[1]

    @classmethod
    def from_float(
        cls,
        weight: jax.Array,  # [K, N]
        bias: Optional[jax.Array] = None,
        group_size: int = 128,
        zero_point: bool = True,
    ) -> "QuantLinear":
        """Quantize + pack a float weight (packer, analog of
        WQLinear_QUICK.from_linear, reference linear/quick.py:61-156).
        Pure-jnp pack so it traces under jit (the AWQ pipeline jits the
        whole search+pack per block)."""
        from quick_tpu.ops.quantized_matmul import pack_qtpu_jax

        qt = quantize_tensor(weight, group_size=group_size, zero_point=zero_point)
        qw = pack_qtpu_jax(qt.q, group_size)
        return cls(
            qweight=jnp.asarray(qw),
            scales=qt.scales,
            zeros_x_scales=qt.zeros * qt.scales,
            bias=None if bias is None else jnp.asarray(bias),
            group_size=group_size,
        )

    @classmethod
    def from_linear(cls, lin: Linear, group_size: int = 128) -> "QuantLinear":
        return cls.from_float(lin.weight, lin.bias, group_size)


def scales_dtype_env():
    """QUICK_TPU_BF16_SCALES=1 streams per-group scales/zeros in bf16
    (halves the non-weight HBM stream at decode: ~13.6 -> 6.8 MB/layer at
    7B — measured bound is the weight+scale stream). Error added: one
    bf16 rounding of s and z*s (~0.4% of a quant step's scale) — small
    next to the int4 rounding itself; validated by KL test
    (tests/test_quantized_matmul.py)."""
    import os

    return jnp.bfloat16 if os.environ.get("QUICK_TPU_BF16_SCALES") == "1" else None


def cast_scales(tree, dtype):
    """Cast every QuantLinear's scales/zeros_x_scales in a params pytree
    to ``dtype`` (None = no-op). Weight codes and biases are untouched."""
    if dtype is None:
        return tree

    def f(x):
        if isinstance(x, QuantLinear):
            return dataclasses.replace(
                x,
                scales=x.scales.astype(dtype),
                zeros_x_scales=x.zeros_x_scales.astype(dtype),
            )
        return x

    return jax.tree_util.tree_map(
        f, tree, is_leaf=lambda x: isinstance(x, QuantLinear)
    )


def concat_linears(*lins: "QuantLinear | Linear") -> "QuantLinear | Linear":
    """Fuse linears sharing an input into one wide linear (offline QKV /
    gate-up fusion — the analog of fuse_qkv_quick,
    reference quick/awq/utils/fused_utils.py:97-159; trivial in the QTPU
    layout: output channels concatenate directly)."""
    first = lins[0]
    if isinstance(first, QuantLinear):
        has_bias = any(l.bias is not None for l in lins)
        bias = (
            jnp.concatenate([
                l.bias if l.bias is not None
                else jnp.zeros(l.out_features, jnp.float32)
                for l in lins
            ])
            if has_bias else None
        )
        return QuantLinear(
            qweight=jnp.concatenate([l.qweight for l in lins], axis=1),
            scales=jnp.concatenate([l.scales for l in lins], axis=1),
            zeros_x_scales=jnp.concatenate([l.zeros_x_scales for l in lins], axis=1),
            bias=bias,
            group_size=first.group_size,
        )
    has_bias = any(l.bias is not None for l in lins)
    bias = (
        jnp.concatenate([
            l.bias if l.bias is not None else jnp.zeros(l.out_features, jnp.float32)
            for l in lins
        ])
        if has_bias else None
    )
    return Linear(
        weight=jnp.concatenate([l.weight for l in lins], axis=1), bias=bias
    )
