"""Offline column permutation for TP-sharding fused projections.

A fused QKV weight is [D, Hq*hd + Hkv*hd + Hkv*hd] (see
quick_tpu/modules/linear.py concat_linears). Flat N-sharding over ``tp``
shards would split that concatenation unevenly (shard 0 would get only Q
columns). This module reorders output channels **offline** so each shard's
contiguous slice is exactly [Q_t | K_t | V_t] (resp. [gate_t | up_t]) —
the sharding analog of the QUICK idea: co-design the offline layout with the
parallel access pattern so runtime needs zero data movement.

The same permutation applies to qweight/scales/zeros_x_scales/bias alike
(they share the N axis).
"""
from __future__ import annotations

import dataclasses
from typing import Sequence

import jax.numpy as jnp
import numpy as np

from quick_tpu.modules.linear import Linear, QuantLinear


def tp_permutation(sections: Sequence[int], tp: int) -> np.ndarray:
    """Column index permutation: concat over shards of per-section slices.

    sections: widths of the fused blocks (e.g. [Hq*hd, Hkv*hd, Hkv*hd]).
    Each section width must divide evenly by tp.
    """
    idx = []
    starts = np.cumsum([0] + list(sections))[:-1]
    for t in range(tp):
        for w, s0 in zip(sections, starts):
            if w % tp:
                raise ValueError(f"section width {w} not divisible by tp={tp}")
            per = w // tp
            idx.append(np.arange(s0 + t * per, s0 + (t + 1) * per))
    return np.concatenate(idx)


def permute_columns(lin, perm: np.ndarray):
    """Apply a column (output-channel) permutation to a linear's arrays."""
    perm = jnp.asarray(perm)
    if isinstance(lin, QuantLinear):
        return dataclasses.replace(
            lin,
            qweight=lin.qweight[..., perm],
            scales=lin.scales[..., perm],
            zeros_x_scales=lin.zeros_x_scales[..., perm],
            bias=None if lin.bias is None else lin.bias[..., perm],
        )
    return Linear(
        weight=lin.weight[..., perm],
        bias=None if lin.bias is None else lin.bias[..., perm],
    )


def permute_fused_for_tp(lin, sections: Sequence[int], tp: int):
    """Reorder a fused projection's output channels for tp-way sharding."""
    if tp == 1:
        return lin
    return permute_columns(lin, tp_permutation(sections, tp))
