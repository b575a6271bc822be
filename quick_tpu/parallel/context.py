"""Parallel context threaded through the functional forward.

The reference has NO distributed backend (SURVEY.md section 2.3) — its only
multi-device mechanism is accelerate's layer-placement. Here parallelism is
first-class: the model forward is written once and runs either single-device
(ctx = ParallelContext()) or inside ``shard_map`` over a Mesh, where the
context names the axes so blocks can psum partial results (tensor parallel)
and offset expert indices (expert parallel).
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp


class ParallelContext(NamedTuple):
    """Axis names when running inside shard_map; None = not parallelized.

    - model_axis: tensor-parallel axis (attention heads / MLP width / vocab)
    - data_axis: batch data-parallel axis
    - expert_axis: expert-parallel axis for MoE (usually == model_axis)
    """

    model_axis: Optional[str] = None
    data_axis: Optional[str] = None
    expert_axis: Optional[str] = None
    #: sequence/context-parallel axis: prefill activations are sharded along
    #: S; attention all-gathers K/V over this axis (no reference analog —
    #: the reference is single-device, SURVEY.md section 5 "long-context /
    #: sequence parallelism: none")
    seq_axis: Optional[str] = None
    #: static size of seq_axis. When set, plain causal attention uses RING
    #: attention (parallel/ring_attention.py): K/V stay sequence-sharded and
    #: rotate via ppermute, so per-device KV memory is S/n — the actual
    #: long-context scaling story. None (or alibi/window/softcap layers)
    #: falls back to the K/V all-gather.
    seq_size: Optional[int] = None
    #: zigzag CP layout: each device's shard is the chunk pair (d, 2n-1-d)
    #: — ring attention skips fully-masked chunk pairs via lax.cond, ~2x
    #: less wall-clock compute than the contiguous ring (which computes
    #: every visiting block and masks). Only valid for plain causal layers
    #: (context_parallel_forward_fn gates it).
    seq_zigzag: bool = False
    #: Megatron-style sequence-parallel TP (Korthikanti et al. 2022): set to
    #: the TP degree to let eligible blocks shard their residual stream
    #: along S — row-parallel o/down outputs REDUCE_SCATTER over tokens
    #: instead of psum, and the pre-GEMM norms all_gather back. Same ring
    #: bytes as psum (RS+AG), but norms/residuals do 1/tp of the work and
    #: XLA's collective scheduler can overlap the gather with the following
    #: quantized GEMM (SURVEY.md section 2.3 "collectives overlapped with
    #: the quantized GEMM"). model_forward engages it per call when
    #: S % tp_seq == 0 and the block shape is eligible.
    tp_seq: Optional[int] = None
    #: internal: set by block_forward for its sub-calls — row-parallel
    #: outputs scatter along tokens instead of psum-ing
    tp_seq_scatter: bool = False
    #: CP decode (sharded-KV generation, parallel/context_parallel.py):
    #: global positions of this shard's PROMPT cache rows [B, S_local]
    #: (zigzag layouts make them non-contiguous). Carried as a traced
    #: array — the context never crosses a jit boundary as a static arg.
    cp_prompt_positions: Optional[jax.Array] = None
    #: static local prompt row count; cache rows at/after it are the
    #: REPLICATED decode tail (every shard writes it, only the designated
    #: owner shard attends to it — the LSE combine would double-count
    #: otherwise)
    cp_prompt_len: Optional[int] = None
    #: static global prompt length: tail row r's global position is
    #: cp_global_len + (r - cp_prompt_len)
    cp_global_len: Optional[int] = None

    @property
    def tp(self) -> bool:
        return self.model_axis is not None

    def seq_index(self) -> jax.Array:
        if self.seq_axis is None:
            return jnp.zeros((), jnp.int32)
        return jax.lax.axis_index(self.seq_axis)

    def all_gather_seq(self, x: jax.Array, axis: int = 1) -> jax.Array:
        """Gather a [B, S_local, ...] shard into [B, S_global, ...]."""
        if self.seq_axis is None:
            return x
        return jax.lax.all_gather(x, self.seq_axis, axis=axis, tiled=True)

    def psum_model(self, x: jax.Array) -> jax.Array:
        if self.model_axis is None:
            return x
        if self.tp_seq_scatter:
            # sequence-parallel TP: shard i keeps (the sum of) token block i
            return jax.lax.psum_scatter(
                x, self.model_axis, scatter_dimension=1, tiled=True
            )
        return jax.lax.psum(x, self.model_axis)

    def all_gather_seq_model(self, x: jax.Array) -> jax.Array:
        """Inverse of the psum_scatter: [B, S/tp, D] -> [B, S, D]."""
        if self.model_axis is None:
            return x
        return jax.lax.all_gather(x, self.model_axis, axis=1, tiled=True)

    def model_axis_index(self) -> jax.Array:
        if self.model_axis is None:
            return jnp.zeros((), jnp.int32)
        return jax.lax.axis_index(self.model_axis)

    def expert_axis_index(self) -> jax.Array:
        ax = self.expert_axis or self.model_axis
        if ax is None:
            return jnp.zeros((), jnp.int32)
        return jax.lax.axis_index(ax)

    def psum_expert(self, x: jax.Array) -> jax.Array:
        ax = self.expert_axis or self.model_axis
        if ax is None:
            return x
        return jax.lax.psum(x, ax)
