"""Context (sequence) parallelism for long prefill.

Shards prefill activations along the SEQUENCE dimension over a ``seq`` mesh
axis: every device runs norms/MLPs/projections on its S/n token slice.
Attention keeps K/V sequence-sharded too — blocks rotate around the ring
via ppermute with online-softmax accumulation (parallel/ring_attention.py),
so the per-device K/V footprint is S/n and context length scales linearly
with chips. Layers the ring cannot express (ALiBi bias, sliding window,
logit softcap) fall back to a K/V all-gather for that layer. Positions stay
global, so RoPE/ALiBi are exact.

The reference has nothing like this — its long-context story is a
single-device rolling window that DISCARDS old context
(quick/awq/modules/fused/cache.py:32-45; SURVEY.md section 5). Here a
prompt n times longer than one chip's memory fits by adding chips.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from quick_tpu.config import ModelConfig
from quick_tpu.parallel.context import ParallelContext

SEQ_AXIS = "seq"


def create_seq_mesh(n: int, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if n > len(devices):
        raise ValueError(f"need {n} devices, have {len(devices)}")
    return Mesh(np.asarray(devices[:n]), (SEQ_AXIS,))


def context_parallel_forward_fn(cfg: ModelConfig, mesh: Mesh):
    """Build a jitted sequence-sharded prefill:

        fn(params, tokens [B, S]) -> logits [B, S, V]

    S must be divisible by the mesh size. Params are replicated (combine
    with TP by nesting axes if weights must also shard)."""
    from quick_tpu.models.model import model_forward

    n = mesh.shape[SEQ_AXIS]
    ctx = ParallelContext(seq_axis=SEQ_AXIS, seq_size=n)

    def local_fwd(params, tokens_local):
        B, S_local = tokens_local.shape
        start = jax.lax.axis_index(SEQ_AXIS) * S_local
        positions = jnp.broadcast_to(
            jnp.arange(S_local)[None, :] + start, (B, S_local)
        )
        logits, _ = model_forward(
            params, cfg, tokens_local, cache=None, positions=positions,
            ctx=ctx,
        )
        return logits

    smapped = shard_map(
        local_fwd,
        mesh=mesh,
        in_specs=(P(), P(None, SEQ_AXIS)),
        out_specs=P(None, SEQ_AXIS, None),
        check_vma=False,
    )

    @jax.jit
    def fn(params, tokens):
        S = tokens.shape[1]
        if S % n:
            raise ValueError(f"S={S} not divisible by seq mesh size {n}")
        return smapped(params, tokens)

    return fn
