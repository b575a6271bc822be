"""Context (sequence) parallelism for long prefill.

Shards prefill activations along the SEQUENCE dimension over a ``seq`` mesh
axis: every device runs norms/MLPs/projections on its S/n token slice.
Attention keeps K/V sequence-sharded too — blocks rotate around the ring
via ppermute with online-softmax accumulation (parallel/ring_attention.py),
so the per-device K/V footprint is S/n and context length scales linearly
with chips. Sliding-window, ALiBi and softcap layers all ride the ring
(window masks and the ALiBi bias are built from the same global position
grids as the causal mask; softcap is elementwise per chunk) — no layer
kind falls back to a K/V gather. Positions stay global, so RoPE/ALiBi are
exact.

The reference has nothing like this — its long-context story is a
single-device rolling window that DISCARDS old context
(quick/awq/modules/fused/cache.py:32-45; SURVEY.md section 5). Here a
prompt n times longer than one chip's memory fits by adding chips.
"""
from __future__ import annotations

from typing import Optional

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


def context_parallel_forward_fn(
    cfg: ModelConfig, mesh: Mesh, zigzag: Optional[bool] = None
):
    """Build a jitted sequence-sharded prefill:

        fn(params, tokens [B, S]) -> logits [B, S, V]

    ``zigzag`` (default: auto) uses the load-balanced zigzag chunk layout —
    each device owns chunks (d, 2n-1-d), ring attention cond-skips the
    fully-masked pairs (~2x less wall compute). Causal, sliding-window,
    ALiBi and softcap layers all ride the ring (window masks and the
    ALiBi bias compose with the per-chunk position masks; softcap is
    elementwise per chunk) — every supported attention kind keeps K/V
    sharded. S must divide by 2n; the wrapper permutes tokens in and
    logits back out, so callers see global order either way. Params are
    replicated (combine with TP by nesting axes if weights must shard)."""
    from quick_tpu.models.model import model_forward
    from quick_tpu.parallel.ring_attention import zigzag_order

    n = mesh.shape[SEQ_AXIS]
    if zigzag is None:
        zigzag = True
    ctx = ParallelContext(
        seq_axis=SEQ_AXIS, seq_size=n, seq_zigzag=zigzag
    )

    def local_fwd(params, tokens_local, positions_local):
        logits, _ = model_forward(
            params, cfg, tokens_local, cache=None,
            positions=positions_local, ctx=ctx,
        )
        return logits

    smapped = shard_map(
        local_fwd,
        mesh=mesh,
        in_specs=(P(), P(None, SEQ_AXIS), P(None, SEQ_AXIS)),
        out_specs=P(None, SEQ_AXIS, None),
        check_vma=False,
    )

    @jax.jit
    def fn(params, tokens):
        B, S = tokens.shape
        if S % (2 * n if zigzag else n):
            raise ValueError(
                f"S={S} not divisible by {'2x' if zigzag else ''}seq mesh "
                f"size {n}"
            )
        if zigzag:
            order = zigzag_order(S, n)
            pos = jnp.broadcast_to(order[None, :], (B, S))
            out = smapped(params, tokens[:, order], pos)
            return out[:, jnp.argsort(order)]
        pos = jnp.broadcast_to(jnp.arange(S, dtype=jnp.int32)[None], (B, S))
        return smapped(params, tokens, pos)

    return fn
