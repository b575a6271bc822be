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


def cp_decode_attention(
    q: jax.Array,        # [B, 1, Hq, D] the decode step's queries (rope'd)
    k_all: jax.Array,    # [B, Hkv, T_local, D] this shard's cache rows
    v_all: jax.Array,
    local_len: jax.Array,   # scalar int32: valid local rows (incl. tail)
    cur_pos: jax.Array,     # [B] global position of the query token
    ctx: ParallelContext,
    scale: float,
    slopes=None,            # [Hq] ALiBi slopes or None
    window: Optional[int] = None,
    softcap: Optional[float] = None,
) -> jax.Array:
    """Distributed flash-decode over sequence-sharded KV: every shard
    attends its LOCAL cache rows, then one log-sum-exp merge
    (pmax + two psums of [B, Hq, 1]/[B, Hq, D]) combines the partials.
    The decode query is a single token — broadcasting it is free, so no
    ring is needed (the ring's ppermute pipeline only pays at prefill
    block sizes). KV never gathers: per-shard traffic is its own rows.

    The decode tail (rows >= cp_prompt_len) is written replicated on
    every shard; only the LAST shard (seq_size - 1) attends to it, so
    the merge counts each token exactly once. Window and ALiBi use the
    global row positions (prompt rows carry cp_prompt_positions — zigzag
    layouts are non-contiguous; tail rows are cp_global_len + offset).

    Replaces nothing in the reference — its long-context story discards
    old context (quick/awq/modules/fused/cache.py:32-45); here an
    n-times-longer context decodes with each chip holding S/n of KV."""
    B, _, Hq, D = q.shape
    Hkv, T = k_all.shape[1], k_all.shape[2]
    gq = Hq // Hkv
    Lp = ctx.cp_prompt_len
    r = jnp.arange(T, dtype=jnp.int32)
    # global position of every cache row
    prompt_pos = ctx.cp_prompt_positions[:, :Lp]  # [B, Lp]
    tail_pos = ctx.cp_global_len + (r[Lp:] - Lp)  # [T - Lp]
    kv_pos = jnp.concatenate(
        [prompt_pos, jnp.broadcast_to(tail_pos[None], (B, T - Lp))], axis=1
    )  # [B, T]
    is_owner = ctx.seq_index() == ctx.seq_size - 1
    visible = r[None, :] < local_len  # [B, T] valid rows
    visible = jnp.logical_and(
        visible, jnp.logical_or(r[None, :] < Lp, is_owner)
    )
    if window is not None:
        visible = jnp.logical_and(
            visible, kv_pos > cur_pos[:, None] - window
        )
    # storage-dtype operands + f32 accumulation (the flash/causal
    # contract): an f32 KV upcast would materialize the whole local shard
    # per layer per step and run the MXU at ~1/8 rate
    qh = q[:, 0].reshape(B, Hkv, gq, D)
    s = jnp.einsum(
        "bhgd,bhtd->bhgt", qh, k_all,
        preferred_element_type=jnp.float32,
    ) * scale
    if softcap is not None:
        s = softcap * jnp.tanh(s / softcap)
    if slopes is not None:
        bias = slopes.reshape(1, Hkv, gq, 1) * (
            kv_pos[:, None, None, :] - cur_pos[:, None, None, None]
        ).astype(jnp.float32)
        s = s + bias
    s = jnp.where(visible[:, None, None, :], s, -1e30)
    m_loc = jnp.max(s, axis=-1, keepdims=True)           # [B,Hkv,gq,1]
    p = jnp.where(visible[:, None, None, :], jnp.exp(s - m_loc), 0.0)
    l_loc = jnp.sum(p, axis=-1, keepdims=True)
    acc_loc = jnp.einsum(
        "bhgt,bhtd->bhgd", p.astype(v_all.dtype), v_all,
        preferred_element_type=jnp.float32,
    )
    m_g = jax.lax.pmax(m_loc, ctx.seq_axis)
    corr = jnp.exp(m_loc - m_g)
    l_g = jax.lax.psum(l_loc * corr, ctx.seq_axis)
    acc_g = jax.lax.psum(acc_loc * corr, ctx.seq_axis)
    out = acc_g / jnp.where(l_g == 0.0, 1.0, l_g)
    return out.reshape(B, 1, Hq, D).astype(q.dtype)


def context_parallel_generate_fn(
    cfg: ModelConfig,
    mesh: Mesh,
    max_new_tokens: int,
    zigzag: Optional[bool] = None,
):
    """Build a jitted sequence-sharded GREEDY generate:

        fn(params, tokens [B, S]) -> tokens [B, S + max_new_tokens]

    Prefill runs the ring (zigzag by default) with each shard writing its
    local cache rows; decode keeps KV sharded and combines per-shard
    attention partials with one LSE merge per layer (cp_decode_attention).
    Decode compute (norms/GEMMs) is replicated — decode is
    weight-bandwidth-bound, KV memory is what CP scales. S must divide by
    2n (zigzag) or n; S + max_new_tokens must stay within the rope table."""
    from quick_tpu.models.model import model_forward
    from quick_tpu.parallel.ring_attention import zigzag_order
    from quick_tpu.runtime.generate import make_cache

    n = mesh.shape[SEQ_AXIS]
    if zigzag is None:
        zigzag = True

    def local_gen(params, tokens_local, positions_local):
        B, S_local = tokens_local.shape
        S = S_local * n
        ctx = ParallelContext(
            seq_axis=SEQ_AXIS, seq_size=n, seq_zigzag=zigzag,
            cp_prompt_positions=positions_local,
            cp_prompt_len=S_local, cp_global_len=S,
        )
        cache = make_cache(cfg, B, S_local + max_new_tokens)
        logits, cache = model_forward(
            params, cfg, tokens_local, cache=cache,
            positions=positions_local, ctx=ctx,
        )
        # the next-token logits live on the shard owning global row S-1
        sel = (positions_local == S - 1)[..., None]  # [B, S_local, 1]
        last = jax.lax.psum(
            jnp.sum(jnp.where(sel, logits.astype(jnp.float32), 0.0), axis=1),
            SEQ_AXIS,
        )  # [B, V] replicated
        first = jnp.argmax(last, axis=-1).astype(jnp.int32)

        out = jnp.zeros((B, max_new_tokens), jnp.int32)
        out = out.at[:, 0].set(first)

        def body(i, carry):
            out, cache = carry
            tok = out[:, jnp.maximum(i - 1, 0)]
            pos = jnp.full((B, 1), S, jnp.int32) + i - 1
            lg, cache = model_forward(
                params, cfg, tok[:, None], cache=cache, positions=pos,
                ctx=ctx,
            )
            nxt = jnp.argmax(
                lg[:, -1].astype(jnp.float32), axis=-1
            ).astype(jnp.int32)
            out = out.at[:, i].set(nxt)
            return out, cache

        # step i consumes token i-1 and emits token i; the final emitted
        # token needs no forward
        out, _ = jax.lax.fori_loop(1, max_new_tokens, body, (out, cache))
        return out

    smapped = shard_map(
        local_gen,
        mesh=mesh,
        in_specs=(P(), P(None, SEQ_AXIS), P(None, SEQ_AXIS)),
        out_specs=P(),
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
            new = smapped(params, tokens[:, order], pos)
        else:
            pos = jnp.broadcast_to(
                jnp.arange(S, dtype=jnp.int32)[None], (B, S)
            )
            new = smapped(params, tokens, pos)
        return jnp.concatenate([tokens, new], axis=1)

    return fn


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
