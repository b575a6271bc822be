"""Fused decoder blocks (functional).

TPU re-design of the reference's fused runtime blocks
(quick/awq/modules/fused/block.py and fused/attn.py:100-245, fused/mlp.py):

- QKV projections are fused offline into ONE quantized matmul (analog of
  ``fuse_qkv_quick``, reference utils/fused_utils.py:97-159), as are
  gate+up in the SwiGLU MLP (fused/mlp.py:37-48).
- Attention handles MHA/GQA/MQA by head-group reshape (the reference keys a
  shape table, utils/fused_utils.py:162-204, and repeat_interleaves KV,
  fused/attn.py:194-195 — not needed here).
- One code path serves prefill and decode; the position/cache state machine
  (reference attn.py:141-157 ``start_pos``) reduces to the cache ``length``.
"""
from __future__ import annotations

import dataclasses
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from quick_tpu.config import ModelConfig
from quick_tpu.modules.cache import KVCache
from quick_tpu.parallel.context import ParallelContext
from quick_tpu.modules.linear import Linear, QuantLinear
from quick_tpu.ops.attention import causal_attention
from quick_tpu.ops.norms import layer_norm, rms_norm

AnyLinear = QuantLinear | Linear


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class AttentionParams:
    qkv_proj: AnyLinear  # fused [D, (Hq + 2*Hkv) * hd]
    o_proj: AnyLinear
    #: qwen3-style per-head RMSNorm weights [head_dim] applied to q/k after
    #: the projection reshape, before RoPE (cfg.use_qk_norm)
    q_norm: Optional[jax.Array] = None
    k_norm: Optional[jax.Array] = None


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class MLPParams:
    gate_up_proj: AnyLinear  # fused [D, 2*ffn] (swiglu) or up only
    down_proj: AnyLinear
    #: per-channel divisor applied AFTER the activation (the functional analog
    #: of the reference's ScaledActivation module, quick/awq/modules/act.py:3-10
    #: inserted by _scale_activations, models/base.py:443-457). Used by
    #: non-gated MLPs (mpt/falcon/bloom gelu) where the AWQ down_proj scale
    #: cannot be folded into a preceding linear.
    act_scale: Optional[jax.Array] = None


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class MoEParams:
    """Mixtral-style sparse MoE: router + per-expert fused MLPs stacked on a
    leading expert axis (reference keeps HF's module and quantizes each
    expert linear, quick/awq/models/mixtral.py:58-74). The optional fields
    extend it to DeepSeekMoE: always-on shared experts (one fused dense MLP)
    and the v3 sigmoid-routing e_score_correction_bias."""

    router: Linear  # [D, E] — kept float like the reference's gate
    gate_up_proj: AnyLinear  # leading expert axis on each array
    down_proj: AnyLinear
    shared_gate_up: Optional[AnyLinear] = None  # [D, 2*F_shared]
    shared_down: Optional[AnyLinear] = None     # [F_shared, D]
    score_bias: Optional[jax.Array] = None      # [E] — selection-only bias
    #: qwen2_moe: [D, 1] linear whose sigmoid gates the shared expert
    shared_gate: Optional[AnyLinear] = None


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class BlockParams:
    attn_norm: jax.Array
    attn: AttentionParams
    mlp_norm: jax.Array
    mlp: "MLPParams | MoEParams"
    attn_norm_bias: Optional[jax.Array] = None
    mlp_norm_bias: Optional[jax.Array] = None
    #: gemma2 sandwich norms (cfg.use_post_norms): RMSNorm applied to each
    #: sub-layer's OUTPUT before the residual add (HF gemma2's
    #: post_attention_layernorm / post_feedforward_layernorm)
    attn_post_norm: Optional[jax.Array] = None
    mlp_post_norm: Optional[jax.Array] = None


def _norm(x, w, b, cfg: ModelConfig):
    if cfg.layernorm == "rmsnorm":
        return rms_norm(x, w, cfg.rms_norm_eps)
    return layer_norm(x, w, b, cfg.rms_norm_eps)


def _use_paged_kernel(cache) -> bool:
    """Route paged-cache decode to the scalar-prefetch Pallas kernel on TPU
    (QUICK_TPU_PAGED=1 forces it in interpret mode for CPU tests; =0
    forces the XLA gather baseline)."""
    import os

    if not hasattr(cache, "block_table"):
        return False
    env = os.environ.get("QUICK_TPU_PAGED", "")
    if env == "0":
        return False
    if env == "1":
        return True
    return jax.default_backend() != "cpu"


def _use_dense_decode_kernel(B, Hq, Hkv, cache, D) -> bool:
    """Dense-cache decode through the chunked Pallas kernel
    (ops/decode_attention.py). QUICK_TPU_DENSE_KERNEL=1 forces it in
    interpret mode for CPU tests; =0 forces the XLA einsum baseline."""
    import os

    from quick_tpu.ops import decode_attention as dda

    env = os.environ.get("QUICK_TPU_DENSE_KERNEL", "")
    if env == "0":
        return False
    if hasattr(cache, "block_table"):
        # paged cache with the kernel forced off: keep the XLA gather
        # baseline as the comparison path
        return False
    if not dda.supports(B, Hq, Hkv, cache.max_seq, D):
        return False
    if env == "1":
        return True
    if jax.default_backend() == "cpu":
        return False
    # small KV reads (bs=1-ish) are einsum territory: the kernel's
    # per-grid-step overhead outweighs its fusion win under ~8MB/layer
    # (measured 131.9 vs 137 tok/s at 7B bs=1)
    return 2 * B * cache.max_seq * Hkv * D * 2 >= 8 << 20


def _fuse_decode_norm_ok(lin, x, cfg, norm_bias) -> bool:
    """Fold the pre-GEMM RMSNorm into the quantized decode kernel's
    prologue (ops/quantized_matmul.py::_make_kernel_fused_norm)? Decode
    shapes only — the separate norm dispatch is ~1/3 of the measured
    35 us/layer non-GEMM bs=1 cost. QUICK_TPU_FUSED_NORM=0 disables."""
    import os

    if os.environ.get("QUICK_TPU_FUSED_NORM", "1") == "0":
        return False
    if not isinstance(lin, QuantLinear) or lin.group_size != 128:
        return False
    rows = 1
    for d in x.shape[:-1]:
        rows *= d
    return rows <= 8 and norm_bias is None and cfg.layernorm == "rmsnorm"


def _use_fused_decode_step(cache, B, hd, rope_cos) -> bool:
    """Gate for the fused rope+cache-write+attention decode kernel
    (ops/fused_decode_step.py): llama-family shapes, dense cache small
    enough for VMEM-resident K/V blocks. QUICK_TPU_FUSED_STEP=0 disables
    (=1 forces it in interpret mode for CPU tests)."""
    import os

    env = os.environ.get("QUICK_TPU_FUSED_STEP", "")
    if env == "0":
        return False
    from quick_tpu.ops.fused_decode_step import _group_for

    L, _, Hkv, Smax, D = cache.k.shape
    ok = (
        B <= 8
        and 2 * rope_cos.shape[-1] == hd  # full rotate-half rotary
        and Smax % _group_for(cache.k.dtype) == 0
        and Hkv * Smax * D * cache.k.dtype.itemsize <= 3 * 1024 * 1024
    )
    if not ok:
        return False
    if env == "1":
        return True
    return jax.default_backend() != "cpu"


def _use_layer_tail(p: "BlockParams", cfg: ModelConfig, x, ctx) -> bool:
    """Gate for the decode layer-tail megakernel (ops/fused_layer_tail.py):
    o-proj + residual + RMSNorm + SwiGLU MLP as ONE pallas_call. Decode
    rows (<= 8), llama-family block shape only, no TP/SP (the o/down psum
    must precede the residual adds under TP).

    OPT-IN (QUICK_TPU_LAYER_TAIL=1; default OFF): measured on v5e the
    megakernel plateaus at ~157-159 us/layer-tail (~690 GB/s weight
    stream across 0.5-4.2MB block configs) vs the unfused chain's
    in-model ~150 us at ~734 GB/s — e2e 7B bs=1 169.1 vs 173.6 tok/s.
    The hypothesis it tested (inter-custom-call DMA ramps dominate) is
    FALSE: XLA+Mosaic already pipeline the weight stream across the
    dispatch seams better than the single 3-phase kernel schedules its
    heterogeneous steps. Kept as a documented experiment."""
    import os

    env = os.environ.get("QUICK_TPU_LAYER_TAIL", "")
    if env != "1":
        return False
    rows = 1
    for d in x.shape[:-1]:
        rows *= d
    mlp = p.mlp
    ok = (
        rows <= 8
        and cfg.pre_norms and not cfg.parallel_residual
        and cfg.residual_multiplier is None
        and cfg.layernorm == "rmsnorm" and p.mlp_norm_bias is None
        and p.attn_post_norm is None and p.mlp_post_norm is None
        and not cfg.is_mla
        and not isinstance(mlp, MoEParams)
        and cfg.gated_mlp and cfg.act_fn == "silu"
        and mlp.act_scale is None
        and ctx.model_axis is None and ctx.seq_axis is None
        and all(
            isinstance(lin, QuantLinear) and lin.group_size == 128
            and lin.bias is None
            for lin in (p.attn.o_proj, mlp.gate_up_proj, mlp.down_proj)
        )
    )
    return ok  # env == "1" checked above; CPU runs interpret mode


def attention_forward(
    p: AttentionParams,
    cfg: ModelConfig,
    x: jax.Array,  # [B, S, D]
    rope_cos: jax.Array,
    rope_sin: jax.Array,
    cache: Optional[KVCache],
    layer_idx: int,
    positions: jax.Array,  # [B, S]
    ctx: ParallelContext = ParallelContext(),
    pre_norm: Optional[tuple] = None,  # (rms_weight, eps): x is the RAW
    # residual; the norm fuses into the qkv GEMM (decode glue fusion)
    return_pre_o: bool = False,  # return the raw [B, S, hq*hd] attention
    # output WITHOUT the o projection — the layer-tail megakernel
    # (ops/fused_layer_tail.py) runs o + residual + norm + MLP itself
) -> Tuple[jax.Array, Optional[KVCache]]:
    from quick_tpu.ops.rope import apply_rope

    from quick_tpu.ops.alibi import alibi_slopes

    B, S, D = x.shape
    hq, hkv, hd = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim
    # static per-head slope constants; under TP each shard holds a contiguous
    # head range, selected by the shard's model-axis index
    slopes = None
    if cfg.use_alibi:
        total = cfg.alibi_total_heads or hq
        full = jnp.asarray(alibi_slopes(total))
        if total != hq:
            full = jax.lax.dynamic_slice_in_dim(
                full, ctx.model_axis_index() * hq, hq
            )
        slopes = full
    if pre_norm is not None:
        qkv = p.qkv_proj(x, fuse_norm=pre_norm)  # [B, S, (hq+2hkv)*hd]
    else:
        qkv = p.qkv_proj(x)  # [B, S, (hq+2hkv)*hd]
    if cfg.qkv_clip is not None:
        # MPT clip_qkv: HF clamps the qkv activations every call
        qkv = jnp.clip(qkv, -cfg.qkv_clip, cfg.qkv_clip)
    q, k, v = jnp.split(qkv, [hq * hd, (hq + hkv) * hd], axis=-1)
    if cfg.use_qk_norm and cfg.qk_norm_full:
        # olmo2: ONE RMSNorm over the full projection width, before the
        # head reshape. Under TP the shards hold disjoint head ranges, so
        # the mean-square is psum-reduced to the full-width statistic.
        def _full_rms(t, w):
            tf = t.astype(jnp.float32)
            ss = jnp.sum(tf * tf, axis=-1, keepdims=True)
            n = t.shape[-1]
            if ctx.model_axis is not None:
                ss = jax.lax.psum(ss, ctx.model_axis)
                n = n * jax.lax.psum(1, ctx.model_axis)
            y = tf * jax.lax.rsqrt(ss / n + cfg.rms_norm_eps)
            return (y * w.astype(jnp.float32)).astype(t.dtype)

        q = _full_rms(q, p.q_norm)
        k = _full_rms(k, p.k_norm)
    q = q.reshape(B, S, hq, hd)
    k = k.reshape(B, S, hkv, hd)
    v = v.reshape(B, S, hkv, hd)
    if cfg.use_qk_norm and not cfg.qk_norm_full:
        # per-head norm on q/k before RoPE. The norm kind follows the
        # family's norm: RMSNorm for qwen3/gemma3 ([hd] weights shared
        # across heads), bias-free LayerNorm for cohere command-r-plus
        # ([hq, hd] per-head weights — both broadcast against [B,S,h,hd])
        if cfg.layernorm == "rmsnorm":
            q = rms_norm(q, p.q_norm, cfg.rms_norm_eps)
            k = rms_norm(k, p.k_norm, cfg.rms_norm_eps)
        else:
            q = layer_norm(q, p.q_norm, None, cfg.rms_norm_eps)
            k = layer_norm(k, p.k_norm, None, cfg.rms_norm_eps)
    if cfg.query_pre_attn_scalar is not None:
        # gemma2 custom attention scale, folded into q (AFTER qk-norm, which
        # would normalize it away) so every downstream path — flash, paged,
        # dense-decode kernels — inherits it through its default hd**-0.5
        q = q * jnp.asarray(
            cfg.query_pre_attn_scalar ** -0.5 * hd ** 0.5, q.dtype
        )
    # sliding window for this layer; drop it when it cannot bind (the whole
    # reachable context fits inside the window) so the fast kernel paths
    # stay live for short-context serving (e.g. mistral bench at 256 ctx)
    window = cfg.sliding_window if cfg.layer_is_sliding(layer_idx) else None
    if window is not None:
        reach = cache.max_seq if cache is not None else S
        if ctx.seq_axis is not None:
            # CP: the local cache/shard is 1/n of the context — reach is
            # the GLOBAL prompt plus the decode tail (or n local shards)
            if ctx.cp_global_len is not None and cache is not None:
                reach = ctx.cp_global_len + cache.max_seq - ctx.cp_prompt_len
            elif ctx.seq_size is not None:
                reach = reach * ctx.seq_size
        if reach <= window:
            window = None
    softcap = cfg.attn_logit_softcap
    if (
        S == 1 and cache is not None and not hasattr(cache, "block_table")
        and ctx.seq_axis is None
        and _use_fused_decode_step(cache, B, hd, rope_cos)
    ):
        # one kernel for rope + cache write + attention: the separate
        # fusions cost ~38 us/layer of launch/relayout glue at bs=1
        # (ops/fused_decode_step.py). Non-rope models (bloom/mpt/opt-class,
        # learned positions or ALiBi) ride it too with use_rope=False
        from quick_tpu.ops.fused_decode_step import fused_decode_attention

        if cfg.use_rope:
            pos0 = positions[:, 0]
            c = rope_cos[pos0].astype(jnp.float32)  # [B, hd/2]
            s_r = rope_sin[pos0].astype(jnp.float32)
            cosr = jnp.concatenate([c, c], -1)
            sinr = jnp.concatenate([s_r, s_r], -1)
        else:
            cosr = jnp.zeros((B, hd), jnp.float32)
            sinr = jnp.zeros((B, hd), jnp.float32)
        out, k_pl, v_pl = fused_decode_attention(
            q[:, 0], k[:, 0], v[:, 0], cache.k, cache.v,
            cosr, sinr,
            cache.length, layer_idx, window=window, logit_softcap=softcap,
            alibi_slopes=slopes, use_rope=cfg.use_rope,
            interpret=jax.default_backend() == "cpu",
        )
        cache = dataclasses.replace(cache, k=k_pl, v=v_pl)
        out = out[:, None]  # [B, 1, hq, hd]
        out = out.reshape(B, S, hq * hd)
        if return_pre_o:
            return out, cache
        return ctx.psum_model(p.o_proj(out)), cache
    if cfg.use_rope:
        q = apply_rope(q, positions, rope_cos, rope_sin)
        k = apply_rope(k, positions, rope_cos, rope_sin)

    if cache is not None:
        start = cache.length
        cache = cache.update(layer_idx, k, v, start)
        if ctx.seq_axis is not None and ctx.seq_size is not None:
            # CP with a cache (parallel/context_parallel.py generate):
            # prefill rides the ring on the LOCAL q/k/v (the cache rows
            # were just written for decode); decode attends the local
            # shard and LSE-merges partials across the seq axis — KV
            # never gathers in either phase.
            if S == 1:
                from quick_tpu.parallel.context_parallel import (
                    cp_decode_attention,
                )

                k_all, v_all = cache.layer(layer_idx)
                out = cp_decode_attention(
                    q, k_all, v_all, start + 1, positions[:, 0], ctx,
                    scale=float(hd) ** -0.5, slopes=slopes,
                    window=window, softcap=softcap,
                )
            else:
                from quick_tpu.parallel.ring_attention import (
                    ring_causal_attention,
                    zigzag_ring_causal_attention,
                )

                ring = (
                    zigzag_ring_causal_attention if ctx.seq_zigzag
                    else ring_causal_attention
                )
                out = ring(
                    q, k, v, ctx.seq_axis, ctx.seq_size, window=window,
                    alibi_slopes=slopes, logit_softcap=softcap,
                )
        elif S == 1 and _use_paged_kernel(cache):
            from quick_tpu.ops.paged_attention import paged_decode_attention

            quant = getattr(cache, "quantized", False)
            # whole page/scale stacks + layer index: pre-sliced custom-call
            # operands would be materialized as per-step copies. Sliding
            # windows ride the kernel too (in-window pages only).
            out = paged_decode_attention(
                q[:, 0], cache.k_pages, cache.v_pages,
                cache.block_table, start + 1, layer=layer_idx,
                alibi_slopes=slopes,
                kv_scales=cache.kv_scales if quant else None,
                window=window, logit_softcap=softcap,
                interpret=jax.default_backend() == "cpu",
            )[:, None]
        elif S == 1 and window is None and _use_dense_decode_kernel(B, hq, hkv, cache, hd):
            # chunked dense-decode Pallas kernel: batch-blocked grid steps,
            # DMA skipped past the valid length (ops/decode_attention.py).
            # The WHOLE cache stack goes in (layer picked by BlockSpec) —
            # slicing first would materialize a copy of the slice per step
            from quick_tpu.ops.decode_attention import dense_decode_attention

            out = dense_decode_attention(
                q, cache.k, cache.v, start + 1, layer=layer_idx,
                alibi_slopes=slopes, logit_softcap=softcap,
                interpret=jax.default_backend() == "cpu",
            )
        elif S > 1 and _use_paged_kernel(cache):
            from quick_tpu.ops.paged_attention import (
                paged_chunk_attention,
                supports_chunk,
            )

            if supports_chunk(S, hq, hkv, cache.page_size):
                # chunked-prefill attention straight over the pages: the
                # dense cache.layer() gather materializes (and dequantizes)
                # the whole pool per layer — the 256-slot OOM allocation
                quant = getattr(cache, "quantized", False)
                out = paged_chunk_attention(
                    q, cache.k_pages, cache.v_pages,
                    cache.block_table, start, layer=layer_idx,
                    alibi_slopes=slopes,
                    kv_scales=cache.kv_scales if quant else None,
                    window=window, logit_softcap=softcap,
                    interpret=jax.default_backend() == "cpu",
                )
            else:
                k_all, v_all = cache.layer(layer_idx)
                out = causal_attention(
                    q, k_all, v_all, q_offset=start, kv_len=start + S,
                    alibi_slopes=slopes, kv_heads_major=True,
                    window=window, logit_softcap=softcap,
                )
        else:
            k_all, v_all = cache.layer(layer_idx)  # [B, Hkv, T, D] head-major
            out = causal_attention(
                q, k_all, v_all, q_offset=start, kv_len=start + S,
                alibi_slopes=slopes, kv_heads_major=True,
                window=window, logit_softcap=softcap,
            )
    elif ctx.seq_axis is not None:
        cp_window = (
            cfg.sliding_window if cfg.layer_is_sliding(layer_idx) else None
        )
        if ctx.seq_size is not None:
            # ring attention: K/V stay sequence-sharded and rotate via
            # ppermute — per-device KV footprint is S/n for the whole
            # pass (parallel/ring_attention.py). Sliding-window, ALiBi
            # and softcap layers all ride the ring (window masks and the
            # ALiBi bias are built from the same global position grids
            # the causal mask uses; softcap is elementwise per chunk),
            # so NO layer kind needs a full-KV gather under CP.
            from quick_tpu.parallel.ring_attention import (
                ring_causal_attention,
                zigzag_ring_causal_attention,
            )

            if ctx.seq_zigzag:
                out = zigzag_ring_causal_attention(
                    q, k, v, ctx.seq_axis, ctx.seq_size, window=cp_window,
                    alibi_slopes=slopes, logit_softcap=softcap,
                )
            else:
                out = ring_causal_attention(
                    q, k, v, ctx.seq_axis, ctx.seq_size, window=cp_window,
                    alibi_slopes=slopes, logit_softcap=softcap,
                )
        else:
            # gather fallback: a seq axis without a static ring size
            # attends over the fully gathered K/V (q stays sharded)
            k_all = ctx.all_gather_seq(k)
            v_all = ctx.all_gather_seq(v)
            out = causal_attention(
                q, k_all, v_all, q_offset=ctx.seq_index() * S,
                alibi_slopes=slopes,
                window=cp_window,
                logit_softcap=softcap,
            )
    else:
        out = causal_attention(
            q, k, v, alibi_slopes=slopes, window=window, logit_softcap=softcap
        )
    out = out.reshape(B, S, hq * hd)
    if return_pre_o:
        return out, cache
    # row-parallel output projection: partial sums reduced over the TP axis
    # (Megatron-style; the collective rides ICI under shard_map)
    return ctx.psum_model(p.o_proj(out)), cache


def _act(x, cfg: ModelConfig):
    if cfg.act_fn == "silu":
        return jax.nn.silu(x)
    if cfg.act_fn == "relu":
        return jax.nn.relu(x)
    return jax.nn.gelu(x)


def mlp_forward(
    p: MLPParams, cfg: ModelConfig, x: jax.Array,
    ctx: ParallelContext = ParallelContext(),
    pre_norm: Optional[tuple] = None,  # (rms_weight, eps): x is RAW, the
    # norm fuses into the gate_up GEMM (decode glue fusion)
) -> jax.Array:
    """SwiGLU (or plain) MLP with fused gate+up (reference fused/mlp.py:52-76)."""
    if cfg.gated_mlp:
        gu = (
            p.gate_up_proj(x, fuse_norm=pre_norm) if pre_norm is not None
            else p.gate_up_proj(x)
        )
        if cfg.act_fn == "silu" and isinstance(p.down_proj, QuantLinear):
            # silu(gate) * up fuses into the down GEMM's prologue on decode
            # shapes (ops/quantized_matmul.py _make_kernel_fused_glu);
            # ineligible routes gate first inside the call — numerics
            # identical either way
            return ctx.psum_model(p.down_proj(gu, fuse_glu=True))
        gate, up = jnp.split(gu, 2, axis=-1)
        return ctx.psum_model(p.down_proj(_act(gate, cfg) * up))
    if pre_norm is not None:
        z = _act(p.gate_up_proj(x, fuse_norm=pre_norm), cfg)
        if p.act_scale is not None:
            z = z / p.act_scale.astype(z.dtype)
        return ctx.psum_model(p.down_proj(z))
    z = _act(p.gate_up_proj(x), cfg)
    if p.act_scale is not None:
        z = z / p.act_scale.astype(z.dtype)
    return ctx.psum_model(p.down_proj(z))


def _grouped_moe(
    p: MoEParams, cfg: ModelConfig, x: jax.Array, comb: jax.Array,
) -> jax.Array:
    """Grouped ragged expert dispatch (ops/grouped_matmul.py): expert-sort
    the routed (token, expert) pairs, run both expert GEMMs as ONE Pallas
    kernel each with scalar-prefetched per-tile expert ids, and combine by
    gathering each token's kk routed rows. Returns f32 [B, S, D] (the
    caller psums over the expert axis and casts).

    Slot contributions are re-sorted by expert id so the f32 combine
    accumulates in the same order as the dense-einsum and cond-gated
    paths (token-exactness across dispatch routes)."""
    from quick_tpu.ops.grouped_matmul import (
        build_routing,
        pick_grouped_bm,
        quantized_matmul_grouped,
    )

    B, S, D = x.shape
    T = B * S
    E_local = comb.shape[-1]
    kk = min(cfg.num_experts_per_tok, E_local)
    w, sel = jax.lax.top_k(comb.reshape(T, E_local), kk)  # [T, kk]
    # expert-id-ascending slot order (see docstring)
    ss = jnp.argsort(sel, axis=1)
    sel = jnp.take_along_axis(sel, ss, axis=1)
    w = jnp.take_along_axis(w, ss, axis=1)
    bm = pick_grouped_bm(T * kk, E_local)
    tok_rows, pos, tile_e, tile_live, _ = build_routing(sel, E_local, bm)
    xs = x.reshape(T, D)[tok_rows]  # [Mp, D] expert-sorted tokens
    gup, dnp = p.gate_up_proj, p.down_proj
    # QUICK_TPU_MOE_A8=1: int8 x int8 expert dots at 2x the MXU rate —
    # the grouped step is MXU-pass-bound, so this halves the expert-visit
    # floor at per-row activation-rounding cost (opt-in, quality-gated)
    a8 = os.environ.get("QUICK_TPU_MOE_A8", "0") == "1"
    gu = quantized_matmul_grouped(
        xs, gup.qweight, gup.scales, gup.zeros_x_scales, tile_e, bm,
        group_size=gup.group_size, tile_live=tile_live, a8=a8,
    )
    gate, up = jnp.split(gu, 2, axis=-1)
    h = _act(gate, cfg) * up
    yd = quantized_matmul_grouped(
        h, dnp.qweight, dnp.scales, dnp.zeros_x_scales, tile_e, bm,
        group_size=dnp.group_size, tile_live=tile_live, a8=a8,
    )
    yg = yd[pos.reshape(-1)].reshape(T, kk, D).astype(jnp.float32)
    y = jnp.sum(yg * w[..., None].astype(jnp.float32), axis=1)
    return y.reshape(B, S, D)


def moe_forward(
    p: MoEParams, cfg: ModelConfig, x: jax.Array,
    ctx: ParallelContext = ParallelContext(),
    token_mask: Optional[jax.Array] = None,  # [B, S] — padding tokens must
    # not elect experts (their routing would defeat the sparse DMA skip)
) -> jax.Array:
    """MoE dispatch (top-k routing; EP sharding splits the expert axis over
    the mesh, see quick_tpu/parallel). Quantized experts ride the grouped
    ragged kernel (ops/grouped_matmul.py) at every batch size; float or
    biased experts fall back to a cond-gated per-expert path (small batch,
    skips unrouted experts' weight DMA) or dense einsum dispatch."""
    B, S, D = x.shape
    E, topk = cfg.num_local_experts, cfg.num_experts_per_tok
    logits = p.router(x.astype(jnp.float32))  # [B,S,E]
    if cfg.moe_router == "deepseek":
        # DeepSeekMoE (modeling_deepseek_v2/v3 MoEGate): score ALL experts
        # first (softmax v2 / sigmoid v3), optionally bias the SELECTION
        # only (v3 e_score_correction_bias), group-limit to topk_group of
        # n_group expert groups, then gather the ORIGINAL scores of the
        # selected experts, renormalize, and apply routed_scaling_factor
        scores = (
            jax.nn.sigmoid(logits) if cfg.scoring_func == "sigmoid"
            else jax.nn.softmax(logits, axis=-1)
        )
        choice = scores if p.score_bias is None else scores + p.score_bias
        ng, tg = cfg.n_group, cfg.topk_group
        if ng and tg and tg < ng:
            gsc = choice.reshape(B, S, ng, E // ng)
            # group score: v3 sums the top-2 per group, v2 takes the max
            if p.score_bias is not None:
                gscore = jax.lax.top_k(gsc, 2)[0].sum(-1)
            else:
                gscore = gsc.max(-1)
            _, gsel = jax.lax.top_k(gscore, tg)  # [B,S,tg]
            gmask = jnp.sum(
                jax.nn.one_hot(gsel, ng, dtype=jnp.bool_), axis=2
            )  # [B,S,ng]
            choice = jnp.where(
                gmask[..., None], gsc, -jnp.inf
            ).reshape(B, S, E)
        _, sel = jax.lax.top_k(choice, topk)
        weights = jnp.take_along_axis(scores, sel, axis=-1)
        if cfg.norm_topk_prob and topk > 1:
            weights = weights / (weights.sum(-1, keepdims=True) + 1e-20)
        weights = weights * cfg.routed_scaling_factor
    elif cfg.moe_router == "softmax_all":
        # qwen2/3-MoE: softmax over ALL experts first, then top-k of the
        # scores; renormalize only under norm_topk_prob (qwen3 yes, qwen2
        # no — without it the weights keep their full-distribution mass)
        scores = jax.nn.softmax(logits, axis=-1)
        weights, sel = jax.lax.top_k(scores, topk)
        if cfg.norm_topk_prob and topk > 1:
            weights = weights / (weights.sum(-1, keepdims=True) + 1e-20)
    else:
        weights, sel = jax.lax.top_k(logits, topk)  # [B,S,topk]
        weights = jax.nn.softmax(weights, axis=-1)
    # combine weights per expert: [B,S,E]
    comb = jnp.sum(
        jax.nn.one_hot(sel, E, dtype=jnp.float32) * weights[..., None], axis=2
    )  # [B,S,E]
    if token_mask is not None:
        comb = comb * token_mask[..., None].astype(comb.dtype)

    def expert_fn(gu_q, gu_s, gu_z, gu_b, dn_q, dn_s, dn_z, dn_b):
        gup = _rebuild_linear(p.gate_up_proj, gu_q, gu_s, gu_z, gu_b)
        dnp = _rebuild_linear(p.down_proj, dn_q, dn_s, dn_z, dn_b)
        gu = gup(x)
        gate, up = jnp.split(gu, 2, axis=-1)
        return dnp(_act(gate, cfg) * up)  # [B,S,D]

    # expert parallel: this shard holds E_local experts starting at offset
    E_local = _n_local_experts(p)
    offset = ctx.expert_axis_index() * E_local
    comb_local = (
        jax.lax.dynamic_slice_in_dim(comb, offset, E_local, axis=-1)
        if E_local != E else comb
    )
    grouped_env = os.environ.get("QUICK_TPU_MOE_GROUPED", "1")
    grouped_ok = (
        grouped_env != "0"
        and isinstance(p.gate_up_proj, QuantLinear)
        and isinstance(p.down_proj, QuantLinear)  # modules_to_not_convert
        # may keep one projection float — those layers use the fallbacks
        and p.gate_up_proj.bias is None
        and p.down_proj.bias is None
    )
    if B * S <= 32 and not grouped_ok:
        # small-batch fallback for FLOAT/biased experts only (quantized
        # experts ride the grouped kernel at every batch size — it beat
        # this cond chain 251 vs 177 tok/s at qwen15moe bs=1): gate each
        # expert behind lax.cond so an expert with no routed tokens skips
        # BOTH its compute and its weight DMA. The reference always runs
        # every routed expert on dense HF modules
        # (quick/awq/models/mixtral.py:58-74).
        y = jnp.zeros((B, S, D), jnp.float32)
        needed = jnp.any(comb_local > 0, axis=(0, 1))  # [E_local]
        zero = jnp.zeros((B, S, D), jnp.float32)

        def one_expert(e):
            def live(args):
                return _apply_expert(p, e, expert_fn).astype(jnp.float32)

            return jax.lax.cond(needed[e], live, lambda args: zero, ())

        for e in range(E_local):  # static unroll; E is small
            y = y + one_expert(e) * comb_local[..., e : e + 1]
    elif grouped_ok:
        # grouped ragged dispatch (the default for quantized experts) —
        # compute and weight DMA scale with ROUTED tokens, not E x T (the
        # dense einsum ran all 60 qwen2-moe experts over all 128 engine
        # tokens: 62.6 vs 35.5 ms/step grouped; see ops/grouped_matmul.py)
        y = _grouped_moe(p, cfg, x, comb_local)
    else:
        # dense dispatch fallback: every expert over every token — one
        # big einsum (biased/float experts, or QUICK_TPU_MOE_GROUPED=0)
        outs = _map_experts(p, expert_fn)  # [E_local, B, S, D]
        y = jnp.einsum("ebsd,bse->bsd", outs.astype(jnp.float32), comb_local)
    y = ctx.psum_expert(y).astype(x.dtype)
    if p.shared_gate_up is not None:
        # deepseek/qwen2 shared expert: always-on dense branch, added AFTER
        # the expert-axis psum (weights replicated across EP shards)
        gu = p.shared_gate_up(x)
        gate, up = jnp.split(gu, 2, axis=-1)
        sh = p.shared_down(_act(gate, cfg) * up)
        if p.shared_gate is not None:
            # qwen2_moe: per-token sigmoid gate on the shared branch
            g = jax.nn.sigmoid(p.shared_gate(x).astype(jnp.float32))
            sh = (sh.astype(jnp.float32) * g).astype(sh.dtype)
        y = y + sh
    return y


def _n_local_experts(p: MoEParams) -> int:
    gu = p.gate_up_proj
    return (gu.qweight if isinstance(gu, QuantLinear) else gu.weight).shape[0]


def _expert_fields(lin, e):
    """Expert e's parameter slices for one projection — quantized or
    float (modules_to_not_convert can leave them MIXED within a layer)."""
    b = None if lin.bias is None else lin.bias[e]
    if isinstance(lin, QuantLinear):
        return (lin.qweight[e], lin.scales[e], lin.zeros_x_scales[e], b)
    return (lin.weight[e], None, None, b)


def _apply_expert(p: MoEParams, e: int, fn):
    """Run fn on expert e's parameter slices (static index)."""
    return fn(*_expert_fields(p.gate_up_proj, e),
              *_expert_fields(p.down_proj, e))


def _rebuild_linear(proto: AnyLinear, *fields):
    if isinstance(proto, QuantLinear):
        q, s, z, b = fields[0], fields[1], fields[2], fields[3]
        return QuantLinear(q, s, z, b, proto.group_size)
    w, b = fields[0], fields[3]
    return Linear(w, b)


def _map_experts(p: MoEParams, fn):
    """vmap-free loop over the expert axis (static unroll; expert count is
    small). Returns stacked [E, ...] output."""
    E = _n_local_experts(p)
    return jnp.stack([_apply_expert(p, e, fn) for e in range(E)])


def block_forward(
    p: BlockParams,
    cfg: ModelConfig,
    x: jax.Array,
    rope_cos: jax.Array,
    rope_sin: jax.Array,
    cache: Optional[KVCache],
    layer_idx: int,
    positions: jax.Array,
    ctx: ParallelContext = ParallelContext(),
    token_mask: Optional[jax.Array] = None,  # [B, S] valid-token mask
    seq_scatter: bool = False,  # sequence-parallel TP: x is the residual
    # shard [B, S/tp, D]; norms run on the shard, all_gather feeds the
    # column-parallel GEMMs, and o/down outputs reduce_scatter back
    # (model_forward gates eligibility — SURVEY.md section 2.3 overlap)
) -> Tuple[jax.Array, Optional[KVCache]]:
    if seq_scatter:
        sctx = ctx._replace(tp_seq_scatter=True)
        h = _norm(x, p.attn_norm, p.attn_norm_bias, cfg)
        h = ctx.all_gather_seq_model(h)  # [B, S, D] for qkv + cache write
        attn_out, cache = attention_forward(
            p.attn, cfg, h, rope_cos, rope_sin, cache, layer_idx,
            positions, sctx,
        )  # reduce_scattered back to [B, S/tp, D]
        x = x + attn_out
        h2 = _norm(x, p.mlp_norm, p.mlp_norm_bias, cfg)
        h2 = ctx.all_gather_seq_model(h2)
        return x + mlp_forward(p.mlp, cfg, h2, sctx), cache
    rmul = cfg.residual_multiplier  # granite / minicpm scale_depth
    # olmo2 (pre_norms=False): sub-layers read the raw residual stream;
    # the post-norms are the only norms
    fuse_attn_norm = (
        cfg.pre_norms and not cfg.is_mla and p.attn_norm is not None
        and _fuse_decode_norm_ok(
            getattr(p.attn, "qkv_proj", None), x, cfg, p.attn_norm_bias
        )
    )
    if fuse_attn_norm:
        h = x  # norm rides inside the qkv GEMM prologue
    else:
        h = _norm(x, p.attn_norm, p.attn_norm_bias, cfg) if cfg.pre_norms else x
    tail_ok = _use_layer_tail(p, cfg, x, ctx)
    if cfg.is_mla:
        from quick_tpu.modules.mla import mla_attention_forward

        attn_out, cache = mla_attention_forward(
            p.attn, cfg, h, rope_cos, rope_sin, cache, layer_idx,
            positions, ctx,
        )
    else:
        attn_out, cache = attention_forward(
            p.attn, cfg, h, rope_cos, rope_sin, cache, layer_idx, positions,
            ctx,
            pre_norm=(
                (p.attn_norm, cfg.rms_norm_eps) if fuse_attn_norm else None
            ),
            return_pre_o=tail_ok,
        )
    if tail_ok:
        # the whole post-attention tail (o-proj + residual + mlp norm +
        # SwiGLU MLP + residual) runs as ONE pallas_call — the weight
        # stream never stops at a custom-call boundary
        from quick_tpu.ops.fused_layer_tail import fused_layer_tail

        B_, S_, D_ = x.shape
        o, gup, dn = p.attn.o_proj, p.mlp.gate_up_proj, p.mlp.down_proj
        y = fused_layer_tail(
            attn_out.reshape(B_ * S_, -1), x.reshape(B_ * S_, D_),
            p.mlp_norm,
            o.qweight, o.scales, o.zeros_x_scales,
            gup.qweight, gup.scales, gup.zeros_x_scales,
            dn.qweight, dn.scales, dn.zeros_x_scales,
            eps=float(cfg.rms_norm_eps),
            interpret=jax.default_backend() == "cpu",
        )
        return y.reshape(B_, S_, D_).astype(x.dtype), cache
    if p.attn_post_norm is not None:
        attn_out = _norm(attn_out, p.attn_post_norm, None, cfg)
    if rmul is not None:
        attn_out = attn_out * jnp.asarray(rmul, attn_out.dtype)
    if cfg.parallel_residual:
        # gptj/neox/falcon style: mlp on the same normed input, single residual
        h2 = _norm(x, p.mlp_norm, p.mlp_norm_bias, cfg)
        mlp_out = (
            moe_forward(p.mlp, cfg, h2, ctx, token_mask)
            if isinstance(p.mlp, MoEParams)
            else mlp_forward(p.mlp, cfg, h2, ctx)
        )
        if rmul is not None:
            mlp_out = mlp_out * jnp.asarray(rmul, mlp_out.dtype)
        return x + attn_out + mlp_out, cache
    x = x + attn_out
    fuse_mlp_norm = (
        cfg.pre_norms and not isinstance(p.mlp, MoEParams)
        and p.mlp_norm is not None
        and _fuse_decode_norm_ok(
            p.mlp.gate_up_proj, x, cfg, p.mlp_norm_bias
        )
    )
    if fuse_mlp_norm:
        mlp_out = mlp_forward(
            p.mlp, cfg, x, ctx, pre_norm=(p.mlp_norm, cfg.rms_norm_eps)
        )
    else:
        h2 = _norm(x, p.mlp_norm, p.mlp_norm_bias, cfg) if cfg.pre_norms else x
        mlp_out = (
            moe_forward(p.mlp, cfg, h2, ctx, token_mask)
            if isinstance(p.mlp, MoEParams)
            else mlp_forward(p.mlp, cfg, h2, ctx)
        )
    if p.mlp_post_norm is not None:
        mlp_out = _norm(mlp_out, p.mlp_post_norm, None, cfg)
    if rmul is not None:
        mlp_out = mlp_out * jnp.asarray(rmul, mlp_out.dtype)
    return x + mlp_out, cache
