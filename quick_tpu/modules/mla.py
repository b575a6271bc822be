"""Multi-head Latent Attention (DeepSeek-V2/V3).

Post-reference capability — SqueezeBits/QUICK has no DeepSeek support; this
module exists because a serving framework in 2025+ must run the DeepSeek
family. Re-derived for TPU from the DeepSeek-V2 paper's "absorbed" inference
formulation (matrix-absorption of W_UK/W_UV into the query/output paths):

- The KV cache holds ONLY the compressed latent per token:
  ``[c_kv (kv_lora_rank) | k_pe (qk_rope_head_dim)]`` — 576 floats/token for
  v2/v3 regardless of head count (~14x smaller than the expanded MHA cache).
  The latent is cached POST kv_a_layernorm, rope applied to k_pe, so decode
  reads are pure dots.
- Attention runs as MQA in latent space: per-head queries
  ``[q_nope @ W_UK | q_pe]`` (width R+dr) against the shared latent stream,
  then the context re-projects through W_UV into v_head_dim before o_proj.
  Every op is a large einsum — MXU-friendly, XLA fuses the whole chain; no
  Pallas needed until profiling says otherwise.
- One code path serves prefill, chunked prefill and decode (same contract as
  ops/attention.py::causal_attention).

W4A16 note: q(_a/_b), kv_a and o_proj quantize like any linear; ``kv_b_proj``
stays FLOAT — its weight is consumed as the absorbed W_UK/W_UV einsum
operands, not as a standalone GEMM (it is ~0.1% of model bytes; the MoE
experts dominate).

TP: head-sharded q_b/kv_b/o (model axis); kv_a and the latent cache are
replicated across TP shards (MQA — every shard needs the full latent), the
standard MLA TP layout.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from quick_tpu.config import ModelConfig
from quick_tpu.modules.linear import Linear, QuantLinear
from quick_tpu.ops.norms import rms_norm
from quick_tpu.parallel.context import ParallelContext

AnyLinear = QuantLinear | Linear

NEG_INF = float(jnp.finfo(jnp.float32).min)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class MLAParams:
    """DeepSeek MLA projections (HF modeling_deepseek_v2 naming).

    ``q_proj``: the full query projection (lite, q_lora_rank=None) or the
    q_a down-projection (full models); ``q_b_proj``/``q_a_norm`` present
    only in the latter case."""

    q_proj: AnyLinear            # [D, hq*(dn+dr)] or [D, q_lora_rank]
    kv_a_proj: AnyLinear         # [D, R + dr]
    kv_a_norm: jax.Array         # [R]
    kv_b_proj: Linear            # [R, hq*(dn+dv)] — float (absorbed use)
    o_proj: AnyLinear            # [hq*dv, D]
    q_b_proj: Optional[AnyLinear] = None  # [q_lora_rank, hq*(dn+dr)]
    q_a_norm: Optional[jax.Array] = None  # [q_lora_rank]


def mla_softmax_scale(cfg: ModelConfig) -> float:
    """(dn+dr)^-0.5, times the deepseek-yarn mscale^2 correction
    (modeling_deepseek_v2 DeepseekV2Attention.softmax_scale)."""
    scale = (cfg.qk_nope_head_dim + cfg.qk_rope_head_dim) ** -0.5
    d = dict(cfg.rope_scaling) if cfg.rope_scaling else {}
    msad = d.get("mscale_all_dim")
    factor = float(d.get("factor", 1.0))
    if msad and factor > 1.0:
        m = 0.1 * float(msad) * math.log(factor) + 1.0
        scale = scale * m * m
    return scale


def _use_expanded(S: int, T: int) -> bool:
    """Prefill-shape heuristic: expand the latent to per-head K/V (rides the
    flash kernel, O(S*D) memory) when the query span is a sizable fraction
    of the cache extent; otherwise use the absorbed MQA form, whose score
    block is tiny for short S. QUICK_TPU_MLA_EXPANDED=0/1 forces a path
    (benchmarks: tools/mla_prefill_bench.py)."""
    import os

    env = os.environ.get("QUICK_TPU_MLA_EXPANDED", "")
    if env in ("0", "1"):
        return env == "1"
    return S >= 32 and 8 * S >= T


def mla_attention_forward(
    p: MLAParams,
    cfg: ModelConfig,
    x: jax.Array,  # [B, S, D]
    rope_cos: jax.Array,  # table over qk_rope_head_dim
    rope_sin: jax.Array,
    cache,  # KVCache with k=[L,B,1,Smax,dr] (k_pe), v=[L,B,1,Smax,R] (c_kv)
    layer_idx: int,
    positions: jax.Array,  # [B, S]
    ctx: ParallelContext = ParallelContext(),
    return_pre_o: bool = False,  # return the [B, S, hq*dv] activation
    # BEFORE o_proj (the AWQ o-group calibration input, quantize/awq.py);
    # prefill paths only — the paged decode path never calibrates
) -> Tuple[jax.Array, Optional[object]]:
    from quick_tpu.ops.rope import apply_rope

    B, S, D = x.shape
    hq = cfg.num_attention_heads  # local under TP
    dn, dr = cfg.qk_nope_head_dim, cfg.qk_rope_head_dim
    dv, R = cfg.v_head_dim, cfg.kv_lora_rank

    # -- queries --------------------------------------------------------------
    q = p.q_proj(x)
    if p.q_b_proj is not None:  # q-LoRA (full v2/v3)
        q = p.q_b_proj(rms_norm(q, p.q_a_norm, cfg.rms_norm_eps))
    q = q.reshape(B, S, hq, dn + dr)
    q_nope, q_pe = q[..., :dn], q[..., dn:]
    q_pe = apply_rope(q_pe, positions, rope_cos, rope_sin)

    # -- latent stream ---------------------------------------------------------
    ckv = p.kv_a_proj(x)  # [B, S, R+dr]
    c = rms_norm(ckv[..., :R], p.kv_a_norm, cfg.rms_norm_eps)
    k_pe = apply_rope(ckv[..., None, R:], positions, rope_cos, rope_sin)

    # kv_b is consumed as einsum operands in every branch (W_UK into the
    # queries, W_UV out of the context) — split once
    wkv_b = p.kv_b_proj.weight.reshape(R, hq, dn + dv)
    w_uk, w_uv = wkv_b[..., :dn], wkv_b[..., dn:]

    if cache is not None:
        start = cache.length
        # k-slot: rope'd shared k_pe [B,S,1,dr]; v-slot: normed latent.
        cache = cache.update(layer_idx, k_pe, c[:, :, None, :], start)
        from quick_tpu.modules.blocks import _use_paged_kernel

        if S == 1 and _use_paged_kernel(cache):
            # fused paged MLA decode: absorb W_UK into the queries, run
            # the MQA kernel over the latent pages, re-project via W_UV
            from quick_tpu.ops.mla_paged_attention import (
                mla_paged_decode_attention,
            )

            q_c = jnp.einsum(
                "bshd,rhd->bshr", q_nope, w_uk.astype(q_nope.dtype),
                preferred_element_type=jnp.float32,
            ).astype(q_nope.dtype)
            quant = getattr(cache, "quantized", False)
            ctx_c = mla_paged_decode_attention(
                q_c[:, 0], q_pe[:, 0],
                cache.k_pages, cache.v_pages,
                cache.block_table, start + 1, layer=layer_idx,
                scale=mla_softmax_scale(cfg),
                kv_scales=cache.kv_scales if quant else None,
                interpret=jax.default_backend() == "cpu",
            )[:, None]  # [B, 1, hq, R]
            out = jnp.einsum(
                "bshr,rhd->bshd", ctx_c.astype(jnp.float32),
                w_uv.astype(jnp.float32),
                preferred_element_type=jnp.float32,
            ).astype(x.dtype).reshape(B, S, hq * dv)
            return ctx.psum_model(p.o_proj(out)), cache
        # cache.layer() is the duck-typed head-major read — dense KVCache
        # slices, PagedKVCache gathers its block-table pages (and
        # dequantizes INT8 pages)
        k_l, v_l = cache.layer(layer_idx)  # [B, 1, T, dr] / [B, 1, T, R]
        kpe_all = k_l[:, 0]
        c_all = v_l[:, 0]
        kv_len = start + S
        q_offset = start
    else:
        kpe_all = k_pe[:, :, 0]
        c_all = c
        kv_len = S
        q_offset = jnp.zeros((), jnp.int32)
    T = c_all.shape[1]

    if _use_expanded(S, T):
        # -- expanded prefill: k = [c@W_UK | k_pe], v = c@W_UV ------------------
        # The absorbed form materializes [B, hq, S, T] f32 scores — 2GB+ at
        # S=T=2048 with 128 heads. Long queries instead expand the latent to
        # per-head K/V and ride causal_attention, which dispatches to the
        # flash kernel on TPU (O(S*D) memory). The expansion re-projects the
        # WHOLE (padded) cache extent T, so it only pays when S is a sizable
        # fraction of T: full prefill (S ~ T) yes; decode and short serving
        # chunks over a long cache keep the absorbed form below, whose score
        # block is tiny there.
        from quick_tpu.ops.attention import causal_attention

        k_nope = jnp.einsum(
            "btr,rhd->bthd", c_all, w_uk.astype(c_all.dtype),
            preferred_element_type=jnp.float32,
        ).astype(q_nope.dtype)
        v_exp = jnp.einsum(
            "btr,rhd->bthd", c_all, w_uv.astype(c_all.dtype),
            preferred_element_type=jnp.float32,
        ).astype(q_nope.dtype)
        k_full = jnp.concatenate(
            [
                k_nope,
                jnp.broadcast_to(
                    kpe_all[:, :, None, :], (B, T, hq, dr)
                ).astype(k_nope.dtype),
            ],
            axis=-1,
        )
        q_full = jnp.concatenate([q_nope, q_pe.astype(q_nope.dtype)], -1)
        out = causal_attention(
            q_full, k_full, v_exp, q_offset=q_offset, kv_len=kv_len,
            scale=mla_softmax_scale(cfg),
        )
        out = out.reshape(B, S, hq * dv)
        if return_pre_o:
            return out, cache
        return ctx.psum_model(p.o_proj(out)), cache

    # -- absorbed MQA over the latent -------------------------------------------
    # kv_b is consumed as einsum operands (W_UK into q, W_UV out of the
    # context) — zero cache expansion, scores/context ride the MXU
    wkv_b = p.kv_b_proj.weight.reshape(R, hq, dn + dv)
    w_uk, w_uv = wkv_b[..., :dn], wkv_b[..., dn:]
    q_c = jnp.einsum(
        "bshd,rhd->bshr", q_nope, w_uk.astype(q_nope.dtype),
        preferred_element_type=jnp.float32,
    ).astype(q_nope.dtype)  # [B,S,hq,R]
    scores = jnp.einsum(
        "bshr,btr->bhst", q_c, c_all, preferred_element_type=jnp.float32
    ) + jnp.einsum(
        "bshd,btd->bhst", q_pe, kpe_all, preferred_element_type=jnp.float32
    )
    scores = scores * mla_softmax_scale(cfg)

    off = jnp.asarray(q_offset)
    off = off.reshape(-1, 1, 1, 1) if off.ndim > 0 else off
    q_pos = jnp.arange(S).reshape(1, 1, S, 1) + off
    k_pos = jnp.arange(T).reshape(1, 1, 1, T)
    klen = jnp.asarray(kv_len)
    klen = klen.reshape(-1, 1, 1, 1) if klen.ndim > 0 else klen
    mask = jnp.logical_and(k_pos <= q_pos, k_pos < klen)
    scores = jnp.where(mask, scores, NEG_INF)
    attn = jax.nn.softmax(scores, axis=-1)

    # probs stay f32 like the dense einsum path (ops/attention.py:108-115)
    # — golden numerics; XLA fuses the latent upcast into the dot
    ctx_c = jnp.einsum(
        "bhst,btr->bshr", attn, c_all.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)  # [B,S,hq,R]
    out = jnp.einsum(
        "bshr,rhd->bshd", ctx_c, w_uv.astype(ctx_c.dtype),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)  # [B,S,hq,dv]
    out = out.reshape(B, S, hq * dv)
    if return_pre_o:
        return out, cache
    return ctx.psum_model(p.o_proj(out)), cache


def make_mla_cache(
    cfg: ModelConfig, batch: int, max_seq: int, dtype=jnp.bfloat16
):
    """Dense latent cache: k-slot [L,B,1,Smax,dr] (rope'd k_pe), v-slot
    [L,B,1,Smax,R] (normed c_kv)."""
    from quick_tpu.modules.cache import KVCache

    L = cfg.num_hidden_layers
    return KVCache(
        k=jnp.zeros((L, batch, 1, max_seq, cfg.qk_rope_head_dim), dtype),
        v=jnp.zeros((L, batch, 1, max_seq, cfg.kv_lora_rank), dtype),
        length=jnp.zeros((), jnp.int32),
    )
