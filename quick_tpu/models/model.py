"""The decoder-only model: parameters + functional forward.

One parameterized implementation covers the Llama-like family (the
reference's ``LlamaLikeModel``, quick/awq/modules/fused/model.py:77-109) and
its MoE variant (``MixtralModel``); other families plug in via ModelConfig
switches. The forward is a pure function of (params, tokens, cache) — no
device hops, no input-id dedup bookkeeping (reference
utils/fused_utils.py:30-42): under jit the whole step is one XLA program.
"""
from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp

from quick_tpu.config import ModelConfig
from quick_tpu.modules.blocks import (
    AttentionParams,
    BlockParams,
    MLPParams,
    MoEParams,
    block_forward,
)
from quick_tpu.modules.cache import KVCache
from quick_tpu.modules.linear import Linear, QuantLinear, concat_linears
from quick_tpu.ops.norms import layer_norm, rms_norm
from quick_tpu.ops.rope import local_rope_tables, rope_table
from quick_tpu.parallel.context import ParallelContext


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class ModelParams:
    embed: jax.Array  # [V, D]
    blocks: List[BlockParams]
    final_norm: jax.Array
    lm_head: Linear  # left unquantized, like the reference (SURVEY 3.3)
    rope_cos: jax.Array
    rope_sin: jax.Array
    final_norm_bias: Optional[jax.Array] = None
    #: learned position embedding table [P, D] (opt / gpt_bigcode); any
    #: position-id offset (OPT's +2) is applied at import time
    pos_embed: Optional[jax.Array] = None
    #: post-embedding layernorm (bloom word_embeddings_layernorm)
    embed_norm: Optional[jax.Array] = None
    embed_norm_bias: Optional[jax.Array] = None
    lm_head_bias_unused: Optional[jax.Array] = None
    #: gemma3 dual rope: sliding-window layers read these tables (built at
    #: cfg.rope_local_theta, no scaling) instead of rope_cos/rope_sin
    rope_cos_local: Optional[jax.Array] = None
    rope_sin_local: Optional[jax.Array] = None


def model_forward(
    params: ModelParams,
    cfg: ModelConfig,
    tokens: jax.Array,  # [B, S] int32
    cache: Optional[KVCache] = None,
    positions: Optional[jax.Array] = None,
    ctx: ParallelContext = ParallelContext(),
    advance: Optional[jax.Array] = None,  # [B] valid-token counts (chunked
    # serving steps advance per-slot lengths by this instead of S)
    last_token_only: bool = False,  # lm_head on the final position only —
    # prefill needs one next-token distribution, not [B, S, V] f32 logits
    # (at 7B/bs=64 that tensor alone is ~1GB)
    last_valid: Optional[jax.Array] = None,  # [B] per-row valid counts:
    # gather each row's LAST VALID hidden state before the head (returns
    # [B, 1, V]) — the serving engine's ragged chunks would otherwise
    # compute+materialize [B, C, V] f32 logits (2.1GB at 256 slots)
    inputs_embeds: Optional[jax.Array] = None,  # [B, S, D] — overrides the
    # embedding lookup (multimodal splice, modules/vision.py; the
    # reference reaches this via HF Vision2Seq generate, models/llava.py)
) -> Tuple[jax.Array, Optional[KVCache]]:
    """Returns (logits [B, S, V] or [B, 1, V], updated cache).

    ``cache`` is either the dense KVCache (scalar length) or a PagedKVCache
    ([B] per-slot lengths); both expose update/layer/length/with_length."""
    B, S = tokens.shape
    if positions is None:
        start = cache.length if cache is not None else jnp.zeros((), jnp.int32)
        start2 = start.reshape(-1, 1) if getattr(start, "ndim", 0) == 1 else start
        positions = jnp.arange(S)[None, :] + start2  # broadcasts over B
        # clamp: padded chunk positions must not overrun the rope table
        positions = jnp.minimum(positions, cfg.max_position_embeddings - 1)
        positions = jnp.broadcast_to(positions, (B, S))
    # chunked serving steps carry per-slot valid counts; the mask keeps
    # padding tokens from electing MoE experts (sparse-dispatch DMA skip)
    token_mask = None
    if advance is not None:
        token_mask = jnp.arange(S)[None, :] < jnp.reshape(advance, (-1, 1))
    x = (
        inputs_embeds.astype(jnp.bfloat16)
        if inputs_embeds is not None
        else params.embed[tokens].astype(jnp.bfloat16)
    )
    if cfg.embed_scale:
        # gemma: hidden = embed * sqrt(D), with the normalizer rounded to
        # the activation dtype first (HF casts the scalar before the mul)
        x = x * jnp.asarray(cfg.hidden_size ** 0.5).astype(x.dtype)
    if cfg.embed_multiplier is not None:
        # granite embedding_multiplier / minicpm scale_emb
        x = x * jnp.asarray(cfg.embed_multiplier, x.dtype)
    if params.pos_embed is not None:
        P = params.pos_embed.shape[0]
        x = x + params.pos_embed[jnp.minimum(positions, P - 1)].astype(x.dtype)
    if params.embed_norm is not None:
        x = layer_norm(
            x, params.embed_norm, params.embed_norm_bias, cfg.rms_norm_eps
        )
    # Megatron sequence-parallel TP (ctx.tp_seq): shard the residual stream
    # along S for the whole block stack — row-parallel projections
    # reduce_scatter over tokens and the pre-GEMM norms all_gather back
    # (parallel/context.py). Eligible shapes only: the standard pre-norm
    # dense block (the flagship llama/mistral path); decode steps (S=1) and
    # exotic block variants keep the plain psum.
    seq_scatter = bool(
        ctx.tp_seq and ctx.tp_seq > 1 and S % ctx.tp_seq == 0
        and cfg.pre_norms and not cfg.parallel_residual and not cfg.is_mla
        and cfg.residual_multiplier is None
        and not any(cfg.layer_is_moe(i) for i in range(cfg.num_hidden_layers))
        and params.blocks[0].attn_post_norm is None
        and params.blocks[0].mlp_post_norm is None
    )
    if seq_scatter:
        Sl = S // ctx.tp_seq
        x = jax.lax.dynamic_slice_in_dim(
            x, jax.lax.axis_index(ctx.model_axis) * Sl, Sl, axis=1
        )
    use_local = params.rope_cos_local is not None
    for i, blk in enumerate(params.blocks):
        local = use_local and cfg.layer_is_sliding(i)
        x, cache = block_forward(
            blk, cfg, x,
            params.rope_cos_local if local else params.rope_cos,
            params.rope_sin_local if local else params.rope_sin,
            cache, i, positions, ctx, token_mask=token_mask,
            seq_scatter=seq_scatter,
        )
    if seq_scatter:
        x = ctx.all_gather_seq_model(x)
    if cache is not None:
        cache = cache.with_length(
            cache.length + (S if advance is None else advance)
        )
    if last_token_only:
        x = x[:, -1:]
    if last_valid is not None and x.shape[1] > 1:
        # S == 1 (decode) skips the gather: it is a no-op there, and the
        # extra op shifts XLA fusion around the final norm enough to
        # perturb logits ~1e-2 — enough to flip greedy ties vs generate()
        idx = jnp.reshape(jnp.maximum(last_valid - 1, 0), (-1, 1, 1))
        x = jnp.take_along_axis(x, idx, axis=1)  # [B, 1, D]
    from quick_tpu.modules.blocks import _fuse_decode_norm_ok

    if _fuse_decode_norm_ok(
        params.lm_head, x, cfg, params.final_norm_bias
    ):
        # decode: final RMSNorm rides in the quantized lm_head's kernel
        # prologue (int4 head, QuantConfig.quantize_lm_head)
        logits = params.lm_head(
            x, fuse_norm=(params.final_norm, cfg.rms_norm_eps)
        )
    else:
        if cfg.layernorm == "rmsnorm":
            x = rms_norm(x, params.final_norm, cfg.rms_norm_eps)
        else:
            x = layer_norm(
                x, params.final_norm, params.final_norm_bias, cfg.rms_norm_eps
            )
        logits = params.lm_head(x)
    logits = logits.astype(jnp.float32)
    if cfg.logit_scale is not None:
        # cohere logit_scale / granite 1/logits_scaling / minicpm
        # dim_model_base/D — applied in f32, before any softcap
        logits = logits * cfg.logit_scale
    if cfg.final_logit_softcap is not None:
        c = cfg.final_logit_softcap
        logits = c * jnp.tanh(logits / c)
    return logits, cache


# ---------------------------------------------------------------------------
# Construction
# ---------------------------------------------------------------------------

def _init_mla(cfg: ModelConfig, ks, dtype, make, float_make=None):
    """Random MLAParams (deepseek). ``make`` builds the (possibly
    quantized) linears; kv_b always stays float — it is consumed as the
    absorbed W_UK/W_UV einsum operands (modules/mla.py)."""
    from quick_tpu.modules.mla import MLAParams

    D = cfg.hidden_size
    hq = cfg.num_attention_heads
    dn, dr = cfg.qk_nope_head_dim, cfg.qk_rope_head_dim
    dv, R = cfg.v_head_dim, cfg.kv_lora_rank
    fm = float_make or make
    if cfg.q_lora_rank:
        q = make(ks[0], D, cfg.q_lora_rank)
        q_b = make(ks[7], cfg.q_lora_rank, hq * (dn + dr))
        q_a_norm = jnp.ones(cfg.q_lora_rank, dtype)
    else:
        q = make(ks[0], D, hq * (dn + dr))
        q_b = q_a_norm = None
    return MLAParams(
        q_proj=q,
        kv_a_proj=make(ks[8], D, R + dr),
        kv_a_norm=jnp.ones(R, dtype),
        kv_b_proj=fm(ks[9], R, hq * (dn + dv)),
        o_proj=make(ks[1], hq * dv, D),
        q_b_proj=q_b,
        q_a_norm=q_a_norm,
    )


def init_float_params(
    cfg: ModelConfig, key: jax.Array, dtype=jnp.bfloat16
) -> ModelParams:
    """Random-init float model (test/calibration source; the reference always
    starts from HF checkpoints — random init is what lets this framework be
    tested hermetically, SURVEY section 4)."""
    D, F = cfg.hidden_size, cfg.intermediate_size
    hq, hkv, hd = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim
    keys = jax.random.split(key, cfg.num_hidden_layers + 3)

    def dense(k, kin, kout, scale=None):
        scale = scale or (1.0 / jnp.sqrt(kin))
        return Linear(jax.random.normal(k, (kin, kout), dtype) * scale)

    blocks = []
    for i in range(cfg.num_hidden_layers):
        ks = jax.random.split(keys[i], 10)
        if cfg.is_mla:
            attn = _init_mla(cfg, ks, dtype, dense)
        else:
            qkv = dense(ks[0], D, (hq + 2 * hkv) * hd)
            if cfg.attention_bias:
                qkv = Linear(
                    qkv.weight, jnp.zeros((hq + 2 * hkv) * hd, dtype)
                )
            attn = AttentionParams(
                qkv_proj=qkv,
                o_proj=dense(ks[1], hq * hd, D),
                q_norm=(
                    jnp.ones(hq * hd if cfg.qk_norm_full else hd, dtype)
                    if cfg.use_qk_norm else None
                ),
                k_norm=(
                    jnp.ones(hkv * hd if cfg.qk_norm_full else hd, dtype)
                    if cfg.use_qk_norm else None
                ),
            )
        if cfg.layer_is_moe(i):
            E = cfg.num_local_experts
            Fe = cfg.moe_intermediate_size or F
            gu = Linear(
                jax.random.normal(ks[2], (E, D, 2 * Fe), dtype) / jnp.sqrt(D)
            )
            dn = Linear(
                jax.random.normal(ks[3], (E, Fe, D), dtype) / jnp.sqrt(Fe)
            )
            Fs = cfg.shared_intermediate_size or Fe * cfg.n_shared_experts
            mlp = MoEParams(
                router=dense(ks[4], D, E),
                gate_up_proj=gu,
                down_proj=dn,
                shared_gate_up=(
                    dense(ks[5], D, 2 * Fs) if Fs else None
                ),
                shared_down=dense(ks[6], Fs, D) if Fs else None,
                score_bias=(
                    jnp.zeros(E, jnp.float32)
                    if cfg.scoring_func == "sigmoid" else None
                ),
                shared_gate=(
                    dense(ks[7], D, 1)
                    if Fs and cfg.shared_expert_gate else None
                ),
            )
        else:
            width = 2 * F if cfg.gated_mlp else F
            mlp = MLPParams(
                gate_up_proj=dense(ks[2], D, width),
                down_proj=dense(ks[3], F, D),
            )
        blocks.append(
            BlockParams(
                attn_norm=jnp.ones(D, dtype) if cfg.pre_norms else None,
                attn=attn,
                mlp_norm=jnp.ones(D, dtype) if cfg.pre_norms else None,
                mlp=mlp,
                attn_post_norm=(
                    jnp.ones(D, dtype) if cfg.use_post_norms else None
                ),
                mlp_post_norm=(
                    jnp.ones(D, dtype) if cfg.use_post_norms else None
                ),
            )
        )
    cos, sin = rope_table(
        cfg.max_position_embeddings, cfg.rotary_dim or hd, cfg.rope_theta,
        cfg.rope_scaling,
    )
    lcos, lsin = local_rope_tables(cfg)
    embed = jax.random.normal(keys[-1], (cfg.vocab_size, D), dtype) * 0.02
    lm_head = (
        Linear(embed.T) if cfg.tie_word_embeddings
        else dense(keys[-2], D, cfg.vocab_size)
    )
    return ModelParams(
        embed=embed,
        blocks=blocks,
        final_norm=jnp.ones(D, dtype),
        lm_head=lm_head,
        rope_cos=cos,
        rope_sin=sin,
        rope_cos_local=lcos,
        rope_sin_local=lsin,
        pos_embed=(
            jax.random.normal(
                keys[-3], (cfg.max_position_embeddings, D), dtype
            ) * 0.02 if cfg.learned_pos else None
        ),
        embed_norm=jnp.ones(D, dtype) if cfg.embed_norm else None,
        embed_norm_bias=jnp.zeros(D, dtype) if cfg.embed_norm else None,
    )


def init_quant_params(
    cfg: ModelConfig, key: jax.Array, group_size: int = 128,
    dtype=jnp.bfloat16,
) -> ModelParams:
    """Random-init an ALREADY-QUANTIZED model (packed int32 qweights).

    Used for hermetic large-model benchmarking: a 7B W4A16 model
    materializes ~4GB instead of the 14GB a float init would need before
    packing (the reference benchmarks load real checkpoints; this framework
    must bench without network access)."""
    D, F = cfg.hidden_size, cfg.intermediate_size
    hq, hkv, hd = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim
    keys = jax.random.split(key, cfg.num_hidden_layers + 3)
    G = group_size

    def qlin(k, kin, kout, experts=None):
        lead = () if experts is None else (experts,)
        k1, k2, k3 = jax.random.split(k, 3)
        qweight = jax.random.randint(
            k1, lead + (kin // 8, kout), jnp.iinfo(jnp.int32).min,
            jnp.iinfo(jnp.int32).max, jnp.int32,
        )
        scales = (
            jax.random.uniform(k2, lead + (kin // G, kout), jnp.float32)
            * 0.004 + 0.001
        ) / jnp.sqrt(kin)
        zeros = jnp.round(
            jax.random.uniform(k3, lead + (kin // G, kout), jnp.float32) * 15
        )
        return QuantLinear(
            qweight=qweight, scales=scales, zeros_x_scales=zeros * scales,
            bias=None, group_size=G,
        )

    def fdense(k, kin, kout):
        return Linear(
            jax.random.normal(k, (kin, kout), dtype) / jnp.sqrt(kin)
        )

    blocks = []
    for i in range(cfg.num_hidden_layers):
        ks = jax.random.split(keys[i], 10)
        if cfg.is_mla:
            attn = _init_mla(cfg, ks, dtype, qlin, float_make=fdense)
        else:
            attn = AttentionParams(
                qkv_proj=qlin(ks[0], D, (hq + 2 * hkv) * hd),
                o_proj=qlin(ks[1], hq * hd, D),
                q_norm=(
                    jnp.ones(hq * hd if cfg.qk_norm_full else hd, dtype)
                    if cfg.use_qk_norm else None
                ),
                k_norm=(
                    jnp.ones(hkv * hd if cfg.qk_norm_full else hd, dtype)
                    if cfg.use_qk_norm else None
                ),
            )
        if cfg.layer_is_moe(i):
            E = cfg.num_local_experts
            Fe = cfg.moe_intermediate_size or F
            Fs = cfg.shared_intermediate_size or Fe * cfg.n_shared_experts
            mlp = MoEParams(
                router=Linear(
                    jax.random.normal(ks[4], (D, E), dtype) / jnp.sqrt(D)
                ),
                gate_up_proj=qlin(ks[2], D, 2 * Fe, experts=E),
                down_proj=qlin(ks[3], Fe, D, experts=E),
                shared_gate_up=qlin(ks[5], D, 2 * Fs) if Fs else None,
                shared_down=qlin(ks[6], Fs, D) if Fs else None,
                score_bias=(
                    jnp.zeros(E, jnp.float32)
                    if cfg.scoring_func == "sigmoid" else None
                ),
                shared_gate=(
                    Linear(
                        jax.random.normal(ks[7], (D, 1), dtype)
                        / jnp.sqrt(D)
                    )
                    if Fs and cfg.shared_expert_gate else None
                ),
            )
        else:
            width = 2 * F if cfg.gated_mlp else F
            mlp = MLPParams(
                gate_up_proj=qlin(ks[2], D, width),
                down_proj=qlin(ks[3], F, D),
            )
        blocks.append(
            BlockParams(
                attn_norm=jnp.ones(D, dtype) if cfg.pre_norms else None,
                attn=attn,
                mlp_norm=jnp.ones(D, dtype) if cfg.pre_norms else None,
                mlp=mlp,
                attn_post_norm=(
                    jnp.ones(D, dtype) if cfg.use_post_norms else None
                ),
                mlp_post_norm=(
                    jnp.ones(D, dtype) if cfg.use_post_norms else None
                ),
            )
        )
    cos, sin = rope_table(
        cfg.max_position_embeddings, cfg.rotary_dim or hd, cfg.rope_theta,
        cfg.rope_scaling,
    )
    lcos, lsin = local_rope_tables(cfg)
    embed = jax.random.normal(keys[-1], (cfg.vocab_size, D), dtype) * 0.02
    from quick_tpu.modules.linear import cast_scales, scales_dtype_env

    return cast_scales(ModelParams(
        embed=embed,
        blocks=blocks,
        final_norm=jnp.ones(D, dtype),
        lm_head=Linear(embed.T),
        rope_cos=cos,
        rope_sin=sin,
        rope_cos_local=lcos,
        rope_sin_local=lsin,
        pos_embed=(
            jax.random.normal(
                keys[-2], (cfg.max_position_embeddings, D), dtype
            ) * 0.02 if cfg.learned_pos else None
        ),
        embed_norm=jnp.ones(D, dtype) if cfg.embed_norm else None,
        embed_norm_bias=jnp.zeros(D, dtype) if cfg.embed_norm else None,
    ), scales_dtype_env())


#: user-facing / HF-style layer names -> this framework's fused linears
#: (used by modules_to_not_convert matching, reference utils/module.py:44-54)
_NAME_ALIASES = {
    "q_proj": "qkv", "k_proj": "qkv", "v_proj": "qkv", "qkv_proj": "qkv",
    "W_pack": "qkv", "query_key_value": "qkv", "Wqkv": "qkv", "c_attn": "qkv",
    "o_proj": "o", "out_proj": "o", "dense": "o", "c_proj": "o",
    "gate_proj": "gate_up", "up_proj": "gate_up", "w1": "gate_up",
    "w3": "gate_up", "fc1": "gate_up", "fc_in": "gate_up",
    "dense_h_to_4h": "gate_up", "c_fc": "gate_up",
    "down_proj": "down", "w2": "down", "fc2": "down", "fc_out": "down",
    "dense_4h_to_h": "down",
    "gate": "router",
}


def canonical_skips(modules_to_not_convert) -> frozenset:
    """Translate a modules_to_not_convert list into canonical fused-linear
    names ({'qkv', 'o', 'gate_up', 'down', 'router'}).

    Patterns match by SUBSTRING like the reference's exclude check
    (quick/awq/utils/module.py:44-54) — real AutoAWQ configs carry
    qualified names ('model.layers.0.self_attn.q_proj', 'mlp.gate'), not
    bare component names. Longer alias keys are tried first so
    'gate_proj'/'up_proj' match gate_up before the bare MoE-router
    'gate'."""
    out = set()
    keys = sorted(_NAME_ALIASES, key=len, reverse=True)
    for pat in modules_to_not_convert or ():
        if pat in ("qkv", "o", "gate_up", "down", "router"):
            out.add(pat)
            continue
        for key in keys:
            if key in pat:
                out.add(_NAME_ALIASES[key])
                break
        else:
            out.add(pat)  # unknown: kept verbatim (matches nothing)
    return frozenset(out)


def quantize_params(
    params: ModelParams,
    cfg: ModelConfig,
    group_size: int = 128,
    zero_point: bool = True,
    modules_to_not_convert=None,
    quantize_lm_head: bool = False,
) -> ModelParams:
    """RTN-quantize every block linear to W4A16 (AWQ scale search is applied
    beforehand by quick_tpu.quantize.awq — this is the pack step, the analog
    of BaseAWQForCausalLM.pack, reference models/base.py:123-138).

    lm_head/embedding stay float by default (reference leaves them
    unconverted); ``quantize_lm_head=True`` packs the head too (~4x less
    head HBM per decode step — no reference analog).
    ``modules_to_not_convert`` entries (our names or HF names like
    "down_proj") keep the matching fused linears float, the analog of
    exclude_layers_to_not_quantize (reference utils/module.py:44-54)."""
    skip = canonical_skips(modules_to_not_convert)

    def q(lin: Linear, name: str = "") -> "QuantLinear | Linear":
        if name in skip:
            return lin
        return QuantLinear.from_float(
            lin.weight, lin.bias, group_size, zero_point
        )

    def q_stacked(lin: Linear) -> QuantLinear:
        """Quantize a stacked-expert weight [E, K, N] expert-by-expert."""
        qls = [
            QuantLinear.from_float(
                lin.weight[e],
                None if lin.bias is None else lin.bias[e],
                group_size, zero_point,
            )
            for e in range(lin.weight.shape[0])
        ]
        return QuantLinear(
            qweight=jnp.stack([l.qweight for l in qls]),
            scales=jnp.stack([l.scales for l in qls]),
            zeros_x_scales=jnp.stack([l.zeros_x_scales for l in qls]),
            bias=None if qls[0].bias is None else jnp.stack([l.bias for l in qls]),
            group_size=group_size,
        )

    new_blocks = []
    for blk in params.blocks:
        if isinstance(blk.attn, AttentionParams):
            attn = AttentionParams(
                q(blk.attn.qkv_proj, "qkv"), q(blk.attn.o_proj, "o"),
                q_norm=blk.attn.q_norm, k_norm=blk.attn.k_norm,
            )
        else:
            # deepseek MLA: q(_a/_b)/kv_a/o quantize; kv_b stays float —
            # consumed as absorbed einsum operands (modules/mla.py)
            from quick_tpu.modules.mla import MLAParams

            attn = MLAParams(
                q_proj=q(blk.attn.q_proj, "qkv"),
                kv_a_proj=q(blk.attn.kv_a_proj, "qkv"),
                kv_a_norm=blk.attn.kv_a_norm,
                kv_b_proj=blk.attn.kv_b_proj,
                o_proj=q(blk.attn.o_proj, "o"),
                q_b_proj=(
                    None if blk.attn.q_b_proj is None
                    else q(blk.attn.q_b_proj, "qkv")
                ),
                q_a_norm=blk.attn.q_a_norm,
            )
        if isinstance(blk.mlp, MoEParams):
            mlp = MoEParams(
                router=blk.mlp.router,  # router stays float (mixtral.py:58)
                gate_up_proj=(
                    blk.mlp.gate_up_proj if "gate_up" in skip
                    else q_stacked(blk.mlp.gate_up_proj)
                ),
                down_proj=(
                    blk.mlp.down_proj if "down" in skip
                    else q_stacked(blk.mlp.down_proj)
                ),
                shared_gate_up=(
                    None if blk.mlp.shared_gate_up is None
                    else q(blk.mlp.shared_gate_up, "gate_up")
                ),
                shared_down=(
                    None if blk.mlp.shared_down is None
                    else q(blk.mlp.shared_down, "down")
                ),
                score_bias=blk.mlp.score_bias,
                shared_gate=blk.mlp.shared_gate,  # [D, 1] — stays float
            )
        else:
            mlp = MLPParams(
                q(blk.mlp.gate_up_proj, "gate_up"),
                q(blk.mlp.down_proj, "down"),
                act_scale=blk.mlp.act_scale,
            )
        new_blocks.append(dataclasses.replace(blk, attn=attn, mlp=mlp))
    out = dataclasses.replace(params, blocks=new_blocks)
    if quantize_lm_head and isinstance(params.lm_head, Linear):
        K = params.lm_head.weight.shape[0]
        if K % group_size:
            raise ValueError(
                f"quantize_lm_head=True but lm_head in_features {K} is not "
                f"a multiple of group_size {group_size}"
            )
        out = dataclasses.replace(
            out, lm_head=QuantLinear.from_float(
                params.lm_head.weight, params.lm_head.bias,
                group_size, zero_point,
            )
        )
    return out
