"""Mesh creation and parameter sharding rules (TP / DP / EP).

This subsystem has NO counterpart in the reference, which places whole
decoder layers on GPUs via accelerate hooks (SURVEY.md section 2.3,
reference quick/awq/models/base.py:301-308). Here the whole model is a
single jit program over a ``jax.sharding.Mesh``:

- **TP** (axis "model"): Megatron-style — qkv/gate_up column-parallel
  (output channels sharded, quant groups stay intact along K), o/down
  row-parallel (K sharded in group-size multiples; psum inside the block).
- **EP** (axis "model", reused): Mixtral expert arrays sharded on the
  leading expert axis; router replicated; psum combine.
- **DP** (axis "data"): batch sharded; no gradient sync needed (inference).

The forward runs under ``shard_map`` so the Pallas kernels see local shards
(a pallas_call is not GSPMD-partitionable), with collectives placed
explicitly — the "pick a mesh, annotate, let collectives ride ICI" recipe.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from quick_tpu.config import ModelConfig
from quick_tpu.parallel.context import ParallelContext

if False:  # type-checking only; runtime imports are lazy (circular imports)
    from quick_tpu.models.model import ModelParams

MODEL_AXIS = "model"
DATA_AXIS = "data"


def create_mesh(
    tp: int = 1, dp: int = 1, devices: Optional[list] = None
) -> Mesh:
    """Mesh of shape (dp, tp). ICI-contiguous devices land on the TP axis
    (innermost), so TP collectives ride the fastest links."""
    devices = devices if devices is not None else jax.devices()
    if tp * dp > len(devices):
        raise ValueError(f"need {tp * dp} devices, have {len(devices)}")
    arr = np.asarray(devices[: tp * dp]).reshape(dp, tp)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def _linear_spec(lin, col_parallel: bool, moe: bool = False):
    """PartitionSpec pytree for a Linear/QuantLinear.

    col_parallel: shard output channels (N); else shard reduction (K).
    moe: arrays carry a leading expert axis — shard THAT instead (EP).
    """
    from quick_tpu.modules.linear import Linear, QuantLinear

    if moe:
        lead = (MODEL_AXIS,)
        rest2 = (None, None)
        wspec = P(*lead, *rest2)
        bspec = None if lin.bias is None else P(MODEL_AXIS, None)
    elif col_parallel:
        wspec = P(None, MODEL_AXIS)
        bspec = None if lin.bias is None else P(MODEL_AXIS)
    else:
        wspec = P(MODEL_AXIS, None)
        bspec = None if lin.bias is None else P(None)
    if isinstance(lin, QuantLinear):
        return QuantLinear(
            qweight=wspec, scales=wspec, zeros_x_scales=wspec,
            bias=bspec, group_size=lin.group_size,
        )
    return Linear(weight=wspec, bias=bspec)


def param_specs(params: "ModelParams", cfg: ModelConfig) -> "ModelParams":
    """A ModelParams-shaped pytree of PartitionSpecs."""
    from quick_tpu.models.model import ModelParams
    from quick_tpu.modules.blocks import (
        AttentionParams,
        BlockParams,
        MLPParams,
        MoEParams,
    )
    from quick_tpu.modules.linear import Linear

    rep1 = P(None)

    def _replicated_spec(lin):
        from quick_tpu.modules.linear import Linear as _L, QuantLinear as _QL2

        if lin is None:
            return None
        if isinstance(lin, _QL2):
            return _QL2(
                qweight=P(None, None), scales=P(None, None),
                zeros_x_scales=P(None, None),
                bias=None if lin.bias is None else rep1,
                group_size=lin.group_size,
            )
        return _L(
            weight=P(None, None),
            bias=None if lin.bias is None else rep1,
        )

    def _qk_norm_spec(w):
        # [head_dim] shared across heads (qwen3/gemma3) -> replicated;
        # [heads, head_dim] (cohere r+) or full-width [heads*head_dim]
        # (olmo2) -> heads follow the qkv column shards on the model axis
        if w is None:
            return None
        if w.ndim == 2:
            return P(MODEL_AXIS, None)
        return rep1 if w.shape[-1] == cfg.head_dim else P(MODEL_AXIS)

    def block_spec(blk: BlockParams) -> BlockParams:
        if isinstance(blk.attn, AttentionParams):
            attn = AttentionParams(
                qkv_proj=_linear_spec(blk.attn.qkv_proj, col_parallel=True),
                o_proj=_linear_spec(blk.attn.o_proj, col_parallel=False),
                # per-head norm weights: qwen3/gemma3 [head_dim] shared
                # across heads -> replicated; cohere r+ [heads, head_dim] ->
                # heads follow the qkv column shards over the model axis
                q_norm=_qk_norm_spec(blk.attn.q_norm),
                k_norm=_qk_norm_spec(blk.attn.k_norm),
            )
        else:
            # deepseek MLA: q_b/kv_b head-sharded (columns), o row-sharded
            # with psum; the shared-latent projections (q_a, kv_a) and the
            # latent cache itself replicate across TP shards (MQA)
            from quick_tpu.modules.mla import MLAParams

            has_qb = blk.attn.q_b_proj is not None
            attn = MLAParams(
                q_proj=(
                    _replicated_spec(blk.attn.q_proj) if has_qb
                    else _linear_spec(blk.attn.q_proj, col_parallel=True)
                ),
                kv_a_proj=_replicated_spec(blk.attn.kv_a_proj),
                kv_a_norm=rep1,
                kv_b_proj=_linear_spec(blk.attn.kv_b_proj, col_parallel=True),
                o_proj=_linear_spec(blk.attn.o_proj, col_parallel=False),
                q_b_proj=(
                    _linear_spec(blk.attn.q_b_proj, col_parallel=True)
                    if has_qb else None
                ),
                q_a_norm=rep1 if blk.attn.q_a_norm is not None else None,
            )
        if isinstance(blk.mlp, MoEParams):
            mlp = MoEParams(
                router=_linear_spec(blk.mlp.router, col_parallel=True, moe=False),
                gate_up_proj=_linear_spec(blk.mlp.gate_up_proj, True, moe=True),
                down_proj=_linear_spec(blk.mlp.down_proj, False, moe=True),
                # deepseek shared experts: replicated (added AFTER the
                # expert-axis psum in moe_forward)
                shared_gate_up=_replicated_spec(blk.mlp.shared_gate_up),
                shared_down=_replicated_spec(blk.mlp.shared_down),
                score_bias=None if blk.mlp.score_bias is None else rep1,
                shared_gate=_replicated_spec(blk.mlp.shared_gate),
            )
            # router stays replicated (tiny)
            mlp = dataclasses.replace(
                mlp, router=Linear(weight=P(None, None), bias=None
                                   if blk.mlp.router.bias is None else rep1)
            )
        else:
            mlp = MLPParams(
                gate_up_proj=_linear_spec(blk.mlp.gate_up_proj, col_parallel=True),
                down_proj=_linear_spec(blk.mlp.down_proj, col_parallel=False),
                # act_scale is per-ffn-channel -> sharded with gate_up columns
                act_scale=None if blk.mlp.act_scale is None else P(MODEL_AXIS),
            )
        return BlockParams(
            attn_norm=None if blk.attn_norm is None else rep1,
            attn=attn,
            mlp_norm=None if blk.mlp_norm is None else rep1,
            mlp=mlp,
            attn_norm_bias=None if blk.attn_norm_bias is None else rep1,
            mlp_norm_bias=None if blk.mlp_norm_bias is None else rep1,
            attn_post_norm=None if blk.attn_post_norm is None else rep1,
            mlp_post_norm=None if blk.mlp_post_norm is None else rep1,
        )

    from quick_tpu.modules.linear import QuantLinear as _QL

    if isinstance(params.lm_head, _QL):
        lm_spec = _QL(
            qweight=P(None, None), scales=P(None, None),
            zeros_x_scales=P(None, None),
            bias=None if params.lm_head.bias is None else rep1,
            group_size=params.lm_head.group_size,
        )
    else:
        lm_spec = Linear(
            weight=P(None, None),
            bias=None if params.lm_head.bias is None else rep1,
        )
    return ModelParams(
        embed=P(None, None),
        blocks=[block_spec(b) for b in params.blocks],
        final_norm=rep1,
        lm_head=lm_spec,
        rope_cos=P(None, None),
        rope_sin=P(None, None),
        final_norm_bias=None if params.final_norm_bias is None else rep1,
        pos_embed=None if params.pos_embed is None else P(None, None),
        embed_norm=None if params.embed_norm is None else rep1,
        embed_norm_bias=None if params.embed_norm_bias is None else rep1,
        rope_cos_local=None if params.rope_cos_local is None else P(None, None),
        rope_sin_local=None if params.rope_sin_local is None else P(None, None),
    )


def cache_spec(cfg: Optional[ModelConfig] = None):
    """KVCache spec: batch over data, kv heads over model.

    Cache layout is head-major [L, B, H_kv, S_max, D] (modules/cache.py).
    The deepseek MLA latent cache (head axis of size 1) replicates over the
    model axis instead — MQA, every TP shard reads the full latent."""
    from quick_tpu.modules.cache import KVCache

    head = None if (cfg is not None and cfg.is_mla) else MODEL_AXIS
    kv = P(None, DATA_AXIS, head, None, None)
    return KVCache(k=kv, v=kv, length=P())


def prepare_params_for_tp(
    params: "ModelParams", cfg: ModelConfig, tp: int
) -> "ModelParams":
    """Offline column permutation of fused projections so flat N-sharding
    gives each shard [Q_t|K_t|V_t] / [gate_t|up_t] (see parallel/permute.py)."""
    from quick_tpu.modules.blocks import MLPParams, MoEParams
    from quick_tpu.parallel.permute import permute_fused_for_tp

    if tp == 1:
        return params
    hq, hkv, hd = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim
    qkv_sections = [hq * hd, hkv * hd, hkv * hd]
    gu_sections = [cfg.intermediate_size, cfg.intermediate_size]
    new_blocks = []
    import jax.numpy as jnp

    def _split_bias(lin):
        """Row-parallel (K-sharded) linears add their replicated bias on
        EVERY shard BEFORE the model-axis psum (blocks.py psum_model after
        o_proj/down_proj) — pre-divide by tp so the psum reconstructs it
        exactly once."""
        if lin is None or getattr(lin, "bias", None) is None:
            return lin
        return dataclasses.replace(
            lin,
            bias=(lin.bias.astype(jnp.float32) / tp).astype(lin.bias.dtype),
        )

    for blk in params.blocks:
        if hasattr(blk.attn, "qkv_proj"):
            attn = dataclasses.replace(
                blk.attn,
                qkv_proj=permute_fused_for_tp(
                    blk.attn.qkv_proj, qkv_sections, tp
                ),
                o_proj=_split_bias(blk.attn.o_proj),
            )
        else:
            # deepseek MLA: q_b/kv_b columns are head-contiguous, so plain
            # N-sharding already hands each shard whole heads — nothing to
            # permute (o_proj bias still pre-divides for the psum)
            attn = dataclasses.replace(
                blk.attn, o_proj=_split_bias(blk.attn.o_proj)
            )
        mlp = blk.mlp
        if isinstance(mlp, MLPParams):
            mlp = dataclasses.replace(
                mlp,
                gate_up_proj=(
                    permute_fused_for_tp(mlp.gate_up_proj, gu_sections, tp)
                    if cfg.gated_mlp else mlp.gate_up_proj
                ),
                down_proj=_split_bias(mlp.down_proj),
            )
        elif isinstance(mlp, MoEParams):
            # expert arrays are EP-sharded on the expert axis; the gate/up
            # split happens locally per expert — no permutation needed,
            # and each expert's down bias is added on exactly one shard
            # (the others contribute zero through the routing combine), so
            # no bias pre-division either.
            pass
        new_blocks.append(dataclasses.replace(blk, attn=attn, mlp=mlp))
    return dataclasses.replace(params, blocks=new_blocks)


def shard_params(params: "ModelParams", cfg: ModelConfig, mesh: Mesh) -> "ModelParams":
    """Permute fused projections for TP, then device_put with TP/EP shardings."""
    tp = mesh.shape[MODEL_AXIS]
    params = prepare_params_for_tp(params, cfg, tp)
    specs = param_specs(params, cfg)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs
    )


def local_config(cfg: ModelConfig, tp: int) -> ModelConfig:
    """Per-shard config: head counts divided by tp. ``num_local_experts``
    stays GLOBAL on purpose — moe_forward routes over all experts with a
    replicated router and slices the combine weights by each shard's
    expert range (blocks.py::_n_local_experts + expert_axis_index)."""
    if tp == 1:
        return cfg
    if cfg.num_attention_heads % tp or cfg.num_key_value_heads % tp:
        raise ValueError(
            f"tp={tp} must divide heads ({cfg.num_attention_heads}/"
            f"{cfg.num_key_value_heads})"
        )
    kw = dict(
        num_attention_heads=cfg.num_attention_heads // tp,
        num_key_value_heads=cfg.num_key_value_heads // tp,
    )
    if cfg.use_alibi:
        kw["alibi_total_heads"] = cfg.alibi_total_heads or cfg.num_attention_heads
    return dataclasses.replace(cfg, **kw)


def paged_cache_spec(
    quantized: bool = False, cfg: Optional[ModelConfig] = None
):
    """PartitionSpec pytree for a PagedKVCache: KV heads shard over the
    model axis (each TP shard holds its own heads' pages); the block table
    and lengths are replicated control state. ``quantized=True`` adds the
    INT8 per-token scale planes (same head sharding). The deepseek MLA
    latent cache (one MQA "head") replicates its pages over the model axis
    instead — every TP shard reads the full latent."""
    from quick_tpu.modules.paged_cache import PagedKVCache

    mla = cfg is not None and cfg.is_mla
    head = None if mla else MODEL_AXIS
    # scale tiles are [L, P, 8, Hkv*page] (modules/paged_cache.py) with
    # (head, token) flat in the minor dim: sharding that dim over model
    # splits it into contiguous head groups
    sc = P(None, None, None, head) if quantized else None
    return PagedKVCache(
        k_pages=P(None, None, head, None, None),
        v_pages=P(None, None, head, None, None),
        block_table=P(None, None),
        length=P(None),
        kv_scales=sc,
    )


def sharded_row_forward_fn(
    cfg: ModelConfig, mesh: Mesh, params_template, kv_quantized: bool = False
):
    """shard_map-wrapped paged forward for TP serving:

        fn(params_sharded, cache, tokens [B, C], valid [B])
            -> (row_logits [B, V] f32-replicated, cache)

    Returns each row's LAST-valid-position logits (not [B, C, V]) so only a
    [B, V] plane leaves the shard_map. The serving Engine plugs this in as
    its forward and layers the SAME sampling / logprob / penalty code it
    uses single-chip on top — replicated compute on identical inputs, so
    every shard samples the same token. (The reference has no distributed
    serving at all, SURVEY.md section 2.3.)"""
    import jax.numpy as jnp

    from quick_tpu.models.model import model_forward

    tp = mesh.shape[MODEL_AXIS]
    lcfg = local_config(cfg, tp)
    ctx = ParallelContext(
        model_axis=MODEL_AXIS, expert_axis=MODEL_AXIS, tp_seq=tp
    )
    specs = param_specs(params_template, cfg)
    cspec = paged_cache_spec(quantized=kv_quantized, cfg=cfg)

    def local_fn(params, cache, tokens, valid):
        logits, cache = model_forward(
            params, lcfg, tokens, cache, advance=valid,
            last_valid=valid,  # head runs on ONE position per row
            ctx=ctx,
        )
        return logits[:, 0], cache

    return jax.shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(specs, cspec, P(), P()),
        out_specs=(P(), cspec),
        check_vma=False,
    )


def sharded_forward_fn(cfg: ModelConfig, mesh: Mesh):
    """Build a shard_map-wrapped model forward.

    Returns fn(params_sharded, tokens, cache) -> (logits, cache) where
    tokens are sharded over the data axis, params per param_specs, cache per
    cache_spec. Logits come back replicated over "model".
    """
    from quick_tpu.models.model import model_forward
    from quick_tpu.modules.cache import KVCache

    tp = mesh.shape[MODEL_AXIS]
    lcfg = local_config(cfg, tp)
    ctx = ParallelContext(
        model_axis=MODEL_AXIS, data_axis=DATA_AXIS, expert_axis=MODEL_AXIS,
        tp_seq=mesh.shape[MODEL_AXIS],
    )

    def make(params_template: ModelParams):
        specs = param_specs(params_template, cfg)
        cspec = cache_spec(cfg)

        def local_fn(params, tokens, cache):
            # inside shard_map: local shards, explicit collectives
            logits, cache = model_forward(
                params, lcfg, tokens, cache, ctx=ctx
            )
            return logits, cache

        return jax.shard_map(
            local_fn,
            mesh=mesh,
            in_specs=(specs, P(DATA_AXIS, None), cspec),
            out_specs=(P(DATA_AXIS, None, None), cspec),
            check_vma=False,
        )

    return make
