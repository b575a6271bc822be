"""Checkpoint IO: native quantized format + HF / AutoAWQ interop.

Replaces the reference's persistence layer (save_quantized /
from_quantized, quick/awq/models/base.py:144-194, 241-335):

- **native save/load**: safetensors shards + ``quant_config.json`` +
  ``config.json`` with embedded ``quantization_config`` (dual persistence,
  reference models/_config.py:18-24).
- **HF float import**: maps transformers Llama-family (and Mixtral) weights
  into ModelParams, fusing q/k/v and gate/up offline.
- **AutoAWQ quantized import**: converts GEMM-layout checkpoints to the QTPU
  layout tensor-by-tensor (reference packing semantics,
  utils/packing_utils.py:4-96) — existing AWQ checkpoints run unchanged.

All conversion is streaming (tensor at a time) so 70B-class checkpoints
convert within host RAM.
"""
from __future__ import annotations

import dataclasses
import json
import os
from typing import Dict, Iterator, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from quick_tpu.config import ModelConfig, QuantConfig
from quick_tpu.modules.blocks import (
    AttentionParams,
    BlockParams,
    MLPParams,
    MoEParams,
)
from quick_tpu.modules.linear import Linear, QuantLinear
from quick_tpu.models.model import ModelParams
from quick_tpu.ops.rope import rope_table

SHARD_BYTES = 4 * 1024**3


# ---------------------------------------------------------------------------
# flat dict <-> ModelParams
# ---------------------------------------------------------------------------

def _lin_to_flat(prefix: str, lin, out: Dict[str, np.ndarray]):
    if isinstance(lin, QuantLinear):
        out[f"{prefix}.qweight"] = np.asarray(lin.qweight)
        out[f"{prefix}.scales"] = np.asarray(lin.scales)
        out[f"{prefix}.zeros_x_scales"] = np.asarray(lin.zeros_x_scales)
        if lin.bias is not None:
            out[f"{prefix}.bias"] = np.asarray(lin.bias)
    else:
        out[f"{prefix}.weight"] = np.asarray(lin.weight)
        if lin.bias is not None:
            out[f"{prefix}.bias"] = np.asarray(lin.bias)


def params_to_flat(params: ModelParams) -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {"embed": np.asarray(params.embed)}
    for i, blk in enumerate(params.blocks):
        p = f"blocks.{i}"
        out[f"{p}.attn_norm"] = np.asarray(blk.attn_norm)
        if blk.attn_norm_bias is not None:
            out[f"{p}.attn_norm_bias"] = np.asarray(blk.attn_norm_bias)
        out[f"{p}.mlp_norm"] = np.asarray(blk.mlp_norm)
        if blk.mlp_norm_bias is not None:
            out[f"{p}.mlp_norm_bias"] = np.asarray(blk.mlp_norm_bias)
        _lin_to_flat(f"{p}.attn.qkv", blk.attn.qkv_proj, out)
        _lin_to_flat(f"{p}.attn.o", blk.attn.o_proj, out)
        if isinstance(blk.mlp, MoEParams):
            _lin_to_flat(f"{p}.mlp.router", blk.mlp.router, out)
            _lin_to_flat(f"{p}.mlp.gate_up", blk.mlp.gate_up_proj, out)
            _lin_to_flat(f"{p}.mlp.down", blk.mlp.down_proj, out)
        else:
            _lin_to_flat(f"{p}.mlp.gate_up", blk.mlp.gate_up_proj, out)
            _lin_to_flat(f"{p}.mlp.down", blk.mlp.down_proj, out)
            if blk.mlp.act_scale is not None:
                out[f"{p}.mlp.act_scale"] = np.asarray(blk.mlp.act_scale)
    out["final_norm"] = np.asarray(params.final_norm)
    if params.final_norm_bias is not None:
        out["final_norm_bias"] = np.asarray(params.final_norm_bias)
    _lin_to_flat("lm_head", params.lm_head, out)
    return out


def _flat_to_lin(prefix: str, flat: Dict[str, np.ndarray], group_size: int):
    if f"{prefix}.qweight" in flat:
        return QuantLinear(
            qweight=jnp.asarray(flat[f"{prefix}.qweight"]),
            scales=jnp.asarray(flat[f"{prefix}.scales"]),
            zeros_x_scales=jnp.asarray(flat[f"{prefix}.zeros_x_scales"]),
            bias=(
                jnp.asarray(flat[f"{prefix}.bias"])
                if f"{prefix}.bias" in flat else None
            ),
            group_size=group_size,
        )
    return Linear(
        weight=jnp.asarray(flat[f"{prefix}.weight"]),
        bias=(
            jnp.asarray(flat[f"{prefix}.bias"])
            if f"{prefix}.bias" in flat else None
        ),
    )


def flat_to_params(
    flat: Dict[str, np.ndarray], cfg: ModelConfig, group_size: int = 128
) -> ModelParams:
    blocks = []
    for i in range(cfg.num_hidden_layers):
        p = f"blocks.{i}"
        attn = AttentionParams(
            qkv_proj=_flat_to_lin(f"{p}.attn.qkv", flat, group_size),
            o_proj=_flat_to_lin(f"{p}.attn.o", flat, group_size),
        )
        if f"{p}.mlp.router.weight" in flat:
            mlp = MoEParams(
                router=_flat_to_lin(f"{p}.mlp.router", flat, group_size),
                gate_up_proj=_flat_to_lin(f"{p}.mlp.gate_up", flat, group_size),
                down_proj=_flat_to_lin(f"{p}.mlp.down", flat, group_size),
            )
        else:
            mlp = MLPParams(
                gate_up_proj=_flat_to_lin(f"{p}.mlp.gate_up", flat, group_size),
                down_proj=_flat_to_lin(f"{p}.mlp.down", flat, group_size),
                act_scale=(
                    jnp.asarray(flat[f"{p}.mlp.act_scale"])
                    if f"{p}.mlp.act_scale" in flat else None
                ),
            )
        blocks.append(
            BlockParams(
                attn_norm=jnp.asarray(flat[f"{p}.attn_norm"]),
                attn=attn,
                mlp_norm=jnp.asarray(flat[f"{p}.mlp_norm"]),
                mlp=mlp,
                attn_norm_bias=(
                    jnp.asarray(flat[f"{p}.attn_norm_bias"])
                    if f"{p}.attn_norm_bias" in flat else None
                ),
                mlp_norm_bias=(
                    jnp.asarray(flat[f"{p}.mlp_norm_bias"])
                    if f"{p}.mlp_norm_bias" in flat else None
                ),
            )
        )
    cos, sin = rope_table(
        cfg.max_position_embeddings, cfg.head_dim, cfg.rope_theta
    )
    return ModelParams(
        embed=jnp.asarray(flat["embed"]),
        blocks=blocks,
        final_norm=jnp.asarray(flat["final_norm"]),
        lm_head=_flat_to_lin("lm_head", flat, group_size),
        rope_cos=cos,
        rope_sin=sin,
        final_norm_bias=(
            jnp.asarray(flat["final_norm_bias"])
            if "final_norm_bias" in flat else None
        ),
    )


# ---------------------------------------------------------------------------
# save / load (sharded safetensors, reference base.py:144-194 analog)
# ---------------------------------------------------------------------------

def save_quantized(
    params: ModelParams,
    cfg: ModelConfig,
    qcfg: QuantConfig,
    save_dir: str,
) -> None:
    from safetensors.numpy import save_file

    os.makedirs(save_dir, exist_ok=True)
    store = params_to_flat(params)  # bf16 persists natively via ml_dtypes

    # shard by size
    shards: List[Dict[str, np.ndarray]] = [{}]
    sizes = [0]
    for k, v in store.items():
        if sizes[-1] + v.nbytes > SHARD_BYTES and shards[-1]:
            shards.append({})
            sizes.append(0)
        shards[-1][k] = v
        sizes[-1] += v.nbytes

    index = {"metadata": {"total_size": sum(sizes)}, "weight_map": {}}
    n = len(shards)
    for i, shard in enumerate(shards):
        name = (
            "model.safetensors" if n == 1
            else f"model-{i + 1:05d}-of-{n:05d}.safetensors"
        )
        save_file(shard, os.path.join(save_dir, name))
        for k in shard:
            index["weight_map"][k] = name
    if n > 1:
        with open(os.path.join(save_dir, "model.safetensors.index.json"), "w") as f:
            json.dump(index, f, indent=2)

    qcfg.save_pretrained(save_dir)
    model_cfg = cfg.to_dict()
    model_cfg["quantization_config"] = qcfg.to_transformers_dict()
    with open(os.path.join(save_dir, "config.json"), "w") as f:
        json.dump(model_cfg, f, indent=2)


def _load_flat(model_dir: str) -> Tuple[Dict[str, np.ndarray], dict]:
    from safetensors.numpy import load_file

    with open(os.path.join(model_dir, "config.json")) as f:
        raw_cfg = json.load(f)
    index_path = os.path.join(model_dir, "model.safetensors.index.json")
    flat: Dict[str, np.ndarray] = {}
    if os.path.exists(index_path):
        with open(index_path) as f:
            index = json.load(f)
        for name in sorted(set(index["weight_map"].values())):
            flat.update(load_file(os.path.join(model_dir, name)))
    else:
        flat.update(load_file(os.path.join(model_dir, "model.safetensors")))
    return flat, raw_cfg


def load_quantized(model_dir: str) -> Tuple[ModelParams, ModelConfig, QuantConfig]:
    """Load a native quick_tpu checkpoint (analog of from_quantized,
    reference models/base.py:241-335)."""
    flat, raw_cfg = _load_flat(model_dir)
    cfg = ModelConfig.from_dict(raw_cfg)
    qcfg = QuantConfig.from_pretrained(model_dir)
    params = flat_to_params(flat, cfg, qcfg.q_group_size)
    return params, cfg, qcfg


# ---------------------------------------------------------------------------
# HF transformers float checkpoint import (llama family + mixtral)
# ---------------------------------------------------------------------------

def _hf_tensor_iter(model_dir: str) -> Iterator[Tuple[str, np.ndarray]]:
    """Stream tensors from an HF safetensors checkpoint directory."""
    from safetensors import safe_open

    index_path = os.path.join(model_dir, "model.safetensors.index.json")
    if os.path.exists(index_path):
        with open(index_path) as f:
            index = json.load(f)
        files = sorted(set(index["weight_map"].values()))
    else:
        files = [
            f for f in os.listdir(model_dir) if f.endswith(".safetensors")
        ]
    for fname in files:
        with safe_open(os.path.join(model_dir, fname), framework="np") as f:
            for key in f.keys():
                yield key, f.get_tensor(key)


def load_hf_float(model_dir: str, dtype=jnp.bfloat16) -> Tuple[ModelParams, ModelConfig]:
    """Import an HF float checkpoint (Llama/Mistral/Qwen2/Yi/Vicuna/Mixtral
    layouts) into ModelParams, fusing q/k/v and gate/up offline."""
    with open(os.path.join(model_dir, "config.json")) as f:
        hf_cfg = json.load(f)
    cfg = ModelConfig.from_hf_config(hf_cfg)
    L = cfg.num_hidden_layers

    raw: Dict[str, np.ndarray] = {}
    for key, tensor in _hf_tensor_iter(model_dir):
        raw[key] = tensor

    def W(key):  # HF stores [out, in]; we use [in, out]
        t = raw.pop(key)
        return jnp.asarray(np.ascontiguousarray(np.swapaxes(t, -1, -2))).astype(dtype)

    def V(key):
        return jnp.asarray(raw.pop(key)).astype(dtype)

    def maybe_bias(base):
        k = base + ".bias"
        return V(k) if k in raw else None

    blocks = []
    for i in range(L):
        p = f"model.layers.{i}"
        qw = W(f"{p}.self_attn.q_proj.weight")
        kw = W(f"{p}.self_attn.k_proj.weight")
        vw = W(f"{p}.self_attn.v_proj.weight")
        qb = maybe_bias(f"{p}.self_attn.q_proj")
        kb = maybe_bias(f"{p}.self_attn.k_proj")
        vb = maybe_bias(f"{p}.self_attn.v_proj")
        bias = (
            jnp.concatenate([qb, kb, vb]) if qb is not None else None
        )
        qkv = Linear(jnp.concatenate([qw, kw, vw], axis=1), bias)
        o = Linear(W(f"{p}.self_attn.o_proj.weight"),
                   maybe_bias(f"{p}.self_attn.o_proj"))
        if cfg.is_moe:
            E = cfg.num_local_experts
            gus, dns = [], []
            for e in range(E):
                g = W(f"{p}.block_sparse_moe.experts.{e}.w1.weight")
                u = W(f"{p}.block_sparse_moe.experts.{e}.w3.weight")
                gus.append(jnp.concatenate([g, u], axis=1))
                dns.append(W(f"{p}.block_sparse_moe.experts.{e}.w2.weight"))
            mlp = MoEParams(
                router=Linear(W(f"{p}.block_sparse_moe.gate.weight")),
                gate_up_proj=Linear(jnp.stack(gus)),
                down_proj=Linear(jnp.stack(dns)),
            )
        else:
            gate = W(f"{p}.mlp.gate_proj.weight")
            up = W(f"{p}.mlp.up_proj.weight")
            mlp = MLPParams(
                gate_up_proj=Linear(jnp.concatenate([gate, up], axis=1)),
                down_proj=Linear(W(f"{p}.mlp.down_proj.weight")),
            )
        blocks.append(
            BlockParams(
                attn_norm=V(f"{p}.input_layernorm.weight"),
                attn=AttentionParams(qkv_proj=qkv, o_proj=o),
                mlp_norm=V(f"{p}.post_attention_layernorm.weight"),
                mlp=mlp,
            )
        )

    embed = V("model.embed_tokens.weight")
    if cfg.tie_word_embeddings or "lm_head.weight" not in raw:
        lm_head = Linear(embed.T)
    else:
        lm_head = Linear(W("lm_head.weight"))
    cos, sin = rope_table(
        cfg.max_position_embeddings, cfg.head_dim, cfg.rope_theta
    )
    return (
        ModelParams(
            embed=embed,
            blocks=blocks,
            final_norm=V("model.norm.weight"),
            lm_head=lm_head,
            rope_cos=cos,
            rope_sin=sin,
        ),
        cfg,
    )


# ---------------------------------------------------------------------------
# AutoAWQ quantized checkpoint import (GEMM layout)
# ---------------------------------------------------------------------------

def load_autoawq(model_dir: str) -> Tuple[ModelParams, ModelConfig, QuantConfig]:
    """Convert an AutoAWQ GEMM-layout quantized checkpoint to QTPU params.

    AutoAWQ stores per linear: qweight int32 [K, N//8] (AWQ column
    interleave), qzeros int32 [K//G, N//8], scales fp16 [K//G, N]
    (reference quick/awq/modules/linear/gemm.py:14-36). Exllama/GPTQ-layout
    checkpoints (version "exllama"/"exllamav2": qweight row-packed
    [K//8, N], qzeros column-packed minus-one) convert through
    import_exllama (reference linear/exllama.py:15-136 repack path)."""
    from quick_tpu.quantize.packing import import_awq_gemm, import_exllama

    with open(os.path.join(model_dir, "config.json")) as f:
        hf_cfg = json.load(f)
    cfg = ModelConfig.from_hf_config(hf_cfg)
    qcfg = QuantConfig.from_pretrained(model_dir)
    G = qcfg.q_group_size
    exllama = qcfg.version.lower().startswith("exllama")
    raw: Dict[str, np.ndarray] = dict(_hf_tensor_iter(model_dir))

    def qlin(base: str) -> QuantLinear:
        importer = import_exllama if exllama else import_awq_gemm
        qw, s, zs = importer(
            raw.pop(base + ".qweight"),
            raw.pop(base + ".qzeros"),
            raw.pop(base + ".scales").astype(np.float32),
            G,
        )
        b = raw.pop(base + ".bias", None)
        return QuantLinear(
            qweight=jnp.asarray(qw),
            scales=jnp.asarray(s),
            zeros_x_scales=jnp.asarray(zs),
            bias=None if b is None else jnp.asarray(b.astype(np.float32)),
            group_size=G,
        )

    def cat_qlin(lins: List[QuantLinear]) -> QuantLinear:
        from quick_tpu.modules.linear import concat_linears

        return concat_linears(*lins)

    def V(key):
        return jnp.asarray(raw.pop(key)).astype(jnp.bfloat16)

    def W(key):
        t = raw.pop(key)
        return jnp.asarray(np.ascontiguousarray(np.swapaxes(t, -1, -2))).astype(jnp.bfloat16)

    blocks = []
    for i in range(cfg.num_hidden_layers):
        p = f"model.layers.{i}"
        qkv = cat_qlin([
            qlin(f"{p}.self_attn.q_proj"),
            qlin(f"{p}.self_attn.k_proj"),
            qlin(f"{p}.self_attn.v_proj"),
        ])
        o = qlin(f"{p}.self_attn.o_proj")
        gate_up = cat_qlin([
            qlin(f"{p}.mlp.gate_proj"),
            qlin(f"{p}.mlp.up_proj"),
        ])
        down = qlin(f"{p}.mlp.down_proj")
        blocks.append(
            BlockParams(
                attn_norm=V(f"{p}.input_layernorm.weight"),
                attn=AttentionParams(qkv_proj=qkv, o_proj=o),
                mlp_norm=V(f"{p}.post_attention_layernorm.weight"),
                mlp=MLPParams(gate_up_proj=gate_up, down_proj=down),
            )
        )
    embed = V("model.embed_tokens.weight")
    lm_head = (
        Linear(W("lm_head.weight")) if "lm_head.weight" in raw
        else Linear(embed.T)
    )
    cos, sin = rope_table(
        cfg.max_position_embeddings, cfg.head_dim, cfg.rope_theta
    )
    params = ModelParams(
        embed=embed,
        blocks=blocks,
        final_norm=V("model.norm.weight"),
        lm_head=lm_head,
        rope_cos=cos,
        rope_sin=sin,
    )
    return params, cfg, qcfg
