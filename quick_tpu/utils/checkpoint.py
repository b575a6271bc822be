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
from quick_tpu.ops.rope import local_rope_tables, rope_table

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
        if blk.attn_norm is not None:
            out[f"{p}.attn_norm"] = np.asarray(blk.attn_norm)
        if blk.attn_norm_bias is not None:
            out[f"{p}.attn_norm_bias"] = np.asarray(blk.attn_norm_bias)
        if blk.mlp_norm is not None:
            out[f"{p}.mlp_norm"] = np.asarray(blk.mlp_norm)
        if blk.mlp_norm_bias is not None:
            out[f"{p}.mlp_norm_bias"] = np.asarray(blk.mlp_norm_bias)
        if hasattr(blk.attn, "kv_a_proj"):  # deepseek MLA
            _lin_to_flat(f"{p}.attn.q", blk.attn.q_proj, out)
            _lin_to_flat(f"{p}.attn.kv_a", blk.attn.kv_a_proj, out)
            _lin_to_flat(f"{p}.attn.kv_b", blk.attn.kv_b_proj, out)
            _lin_to_flat(f"{p}.attn.o", blk.attn.o_proj, out)
            out[f"{p}.attn.kv_a_norm"] = np.asarray(blk.attn.kv_a_norm)
            if blk.attn.q_b_proj is not None:
                _lin_to_flat(f"{p}.attn.q_b", blk.attn.q_b_proj, out)
                out[f"{p}.attn.q_a_norm"] = np.asarray(blk.attn.q_a_norm)
        else:
            _lin_to_flat(f"{p}.attn.qkv", blk.attn.qkv_proj, out)
            _lin_to_flat(f"{p}.attn.o", blk.attn.o_proj, out)
        if getattr(blk.attn, "q_norm", None) is not None:
            out[f"{p}.attn.q_norm"] = np.asarray(blk.attn.q_norm)
            out[f"{p}.attn.k_norm"] = np.asarray(blk.attn.k_norm)
        if blk.attn_post_norm is not None:
            out[f"{p}.attn_post_norm"] = np.asarray(blk.attn_post_norm)
        if blk.mlp_post_norm is not None:
            out[f"{p}.mlp_post_norm"] = np.asarray(blk.mlp_post_norm)
        if isinstance(blk.mlp, MoEParams):
            _lin_to_flat(f"{p}.mlp.router", blk.mlp.router, out)
            _lin_to_flat(f"{p}.mlp.gate_up", blk.mlp.gate_up_proj, out)
            _lin_to_flat(f"{p}.mlp.down", blk.mlp.down_proj, out)
            if blk.mlp.shared_gate_up is not None:
                _lin_to_flat(
                    f"{p}.mlp.shared_gate_up", blk.mlp.shared_gate_up, out
                )
                _lin_to_flat(f"{p}.mlp.shared_down", blk.mlp.shared_down, out)
            if blk.mlp.shared_gate is not None:
                _lin_to_flat(f"{p}.mlp.shared_gate", blk.mlp.shared_gate, out)
            if blk.mlp.score_bias is not None:
                out[f"{p}.mlp.score_bias"] = np.asarray(blk.mlp.score_bias)
        else:
            _lin_to_flat(f"{p}.mlp.gate_up", blk.mlp.gate_up_proj, out)
            _lin_to_flat(f"{p}.mlp.down", blk.mlp.down_proj, out)
            if blk.mlp.act_scale is not None:
                out[f"{p}.mlp.act_scale"] = np.asarray(blk.mlp.act_scale)
    out["final_norm"] = np.asarray(params.final_norm)
    if params.final_norm_bias is not None:
        out["final_norm_bias"] = np.asarray(params.final_norm_bias)
    if params.pos_embed is not None:
        out["pos_embed"] = np.asarray(params.pos_embed)
    if params.embed_norm is not None:
        out["embed_norm"] = np.asarray(params.embed_norm)
    if params.embed_norm_bias is not None:
        out["embed_norm_bias"] = np.asarray(params.embed_norm_bias)
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
        if f"{p}.attn.kv_a_norm" in flat:  # deepseek MLA
            from quick_tpu.modules.mla import MLAParams

            attn = MLAParams(
                q_proj=_flat_to_lin(f"{p}.attn.q", flat, group_size),
                kv_a_proj=_flat_to_lin(f"{p}.attn.kv_a", flat, group_size),
                kv_a_norm=jnp.asarray(flat[f"{p}.attn.kv_a_norm"]),
                kv_b_proj=_flat_to_lin(f"{p}.attn.kv_b", flat, group_size),
                o_proj=_flat_to_lin(f"{p}.attn.o", flat, group_size),
                q_b_proj=(
                    _flat_to_lin(f"{p}.attn.q_b", flat, group_size)
                    if f"{p}.attn.q_b.weight" in flat
                    or f"{p}.attn.q_b.qweight" in flat else None
                ),
                q_a_norm=(
                    jnp.asarray(flat[f"{p}.attn.q_a_norm"])
                    if f"{p}.attn.q_a_norm" in flat else None
                ),
            )
        else:
            attn = AttentionParams(
                qkv_proj=_flat_to_lin(f"{p}.attn.qkv", flat, group_size),
                o_proj=_flat_to_lin(f"{p}.attn.o", flat, group_size),
                q_norm=(
                    jnp.asarray(flat[f"{p}.attn.q_norm"])
                    if f"{p}.attn.q_norm" in flat else None
                ),
                k_norm=(
                    jnp.asarray(flat[f"{p}.attn.k_norm"])
                    if f"{p}.attn.k_norm" in flat else None
                ),
            )
        if f"{p}.mlp.router.weight" in flat:
            mlp = MoEParams(
                router=_flat_to_lin(f"{p}.mlp.router", flat, group_size),
                gate_up_proj=_flat_to_lin(f"{p}.mlp.gate_up", flat, group_size),
                down_proj=_flat_to_lin(f"{p}.mlp.down", flat, group_size),
                shared_gate_up=(
                    _flat_to_lin(f"{p}.mlp.shared_gate_up", flat, group_size)
                    if f"{p}.mlp.shared_gate_up.weight" in flat
                    or f"{p}.mlp.shared_gate_up.qweight" in flat else None
                ),
                shared_down=(
                    _flat_to_lin(f"{p}.mlp.shared_down", flat, group_size)
                    if f"{p}.mlp.shared_down.weight" in flat
                    or f"{p}.mlp.shared_down.qweight" in flat else None
                ),
                score_bias=(
                    jnp.asarray(flat[f"{p}.mlp.score_bias"])
                    if f"{p}.mlp.score_bias" in flat else None
                ),
                shared_gate=(
                    _flat_to_lin(f"{p}.mlp.shared_gate", flat, group_size)
                    if f"{p}.mlp.shared_gate.weight" in flat else None
                ),
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
                attn_norm=(
                    jnp.asarray(flat[f"{p}.attn_norm"])
                    if f"{p}.attn_norm" in flat else None
                ),
                attn=attn,
                mlp_norm=(
                    jnp.asarray(flat[f"{p}.mlp_norm"])
                    if f"{p}.mlp_norm" in flat else None
                ),
                mlp=mlp,
                attn_norm_bias=(
                    jnp.asarray(flat[f"{p}.attn_norm_bias"])
                    if f"{p}.attn_norm_bias" in flat else None
                ),
                mlp_norm_bias=(
                    jnp.asarray(flat[f"{p}.mlp_norm_bias"])
                    if f"{p}.mlp_norm_bias" in flat else None
                ),
                attn_post_norm=(
                    jnp.asarray(flat[f"{p}.attn_post_norm"])
                    if f"{p}.attn_post_norm" in flat else None
                ),
                mlp_post_norm=(
                    jnp.asarray(flat[f"{p}.mlp_post_norm"])
                    if f"{p}.mlp_post_norm" in flat else None
                ),
            )
        )
    cos, sin = rope_table(
        cfg.max_position_embeddings, cfg.rotary_dim or cfg.head_dim,
        cfg.rope_theta, cfg.rope_scaling,
    )
    opt = lambda k: jnp.asarray(flat[k]) if k in flat else None
    lcos, lsin = local_rope_tables(cfg)
    return ModelParams(
        embed=jnp.asarray(flat["embed"]),
        blocks=blocks,
        final_norm=jnp.asarray(flat["final_norm"]),
        lm_head=_flat_to_lin("lm_head", flat, group_size),
        rope_cos=cos,
        rope_sin=sin,
        final_norm_bias=opt("final_norm_bias"),
        pos_embed=opt("pos_embed"),
        embed_norm=opt("embed_norm"),
        embed_norm_bias=opt("embed_norm_bias"),
        rope_cos_local=lcos,
        rope_sin_local=lsin,
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


def export_autoawq(
    params: ModelParams,
    cfg: ModelConfig,
    qcfg: QuantConfig,
    save_dir: str,
) -> None:
    """Write an AutoAWQ-GEMM-compatible checkpoint (the reference's
    ``export_compatible`` artifact, models/base.py:123-138 + linear/gemm.py
    layout): per linear ``qweight`` int32 [K, N//8] (AWQ column
    interleave), ``qzeros`` int32 [K//G, N//8], ``scales`` fp16 [K//G, N],
    under HF llama-family tensor names. Loadable by AutoAWQ/vLLM — and by
    :func:`load_autoawq` (round-trip tested).

    Llama-family layouts only (fused qkv/gate_up split back by column
    ranges — params must be UNSHARDED and not TP-permuted)."""
    from safetensors.numpy import save_file

    from quick_tpu.modules.linear import QuantLinear
    from quick_tpu.quantize.packing import export_awq_gemm

    if cfg.is_moe or not cfg.gated_mlp or cfg.layernorm != "rmsnorm":
        raise NotImplementedError(
            "export_autoawq supports the llama-family layout only "
            f"(model_type={cfg.model_type})"
        )
    hq, hkv, hd = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim
    F = cfg.intermediate_size
    store: Dict[str, np.ndarray] = {}

    def f16(x) -> np.ndarray:
        # ascontiguousarray matters: astype keeps order='K', and safetensors
        # serializes the raw buffer — an F-ordered transpose would be
        # silently written untransposed
        return np.ascontiguousarray(np.asarray(x).astype(np.float16))

    def put_qlin(base: str, lin: QuantLinear, col0: int, col1: int) -> None:
        qw = np.asarray(lin.qweight)[:, col0:col1]
        s = np.asarray(lin.scales)[:, col0:col1]
        zs = np.asarray(lin.zeros_x_scales)[:, col0:col1]
        gw, gz, gs = export_awq_gemm(qw, s, zs, lin.group_size)
        store[base + ".qweight"] = gw
        store[base + ".qzeros"] = gz
        store[base + ".scales"] = gs
        if lin.bias is not None:
            store[base + ".bias"] = f16(lin.bias[col0:col1])

    def put_float_linear(base: str, lin) -> None:
        if isinstance(lin, QuantLinear):
            from quick_tpu.quantize.packing import unpack_qtpu

            q = unpack_qtpu(np.asarray(lin.qweight), lin.group_size)
            s = np.asarray(lin.scales)
            zs = np.asarray(lin.zeros_x_scales)
            K = q.shape[0]
            ng = K // lin.group_size
            w = (
                q.astype(np.float32).reshape(ng, lin.group_size, -1) * s[:, None, :]
                - zs[:, None, :]
            ).reshape(K, -1)
        else:
            w = np.asarray(lin.weight, np.float32)
        # HF linear convention is [out, in]
        store[base + ".weight"] = f16(w.T)
        if getattr(lin, "bias", None) is not None:
            store[base + ".bias"] = f16(lin.bias)

    for i, blk in enumerate(params.blocks):
        p = f"model.layers.{i}"
        qkv = blk.attn.qkv_proj
        if not isinstance(qkv, QuantLinear):
            raise ValueError("export_autoawq requires quantized block linears")
        put_qlin(f"{p}.self_attn.q_proj", qkv, 0, hq * hd)
        put_qlin(f"{p}.self_attn.k_proj", qkv, hq * hd, (hq + hkv) * hd)
        put_qlin(
            f"{p}.self_attn.v_proj", qkv, (hq + hkv) * hd, (hq + 2 * hkv) * hd
        )
        put_qlin(f"{p}.self_attn.o_proj", blk.attn.o_proj, 0, cfg.hidden_size)
        put_qlin(f"{p}.mlp.gate_proj", blk.mlp.gate_up_proj, 0, F)
        put_qlin(f"{p}.mlp.up_proj", blk.mlp.gate_up_proj, F, 2 * F)
        put_qlin(f"{p}.mlp.down_proj", blk.mlp.down_proj, 0, cfg.hidden_size)
        store[f"{p}.input_layernorm.weight"] = f16(blk.attn_norm)
        store[f"{p}.post_attention_layernorm.weight"] = f16(blk.mlp_norm)

    store["model.embed_tokens.weight"] = f16(params.embed)
    store["model.norm.weight"] = f16(params.final_norm)
    if not cfg.tie_word_embeddings:
        put_float_linear("lm_head", params.lm_head)

    os.makedirs(save_dir, exist_ok=True)
    save_file(store, os.path.join(save_dir, "model.safetensors"))
    # the artifact IS GEMM-layout — mark it so (both for AutoAWQ itself and
    # for load_autoawq picking the GEMM importer)
    qcfg = dataclasses.replace(qcfg, version="gemm")
    hf_cfg = {
        "model_type": (
            cfg.model_type if cfg.model_type in ("llama", "mistral", "qwen2")
            else "llama"
        ),
        "vocab_size": cfg.vocab_size,
        "hidden_size": cfg.hidden_size,
        "num_hidden_layers": cfg.num_hidden_layers,
        "num_attention_heads": cfg.num_attention_heads,
        "num_key_value_heads": cfg.num_key_value_heads,
        "intermediate_size": cfg.intermediate_size,
        "max_position_embeddings": cfg.max_position_embeddings,
        "rms_norm_eps": cfg.rms_norm_eps,
        "rope_theta": cfg.rope_theta,
        "tie_word_embeddings": cfg.tie_word_embeddings,
        "head_dim": cfg.head_dim,
        "attention_bias": cfg.attention_bias,
        "torch_dtype": "float16",
        "quantization_config": qcfg.to_transformers_dict(),
    }
    if cfg.rope_scaling:
        hf_cfg["rope_scaling"] = dict(cfg.rope_scaling)
    with open(os.path.join(save_dir, "config.json"), "w") as f:
        json.dump(hf_cfg, f, indent=2)
    qcfg.save_pretrained(save_dir)


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


def load_vision_tower(model_dir: str, dtype=jnp.bfloat16):
    """Load the LLaVA CLIP vision tower + projector into VisionParams.

    The reference leaves these as the float HF submodules
    (quick/awq/models/llava.py — only the language tower is quantized);
    here they become a functional JAX tree (modules/vision.py) so the
    whole image+text forward jits on TPU. Returns (VisionParams,
    VisionConfig) or (None, None) when the checkpoint has no
    vision_tower.* tensors (e.g. a language-only re-save)."""
    from quick_tpu.modules.vision import (
        VisionBlockParams, VisionConfig, VisionParams,
    )
    from quick_tpu.modules.linear import Linear

    with open(os.path.join(model_dir, "config.json")) as f:
        hf = json.load(f)
    vcfg = VisionConfig.from_hf_config(hf)
    raw = _LazyRaw(model_dir, include_all=True)
    pre = "vision_tower.vision_model."
    if pre + "embeddings.class_embedding" not in raw:
        return None, None

    def W(key):  # HF [out, in] -> [in, out]
        t = raw.pop(key)
        return jnp.asarray(np.ascontiguousarray(np.swapaxes(t, -1, -2))).astype(dtype)

    def V(key, vdtype=jnp.float32):
        return jnp.asarray(raw.pop(key)).astype(vdtype)

    def lin(base):
        return Linear(W(base + ".weight"), V(base + ".bias", dtype))

    blocks = []
    for i in range(vcfg.num_hidden_layers):
        b = pre + f"encoder.layers.{i}."
        qkv = Linear(
            jnp.concatenate(
                [W(b + f"self_attn.{n}_proj.weight") for n in "qkv"], axis=1
            ),
            jnp.concatenate(
                [V(b + f"self_attn.{n}_proj.bias", dtype) for n in "qkv"]
            ),
        )
        blocks.append(VisionBlockParams(
            ln1=V(b + "layer_norm1.weight"),
            ln1_bias=V(b + "layer_norm1.bias"),
            qkv=qkv,
            o=lin(b + "self_attn.out_proj"),
            ln2=V(b + "layer_norm2.weight"),
            ln2_bias=V(b + "layer_norm2.bias"),
            fc1=lin(b + "mlp.fc1"),
            fc2=lin(b + "mlp.fc2"),
        ))
    # conv kernel [D, 3, p, p] -> matmul [3*p*p, D], flatten order (c,ph,pw)
    # matching vision_forward's patch extraction
    ck = raw.pop(pre + "embeddings.patch_embedding.weight")
    D = ck.shape[0]
    patch = jnp.asarray(
        np.ascontiguousarray(ck.reshape(D, -1).T)
    ).astype(dtype)
    return VisionParams(
        patch_embed=patch,
        class_embed=V(pre + "embeddings.class_embedding", dtype),
        pos_embed=V(pre + "embeddings.position_embedding.weight", dtype),
        pre_ln=V(pre + "pre_layrnorm.weight"),       # HF's spelling
        pre_ln_bias=V(pre + "pre_layrnorm.bias"),
        blocks=blocks,
        proj1=lin("multi_modal_projector.linear_1"),
        proj2=lin("multi_modal_projector.linear_2"),
    ), vcfg


def save_vision_tower(src_dir: str, save_dir: str) -> bool:
    """Copy a multimodal checkpoint's float vision tensors (vision_tower.*,
    multi_modal_projector.*) into ``save_dir/vision.safetensors`` and merge
    the vision fields into its config.json, so ``from_quantized`` round-trips
    image support. Returns False when the source has no vision tower."""
    from safetensors.numpy import save_file

    raw = _LazyRaw(src_dir, include_all=True)
    keys = [
        k for k in raw.keys()
        if k.startswith(("vision_tower.", "multi_modal_projector."))
    ]
    if not keys:
        return False
    save_file(
        {k: np.ascontiguousarray(raw[k]) for k in keys},
        os.path.join(save_dir, "vision.safetensors"),
    )
    with open(os.path.join(src_dir, "config.json")) as f:
        src_cfg = json.load(f)
    cfg_path = os.path.join(save_dir, "config.json")
    with open(cfg_path) as f:
        out_cfg = json.load(f)
    for field in (
        "vision_config", "image_token_index", "vision_feature_layer",
        "vision_feature_select_strategy",
    ):
        if field in src_cfg:
            out_cfg[field] = src_cfg[field]
    with open(cfg_path, "w") as f:
        json.dump(out_cfg, f, indent=2)
    return True


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


class _LazyRaw:
    """Mapping over a safetensors checkpoint that loads each tensor on
    first access (the streaming contract: a dict-of-everything doubles
    peak host RAM on 70B-class imports — raw copy + converted params).
    Supports the subset of the dict API the importers use: ``in``,
    ``pop``, ``[]``, ``get``, ``items``/``keys``."""

    def __init__(self, model_dir: str, include_all: bool = False):
        from safetensors import safe_open

        self._dir = model_dir
        self._safe_open = safe_open
        self._where: Dict[str, str] = {}
        index_path = os.path.join(model_dir, "model.safetensors.index.json")
        if os.path.exists(index_path) and not include_all:
            with open(index_path) as f:
                files = sorted(set(json.load(f)["weight_map"].values()))
        else:
            # include_all: side-car files (e.g. vision.safetensors) live
            # outside the LM weight index
            files = sorted(
                f for f in os.listdir(model_dir)
                if f.endswith(".safetensors")
            )
        for fname in files:
            with safe_open(
                os.path.join(model_dir, fname), framework="np"
            ) as f:
                for key in f.keys():
                    self._where[key] = fname
        self._open: Dict[str, object] = {}
        self._mem: Dict[str, np.ndarray] = {}

    def _load(self, key: str) -> np.ndarray:
        if key in self._mem:
            return self._mem[key]
        fname = self._where[key]
        if fname not in self._open:
            self._open[fname] = self._safe_open(
                os.path.join(self._dir, fname), framework="np"
            )
        return self._open[fname].get_tensor(key)

    def __contains__(self, key) -> bool:
        return key in self._mem or key in self._where

    def __getitem__(self, key) -> np.ndarray:
        if key not in self:
            raise KeyError(key)
        return self._load(key)

    def __setitem__(self, key, value) -> None:
        # importer-side overrides (e.g. gemma's zero-centered-norm +1 fold)
        self._mem[key] = value
        self._where.pop(key, None)

    def __iter__(self):
        yield from self.keys()

    def __len__(self) -> int:
        return len(self._mem) + len(self._where)

    def get(self, key, default=None):
        return self._load(key) if key in self else default

    def pop(self, key, *default):
        if key in self._mem:
            return self._mem.pop(key)
        if key not in self._where:
            if default:
                return default[0]
            raise KeyError(key)
        t = self._load(key)
        del self._where[key]
        return t

    def keys(self):
        yield from self._mem
        yield from self._where

    def items(self):
        for key in list(self.keys()):
            yield key, self._load(key)


def load_hf_float(model_dir: str, dtype=jnp.bfloat16) -> Tuple[ModelParams, ModelConfig]:
    """Import an HF float checkpoint into ModelParams, fusing q/k/v and
    gate/up offline. Dispatches on model_type: the Llama family
    (Llama/Mistral/Qwen2/Yi/Vicuna/Aquila/Mixtral) shares one layout;
    mpt/falcon/gpt_neox/gptj/opt/bloom/gpt_bigcode/baichuan/qwen each get a
    schema importer (the analog of the reference's 15 per-arch adapter
    classes, quick/awq/models/*.py)."""
    with open(os.path.join(model_dir, "config.json")) as f:
        hf_cfg = json.load(f)
    cfg = ModelConfig.from_hf_config(hf_cfg)

    raw = _LazyRaw(model_dir)  # tensor-at-a-time (70B-class fits host RAM)
    importer = _HF_IMPORTERS.get(cfg.model_type)
    if importer is None:
        # generic llama-schema fallback: unmapped types that are llama
        # clones with a new model_type string import fine (the analog of
        # the reference's run-anything-through-transformers path,
        # reference models/base.py:241-335); anything else fails with the
        # missing tensor named instead of a bare KeyError
        from quick_tpu.models.auto import MODEL_TYPE_MAP

        try:
            return _import_llama_family(raw, cfg, dtype), cfg
        except KeyError as e:
            if cfg.model_type in MODEL_TYPE_MAP:
                raise  # mapped llama-family type: a real missing tensor
            raise NotImplementedError(
                f"model_type '{cfg.model_type}' has no schema importer "
                f"and its checkpoint does not match the generic llama "
                f"schema (missing tensor {e}). Add an importer to "
                f"utils/checkpoint.py::_HF_IMPORTERS."
            ) from None
    return importer(raw, cfg, dtype), cfg


def _import_llama_family(
    raw: Dict[str, np.ndarray], cfg: ModelConfig, dtype
) -> ModelParams:
    L = cfg.num_hidden_layers

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
        # qwen3-style per-head q/k RMSNorm weights (cfg.use_qk_norm)
        qn = (
            V(f"{p}.self_attn.q_norm.weight")
            if f"{p}.self_attn.q_norm.weight" in raw else None
        )
        kn = (
            V(f"{p}.self_attn.k_norm.weight")
            if f"{p}.self_attn.k_norm.weight" in raw else None
        )
        if cfg.is_moe and f"{p}.block_sparse_moe.gate.weight" in raw:
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
        elif cfg.is_moe and f"{p}.mlp.gate.weight" in raw:
            # qwen2_moe / qwen3_moe (HF modeling_qwen*_moe): experts under
            # mlp.experts.N.{gate,up,down}_proj; qwen2 adds a shared expert
            # plus the [1, D] shared_expert_gate whose sigmoid scales it
            E = cfg.num_local_experts
            gus, dns = [], []
            for e in range(E):
                g = W(f"{p}.mlp.experts.{e}.gate_proj.weight")
                u = W(f"{p}.mlp.experts.{e}.up_proj.weight")
                gus.append(jnp.concatenate([g, u], axis=1))
                dns.append(W(f"{p}.mlp.experts.{e}.down_proj.weight"))
            shared_gu = shared_dn = shared_gate = None
            if f"{p}.mlp.shared_expert.gate_proj.weight" in raw:
                sg = W(f"{p}.mlp.shared_expert.gate_proj.weight")
                su = W(f"{p}.mlp.shared_expert.up_proj.weight")
                shared_gu = Linear(jnp.concatenate([sg, su], axis=1))
                shared_dn = Linear(
                    W(f"{p}.mlp.shared_expert.down_proj.weight")
                )
                shared_gate = Linear(
                    W(f"{p}.mlp.shared_expert_gate.weight")  # [D, 1]
                )
            mlp = MoEParams(
                router=Linear(W(f"{p}.mlp.gate.weight")),
                gate_up_proj=Linear(jnp.stack(gus)),
                down_proj=Linear(jnp.stack(dns)),
                shared_gate_up=shared_gu,
                shared_down=shared_dn,
                shared_gate=shared_gate,
            )
        else:
            gate = W(f"{p}.mlp.gate_proj.weight")
            up = W(f"{p}.mlp.up_proj.weight")
            mlp = MLPParams(
                gate_up_proj=Linear(jnp.concatenate([gate, up], axis=1)),
                down_proj=Linear(W(f"{p}.mlp.down_proj.weight")),
            )
        if f"{p}.pre_feedforward_layernorm.weight" in raw:
            # gemma2 sandwich norms: HF's "post_attention_layernorm" is the
            # attention OUTPUT norm here, and the MLP gets its own pre/post
            # pair (modeling_gemma2.Gemma2DecoderLayer)
            blocks.append(
                BlockParams(
                    attn_norm=V(f"{p}.input_layernorm.weight"),
                    attn=AttentionParams(qkv_proj=qkv, o_proj=o,
                                         q_norm=qn, k_norm=kn),
                    mlp_norm=V(f"{p}.pre_feedforward_layernorm.weight"),
                    mlp=mlp,
                    attn_post_norm=V(f"{p}.post_attention_layernorm.weight"),
                    mlp_post_norm=V(f"{p}.post_feedforward_layernorm.weight"),
                )
            )
            continue
        blocks.append(
            BlockParams(
                attn_norm=V(f"{p}.input_layernorm.weight"),
                attn=AttentionParams(qkv_proj=qkv, o_proj=o,
                                     q_norm=qn, k_norm=kn),
                mlp_norm=V(f"{p}.post_attention_layernorm.weight"),
                mlp=mlp,
                # stablelm-style LayerNorm biases (absent for RMSNorm families)
                attn_norm_bias=maybe_bias(f"{p}.input_layernorm"),
                mlp_norm_bias=maybe_bias(f"{p}.post_attention_layernorm"),
            )
        )

    embed = V("model.embed_tokens.weight")
    if cfg.tie_word_embeddings or "lm_head.weight" not in raw:
        lm_head = Linear(embed.T)
    else:
        lm_head = Linear(W("lm_head.weight"))
    cos, sin = rope_table(
        cfg.max_position_embeddings, cfg.rotary_dim or cfg.head_dim,
        cfg.rope_theta, cfg.rope_scaling,
    )
    lcos, lsin = local_rope_tables(cfg)
    return ModelParams(
        embed=embed,
        blocks=blocks,
        final_norm=V("model.norm.weight"),
        lm_head=lm_head,
        rope_cos=cos,
        rope_sin=sin,
        rope_cos_local=lcos,
        rope_sin_local=lsin,
        final_norm_bias=maybe_bias("model.norm"),
    )


# ---------------------------------------------------------------------------
# Non-llama HF family importers
# ---------------------------------------------------------------------------

def _mk_wv(raw: Dict[str, np.ndarray], dtype):
    """(W, V, maybe_bias) helpers bound to one raw tensor dict."""

    def W(key):  # HF linear [out, in] -> ours [in, out]
        t = raw.pop(key)
        return jnp.asarray(
            np.ascontiguousarray(np.swapaxes(t, -1, -2))
        ).astype(dtype)

    def V(key):
        return jnp.asarray(raw.pop(key)).astype(dtype)

    def B(base):
        k = base + ".bias"
        return V(k) if k in raw else None

    return W, V, B


def _deinterleave_qkv(w, b, hq: int, hkv: int, hd: int):
    """HF per-head-fused qkv (columns ordered [H, 3, hd] — gpt-neox/bloom
    convention) -> straight [q | k | v] concat (ours). MHA only
    (hq == hkv for these families)."""
    D = w.shape[0]
    w3 = w.reshape(D, hq, 3, hd)
    wq = w3[:, :, 0].reshape(D, hq * hd)
    wk = w3[:, :, 1].reshape(D, hq * hd)
    wv = w3[:, :, 2].reshape(D, hq * hd)
    out_w = jnp.concatenate([wq, wk, wv], axis=1)
    out_b = None
    if b is not None:
        b3 = b.reshape(hq, 3, hd)
        out_b = jnp.concatenate(
            [b3[:, 0].reshape(-1), b3[:, 1].reshape(-1), b3[:, 2].reshape(-1)]
        )
    return out_w, out_b


def _degroup_falcon_qkv(w, hq: int, hkv: int, hd: int):
    """Falcon new-decoder fused qkv (columns [kv_groups, q_per_group+2, hd])
    -> straight [q | k | v]."""
    D = w.shape[0]
    g = hq // hkv
    w4 = w.reshape(D, hkv, g + 2, hd)
    wq = w4[:, :, :g].reshape(D, hq * hd)
    wk = w4[:, :, g].reshape(D, hkv * hd)
    wv = w4[:, :, g + 1].reshape(D, hkv * hd)
    return jnp.concatenate([wq, wk, wv], axis=1)


def _gptj_rope_permute(w, hq: int, hd: int, rotary_dim: int):
    """Permute q/k output channels so GPT-J's interleaved rotary convention
    becomes rotate-half: within the rotary dims of each head, channel order
    [0,2,4,...,1,3,5,...]. Scores are invariant because q and k get the same
    permutation."""
    r = rotary_dim
    perm = np.concatenate(
        [np.arange(0, r, 2), np.arange(1, r, 2), np.arange(r, hd)]
    )
    D = w.shape[0]
    wh = w.reshape(D, hq, hd)
    return wh[:, :, perm].reshape(D, hq * hd)


def _import_mpt(raw, cfg: ModelConfig, dtype) -> ModelParams:
    """MPT: transformer.blocks.{i}.{norm_1, attn.Wqkv, attn.out_proj,
    norm_2, ffn.up_proj, ffn.down_proj} (reference models/mpt.py)."""
    W, V, B = _mk_wv(raw, dtype)
    D = cfg.hidden_size
    blocks = []
    for i in range(cfg.num_hidden_layers):
        p = f"transformer.blocks.{i}"
        qkv = Linear(W(f"{p}.attn.Wqkv.weight"), B(f"{p}.attn.Wqkv"))
        blocks.append(
            BlockParams(
                attn_norm=V(f"{p}.norm_1.weight"),
                attn_norm_bias=B(f"{p}.norm_1"),
                attn=AttentionParams(
                    qkv_proj=qkv,
                    o_proj=Linear(
                        W(f"{p}.attn.out_proj.weight"), B(f"{p}.attn.out_proj")
                    ),
                ),
                mlp_norm=V(f"{p}.norm_2.weight"),
                mlp_norm_bias=B(f"{p}.norm_2"),
                mlp=MLPParams(
                    gate_up_proj=Linear(
                        W(f"{p}.ffn.up_proj.weight"), B(f"{p}.ffn.up_proj")
                    ),
                    down_proj=Linear(
                        W(f"{p}.ffn.down_proj.weight"), B(f"{p}.ffn.down_proj")
                    ),
                ),
            )
        )
    embed = V("transformer.wte.weight")
    cos, sin = rope_table(
        cfg.max_position_embeddings, cfg.rotary_dim or cfg.head_dim,
        cfg.rope_theta, cfg.rope_scaling,
    )
    return ModelParams(
        embed=embed,
        blocks=blocks,
        final_norm=V("transformer.norm_f.weight"),
        final_norm_bias=B("transformer.norm_f"),
        lm_head=Linear(embed.T),  # MPT ties embeddings
        rope_cos=cos,
        rope_sin=sin,
    )


def _import_falcon(raw, cfg: ModelConfig, dtype) -> ModelParams:
    """Falcon: transformer.h.{i}.{input_layernorm | ln_attn/ln_mlp,
    self_attention.query_key_value, self_attention.dense, mlp.dense_h_to_4h,
    mlp.dense_4h_to_h} (reference models/falcon.py)."""
    W, V, B = _mk_wv(raw, dtype)
    hq, hkv, hd = (
        cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim
    )
    blocks = []
    for i in range(cfg.num_hidden_layers):
        p = f"transformer.h.{i}"
        new_arch = f"{p}.ln_attn.weight" in raw
        wqkv = W(f"{p}.self_attention.query_key_value.weight")
        qkv_bias = B(f"{p}.self_attention.query_key_value")
        if new_arch or hkv not in (1, hq):
            # new decoder architecture: per-kv-group [q_per_group, k, v]
            wqkv = _degroup_falcon_qkv(wqkv, hq, hkv, hd)
        elif hkv == hq:
            # old arch, multi_query=False (falcon-rw): per-head interleaved
            # [H, 3, hd] like gpt-neox (HF FalconAttention._split_heads);
            # the BIAS is interleaved the same way
            wqkv, qkv_bias = _deinterleave_qkv(wqkv, qkv_bias, hq, hkv, hd)
        # else old-arch multi_query (falcon-7b): already [q... | k | v]
        if new_arch:
            a_n, a_b = V(f"{p}.ln_attn.weight"), B(f"{p}.ln_attn")
            m_n, m_b = V(f"{p}.ln_mlp.weight"), B(f"{p}.ln_mlp")
        else:
            a_n, a_b = V(f"{p}.input_layernorm.weight"), B(f"{p}.input_layernorm")
            if f"{p}.post_attention_layernorm.weight" in raw:
                m_n = V(f"{p}.post_attention_layernorm.weight")
                m_b = B(f"{p}.post_attention_layernorm")
            else:  # parallel_attn: one shared norm — duplicate it
                m_n, m_b = a_n, a_b
        blocks.append(
            BlockParams(
                attn_norm=a_n, attn_norm_bias=a_b,
                attn=AttentionParams(
                    qkv_proj=Linear(wqkv, qkv_bias),
                    o_proj=Linear(
                        W(f"{p}.self_attention.dense.weight"),
                        B(f"{p}.self_attention.dense"),
                    ),
                ),
                mlp_norm=m_n, mlp_norm_bias=m_b,
                mlp=MLPParams(
                    gate_up_proj=Linear(
                        W(f"{p}.mlp.dense_h_to_4h.weight"),
                        B(f"{p}.mlp.dense_h_to_4h"),
                    ),
                    down_proj=Linear(
                        W(f"{p}.mlp.dense_4h_to_h.weight"),
                        B(f"{p}.mlp.dense_4h_to_h"),
                    ),
                ),
            )
        )
    embed = V("transformer.word_embeddings.weight")
    cos, sin = rope_table(
        cfg.max_position_embeddings, cfg.rotary_dim or cfg.head_dim,
        cfg.rope_theta, cfg.rope_scaling,
    )
    lm_head = (
        Linear(W("lm_head.weight")) if "lm_head.weight" in raw
        else Linear(embed.T)
    )
    return ModelParams(
        embed=embed,
        blocks=blocks,
        final_norm=V("transformer.ln_f.weight"),
        final_norm_bias=B("transformer.ln_f"),
        lm_head=lm_head,
        rope_cos=cos,
        rope_sin=sin,
    )


def _import_gpt_neox(raw, cfg: ModelConfig, dtype) -> ModelParams:
    """GPT-NeoX/Pythia: gpt_neox.layers.{i}.{input_layernorm,
    attention.query_key_value (per-head interleaved), attention.dense,
    post_attention_layernorm, mlp.dense_h_to_4h, mlp.dense_4h_to_h}
    (reference models/gpt_neox.py)."""
    W, V, B = _mk_wv(raw, dtype)
    hq, hkv, hd = (
        cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim
    )
    blocks = []
    for i in range(cfg.num_hidden_layers):
        p = f"gpt_neox.layers.{i}"
        wqkv, bqkv = _deinterleave_qkv(
            W(f"{p}.attention.query_key_value.weight"),
            B(f"{p}.attention.query_key_value"),
            hq, hkv, hd,
        )
        blocks.append(
            BlockParams(
                attn_norm=V(f"{p}.input_layernorm.weight"),
                attn_norm_bias=B(f"{p}.input_layernorm"),
                attn=AttentionParams(
                    qkv_proj=Linear(wqkv, bqkv),
                    o_proj=Linear(
                        W(f"{p}.attention.dense.weight"),
                        B(f"{p}.attention.dense"),
                    ),
                ),
                mlp_norm=V(f"{p}.post_attention_layernorm.weight"),
                mlp_norm_bias=B(f"{p}.post_attention_layernorm"),
                mlp=MLPParams(
                    gate_up_proj=Linear(
                        W(f"{p}.mlp.dense_h_to_4h.weight"),
                        B(f"{p}.mlp.dense_h_to_4h"),
                    ),
                    down_proj=Linear(
                        W(f"{p}.mlp.dense_4h_to_h.weight"),
                        B(f"{p}.mlp.dense_4h_to_h"),
                    ),
                ),
            )
        )
    embed = V("gpt_neox.embed_in.weight")
    cos, sin = rope_table(
        cfg.max_position_embeddings, cfg.rotary_dim or cfg.head_dim,
        cfg.rope_theta, cfg.rope_scaling,
    )
    lm_head = (
        Linear(W("embed_out.weight")) if "embed_out.weight" in raw
        else Linear(embed.T)
    )
    return ModelParams(
        embed=embed,
        blocks=blocks,
        final_norm=V("gpt_neox.final_layer_norm.weight"),
        final_norm_bias=B("gpt_neox.final_layer_norm"),
        lm_head=lm_head,
        rope_cos=cos,
        rope_sin=sin,
    )


def _import_gptj(raw, cfg: ModelConfig, dtype) -> ModelParams:
    """GPT-J: transformer.h.{i}.{ln_1 (shared), attn.{q,k,v,out}_proj,
    mlp.fc_in, mlp.fc_out}; interleaved rotary converted to rotate-half by
    channel permutation (reference models/gptj.py)."""
    W, V, B = _mk_wv(raw, dtype)
    hq, hd = cfg.num_attention_heads, cfg.head_dim
    r = cfg.rotary_dim or hd
    blocks = []
    for i in range(cfg.num_hidden_layers):
        p = f"transformer.h.{i}"
        wq = _gptj_rope_permute(W(f"{p}.attn.q_proj.weight"), hq, hd, r)
        wk = _gptj_rope_permute(W(f"{p}.attn.k_proj.weight"), hq, hd, r)
        wv = W(f"{p}.attn.v_proj.weight")
        ln1, ln1b = V(f"{p}.ln_1.weight"), B(f"{p}.ln_1")
        blocks.append(
            BlockParams(
                attn_norm=ln1, attn_norm_bias=ln1b,
                attn=AttentionParams(
                    qkv_proj=Linear(jnp.concatenate([wq, wk, wv], axis=1)),
                    o_proj=Linear(W(f"{p}.attn.out_proj.weight")),
                ),
                mlp_norm=ln1, mlp_norm_bias=ln1b,  # single shared norm
                mlp=MLPParams(
                    gate_up_proj=Linear(
                        W(f"{p}.mlp.fc_in.weight"), B(f"{p}.mlp.fc_in")
                    ),
                    down_proj=Linear(
                        W(f"{p}.mlp.fc_out.weight"), B(f"{p}.mlp.fc_out")
                    ),
                ),
            )
        )
    embed = V("transformer.wte.weight")
    cos, sin = rope_table(cfg.max_position_embeddings, r, cfg.rope_theta,
                          cfg.rope_scaling)
    lm_head = (
        Linear(W("lm_head.weight"), B("lm_head"))
        if "lm_head.weight" in raw else Linear(embed.T)
    )
    return ModelParams(
        embed=embed,
        blocks=blocks,
        final_norm=V("transformer.ln_f.weight"),
        final_norm_bias=B("transformer.ln_f"),
        lm_head=lm_head,
        rope_cos=cos,
        rope_sin=sin,
    )


def _import_opt(raw, cfg: ModelConfig, dtype) -> ModelParams:
    """OPT: model.decoder.layers.{i}.{self_attn.{q,k,v,out}_proj,
    self_attn_layer_norm, fc1, fc2, final_layer_norm}; learned positions
    with the +2 offset folded in at import (reference models/opt.py)."""
    if "model.decoder.project_in.weight" in raw:
        raise NotImplementedError(
            "OPT checkpoints with word_embed_proj_dim != hidden_size "
            "(opt-350m's project_in/project_out) are not supported"
        )
    W, V, B = _mk_wv(raw, dtype)
    blocks = []
    for i in range(cfg.num_hidden_layers):
        p = f"model.decoder.layers.{i}"
        wq, wk, wv = (
            W(f"{p}.self_attn.q_proj.weight"),
            W(f"{p}.self_attn.k_proj.weight"),
            W(f"{p}.self_attn.v_proj.weight"),
        )
        bq, bk, bv = (
            B(f"{p}.self_attn.q_proj"),
            B(f"{p}.self_attn.k_proj"),
            B(f"{p}.self_attn.v_proj"),
        )
        bias = jnp.concatenate([bq, bk, bv]) if bq is not None else None
        blocks.append(
            BlockParams(
                attn_norm=V(f"{p}.self_attn_layer_norm.weight"),
                attn_norm_bias=B(f"{p}.self_attn_layer_norm"),
                attn=AttentionParams(
                    qkv_proj=Linear(
                        jnp.concatenate([wq, wk, wv], axis=1), bias
                    ),
                    o_proj=Linear(
                        W(f"{p}.self_attn.out_proj.weight"),
                        B(f"{p}.self_attn.out_proj"),
                    ),
                ),
                mlp_norm=V(f"{p}.final_layer_norm.weight"),
                mlp_norm_bias=B(f"{p}.final_layer_norm"),
                mlp=MLPParams(
                    gate_up_proj=Linear(W(f"{p}.fc1.weight"), B(f"{p}.fc1")),
                    down_proj=Linear(W(f"{p}.fc2.weight"), B(f"{p}.fc2")),
                ),
            )
        )
    embed = V("model.decoder.embed_tokens.weight")
    # OPT's learned positional table has a +2 offset quirk
    pos = V("model.decoder.embed_positions.weight")[2:]
    cos, sin = rope_table(cfg.max_position_embeddings, cfg.head_dim, 10000.0)
    lm_head = (
        Linear(W("lm_head.weight")) if "lm_head.weight" in raw
        else Linear(embed.T)
    )
    return ModelParams(
        embed=embed,
        blocks=blocks,
        final_norm=V("model.decoder.final_layer_norm.weight"),
        final_norm_bias=B("model.decoder.final_layer_norm"),
        lm_head=lm_head,
        rope_cos=cos,
        rope_sin=sin,
        pos_embed=pos,
    )


def _import_bloom(raw, cfg: ModelConfig, dtype) -> ModelParams:
    """Bloom: transformer.h.{i}.{input_layernorm, self_attention.query_key_value
    (per-head interleaved), self_attention.dense, post_attention_layernorm,
    mlp.dense_h_to_4h, mlp.dense_4h_to_h} + word_embeddings_layernorm
    (reference models/bloom.py)."""
    W, V, B = _mk_wv(raw, dtype)
    hq, hkv, hd = (
        cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim
    )
    blocks = []
    for i in range(cfg.num_hidden_layers):
        p = f"transformer.h.{i}"
        wqkv, bqkv = _deinterleave_qkv(
            W(f"{p}.self_attention.query_key_value.weight"),
            B(f"{p}.self_attention.query_key_value"),
            hq, hkv, hd,
        )
        blocks.append(
            BlockParams(
                attn_norm=V(f"{p}.input_layernorm.weight"),
                attn_norm_bias=B(f"{p}.input_layernorm"),
                attn=AttentionParams(
                    qkv_proj=Linear(wqkv, bqkv),
                    o_proj=Linear(
                        W(f"{p}.self_attention.dense.weight"),
                        B(f"{p}.self_attention.dense"),
                    ),
                ),
                mlp_norm=V(f"{p}.post_attention_layernorm.weight"),
                mlp_norm_bias=B(f"{p}.post_attention_layernorm"),
                mlp=MLPParams(
                    gate_up_proj=Linear(
                        W(f"{p}.mlp.dense_h_to_4h.weight"),
                        B(f"{p}.mlp.dense_h_to_4h"),
                    ),
                    down_proj=Linear(
                        W(f"{p}.mlp.dense_4h_to_h.weight"),
                        B(f"{p}.mlp.dense_4h_to_h"),
                    ),
                ),
            )
        )
    embed = V("transformer.word_embeddings.weight")
    cos, sin = rope_table(cfg.max_position_embeddings, cfg.head_dim, 10000.0)
    return ModelParams(
        embed=embed,
        blocks=blocks,
        final_norm=V("transformer.ln_f.weight"),
        final_norm_bias=B("transformer.ln_f"),
        lm_head=Linear(embed.T),
        rope_cos=cos,
        rope_sin=sin,
        embed_norm=V("transformer.word_embeddings_layernorm.weight"),
        embed_norm_bias=B("transformer.word_embeddings_layernorm"),
    )


def _import_gpt_bigcode(raw, cfg: ModelConfig, dtype) -> ModelParams:
    """GPT-BigCode/StarCoder: transformer.h.{i}.{ln_1, attn.c_attn (MQA
    fused), attn.c_proj, ln_2, mlp.c_fc, mlp.c_proj} + wpe learned positions
    (reference models/gpt_bigcode.py)."""
    W, V, B = _mk_wv(raw, dtype)
    blocks = []
    for i in range(cfg.num_hidden_layers):
        p = f"transformer.h.{i}"
        blocks.append(
            BlockParams(
                attn_norm=V(f"{p}.ln_1.weight"),
                attn_norm_bias=B(f"{p}.ln_1"),
                attn=AttentionParams(
                    # c_attn columns are [q (H*hd) | k (hkv*hd) | v] straight
                    qkv_proj=Linear(
                        W(f"{p}.attn.c_attn.weight"), B(f"{p}.attn.c_attn")
                    ),
                    o_proj=Linear(
                        W(f"{p}.attn.c_proj.weight"), B(f"{p}.attn.c_proj")
                    ),
                ),
                mlp_norm=V(f"{p}.ln_2.weight"),
                mlp_norm_bias=B(f"{p}.ln_2"),
                mlp=MLPParams(
                    gate_up_proj=Linear(
                        W(f"{p}.mlp.c_fc.weight"), B(f"{p}.mlp.c_fc")
                    ),
                    down_proj=Linear(
                        W(f"{p}.mlp.c_proj.weight"), B(f"{p}.mlp.c_proj")
                    ),
                ),
            )
        )
    embed = V("transformer.wte.weight")
    cos, sin = rope_table(cfg.max_position_embeddings, cfg.head_dim, 10000.0)
    return ModelParams(
        embed=embed,
        blocks=blocks,
        final_norm=V("transformer.ln_f.weight"),
        final_norm_bias=B("transformer.ln_f"),
        lm_head=Linear(embed.T),
        rope_cos=cos,
        rope_sin=sin,
        pos_embed=V("transformer.wpe.weight"),
    )


def _import_baichuan(raw, cfg: ModelConfig, dtype) -> ModelParams:
    """Baichuan: llama layout with a fused W_pack qkv
    (reference models/baichuan.py)."""
    W, V, B = _mk_wv(raw, dtype)
    blocks = []
    for i in range(cfg.num_hidden_layers):
        p = f"model.layers.{i}"
        gate = W(f"{p}.mlp.gate_proj.weight")
        up = W(f"{p}.mlp.up_proj.weight")
        blocks.append(
            BlockParams(
                attn_norm=V(f"{p}.input_layernorm.weight"),
                attn=AttentionParams(
                    qkv_proj=Linear(W(f"{p}.self_attn.W_pack.weight")),
                    o_proj=Linear(W(f"{p}.self_attn.o_proj.weight")),
                ),
                mlp_norm=V(f"{p}.post_attention_layernorm.weight"),
                mlp=MLPParams(
                    gate_up_proj=Linear(jnp.concatenate([gate, up], axis=1)),
                    down_proj=Linear(W(f"{p}.mlp.down_proj.weight")),
                ),
            )
        )
    embed = V("model.embed_tokens.weight")
    cos, sin = rope_table(
        cfg.max_position_embeddings, cfg.head_dim, cfg.rope_theta,
        cfg.rope_scaling,
    )
    if "lm_head.weight" in raw:
        hw = W("lm_head.weight")  # [D, vocab]
        if cfg.vocab_size == 125696:
            # Baichuan2 (same model_type string): NormHead L2-normalizes
            # each output ROW at inference (modeling_baichuan NormHead) —
            # fold the normalization into the stored weight
            hw = hw.astype(jnp.float32)
            hw = (hw / jnp.maximum(
                jnp.linalg.norm(hw, axis=0, keepdims=True), 1e-7
            )).astype(embed.dtype)
        lm_head = Linear(hw)
    else:
        lm_head = Linear(embed.T)
    return ModelParams(
        embed=embed,
        blocks=blocks,
        final_norm=V("model.norm.weight"),
        lm_head=lm_head,
        rope_cos=cos,
        rope_sin=sin,
    )


def _import_qwen(raw, cfg: ModelConfig, dtype) -> ModelParams:
    """Qwen v1: transformer.h.{i}.{ln_1, attn.c_attn (fused, bias), attn.c_proj,
    ln_2, mlp.w1, mlp.w2, mlp.c_proj} — rmsnorm + swiglu
    (reference models/qwen.py).

    Known limitation: within the training seq_length only. Qwen-1's
    use_dynamic_ntk/use_logn_attn long-context extensions (HF
    modeling_qwen applies them past seq_length) are not implemented —
    long-context Qwen-1 serving diverges from HF beyond that point."""
    W, V, B = _mk_wv(raw, dtype)
    blocks = []
    for i in range(cfg.num_hidden_layers):
        p = f"transformer.h.{i}"
        # HF Qwen computes a1=w1(x), a2=w2(x), out=c_proj(a1 * silu(a2)):
        # w2 is the GATE (silu) and w1 the UP — concat [gate|up] = [w2|w1]
        w2 = W(f"{p}.mlp.w2.weight")
        w1 = W(f"{p}.mlp.w1.weight")
        blocks.append(
            BlockParams(
                attn_norm=V(f"{p}.ln_1.weight"),
                attn=AttentionParams(
                    qkv_proj=Linear(
                        W(f"{p}.attn.c_attn.weight"), B(f"{p}.attn.c_attn")
                    ),
                    o_proj=Linear(W(f"{p}.attn.c_proj.weight")),
                ),
                mlp_norm=V(f"{p}.ln_2.weight"),
                mlp=MLPParams(
                    gate_up_proj=Linear(jnp.concatenate([w2, w1], axis=1)),
                    down_proj=Linear(W(f"{p}.mlp.c_proj.weight")),
                ),
            )
        )
    embed = V("transformer.wte.weight")
    cos, sin = rope_table(
        cfg.max_position_embeddings, cfg.head_dim, cfg.rope_theta,
        cfg.rope_scaling,
    )
    lm_head = (
        Linear(W("lm_head.weight")) if "lm_head.weight" in raw
        else Linear(embed.T)
    )
    return ModelParams(
        embed=embed,
        blocks=blocks,
        final_norm=V("transformer.ln_f.weight"),
        lm_head=lm_head,
        rope_cos=cos,
        rope_sin=sin,
    )


def _import_llava(raw, cfg: ModelConfig, dtype) -> ModelParams:
    """LLaVA: quantize/serve the language tower only, like the reference
    (models/llava.py:13-129 — the vision tower stays an external HF module).
    Tensors live under a ``language_model.`` prefix."""
    lang = {
        k[len("language_model."):]: v
        for k, v in raw.items()
        if k.startswith("language_model.")
    }
    if not lang:
        raise ValueError("no language_model.* tensors found in llava checkpoint")
    return _import_llama_family(lang, cfg, dtype)


def _import_gemma(raw, cfg: ModelConfig, dtype) -> ModelParams:
    """Gemma / Gemma2 (HF modeling_gemma{,2}): llama-family tensor layout,
    but RMSNorm weights are stored zero-centered (the module computes
    x * (1 + w)) — fold the +1 here so the runtime's single x*w convention
    serves it. Covers all four gemma2 sandwich norms (the *layernorm.weight
    suffix match) — the norm-slot mapping itself lives in
    _import_llama_family. Embedding scaling by sqrt(D) is a runtime switch
    (cfg.embed_scale); lm_head is tied."""
    for k in list(raw):
        if k.endswith("layernorm.weight") or k == "model.norm.weight":
            raw[k] = raw[k] + 1.0
    return _import_llama_family(raw, cfg, dtype)


def _import_gemma3(raw, cfg: ModelConfig, dtype) -> ModelParams:
    """Gemma3 (HF modeling_gemma3): gemma2's layout plus per-head q/k
    RMSNorms — ALL of which (block norms, final norm, q/k norms) are stored
    zero-centered, hence the broader *norm.weight suffix fold. Multimodal
    checkpoints prefix the language tower with "language_model."; the
    vision tower is dropped (reference treats llava the same way,
    quick/awq/models/llava.py)."""
    lm = {}
    for k in list(raw):
        if k.startswith("language_model."):
            lm[k[len("language_model."):]] = raw.pop(k)
        elif not (k.startswith("vision_tower.")
                  or k.startswith("multi_modal_projector.")):
            lm[k] = raw.pop(k)
    for k in list(lm):
        if k.endswith("norm.weight"):
            lm[k] = lm[k] + 1.0
    return _import_llama_family(lm, cfg, dtype)


def _import_phi(raw, cfg: ModelConfig, dtype) -> ModelParams:
    """Phi-1.5/Phi-2 (HF modeling_phi): parallel attn+MLP branches fed by
    ONE shared input layernorm (duplicated into our attn/mlp norm slots),
    gelu fc1/fc2 MLP, partial rotary (cfg.rotary_dim), biases on every
    linear including lm_head."""
    W, V, B = _mk_wv(raw, dtype)
    blocks = []
    for i in range(cfg.num_hidden_layers):
        p = f"model.layers.{i}"
        qw, kw, vw = (W(f"{p}.self_attn.{n}_proj.weight") for n in "qkv")
        qb, kb, vb = (B(f"{p}.self_attn.{n}_proj") for n in "qkv")
        qkv = Linear(
            jnp.concatenate([qw, kw, vw], axis=1),
            jnp.concatenate([qb, kb, vb]) if qb is not None else None,
        )
        ln_w = V(f"{p}.input_layernorm.weight")
        ln_b = B(f"{p}.input_layernorm")
        blocks.append(
            BlockParams(
                attn_norm=ln_w,
                attn=AttentionParams(
                    qkv_proj=qkv,
                    o_proj=Linear(W(f"{p}.self_attn.dense.weight"),
                                  B(f"{p}.self_attn.dense")),
                ),
                mlp_norm=ln_w,  # shared norm, both branches read x normed once
                mlp=MLPParams(
                    gate_up_proj=Linear(W(f"{p}.mlp.fc1.weight"),
                                        B(f"{p}.mlp.fc1")),
                    down_proj=Linear(W(f"{p}.mlp.fc2.weight"),
                                     B(f"{p}.mlp.fc2")),
                ),
                attn_norm_bias=ln_b,
                mlp_norm_bias=ln_b,
            )
        )
    cos, sin = rope_table(
        cfg.max_position_embeddings, cfg.rotary_dim or cfg.head_dim,
        cfg.rope_theta, cfg.rope_scaling,
    )
    return ModelParams(
        embed=V("model.embed_tokens.weight"),
        blocks=blocks,
        final_norm=V("model.final_layernorm.weight"),
        lm_head=Linear(W("lm_head.weight"), B("lm_head")),
        rope_cos=cos,
        rope_sin=sin,
        final_norm_bias=B("model.final_layernorm"),
    )


def _import_phi3(raw, cfg: ModelConfig, dtype) -> ModelParams:
    """Phi-3/3.5/4 (HF modeling_phi3): llama tensor tree with PRE-FUSED
    qkv_proj ([q|k|v] rows) and gate_up_proj ([gate|up] rows) — both match
    this runtime's fused column layout directly after transpose. Longrope
    scaling rides cfg.rope_scaling through ops/rope.py. Post-reference
    family."""
    W, V, B = _mk_wv(raw, dtype)
    blocks = []
    for i in range(cfg.num_hidden_layers):
        p = f"model.layers.{i}"
        blocks.append(
            BlockParams(
                attn_norm=V(f"{p}.input_layernorm.weight"),
                attn=AttentionParams(
                    qkv_proj=Linear(W(f"{p}.self_attn.qkv_proj.weight"),
                                    B(f"{p}.self_attn.qkv_proj")),
                    o_proj=Linear(W(f"{p}.self_attn.o_proj.weight"),
                                  B(f"{p}.self_attn.o_proj")),
                ),
                mlp_norm=V(f"{p}.post_attention_layernorm.weight"),
                mlp=MLPParams(
                    gate_up_proj=Linear(W(f"{p}.mlp.gate_up_proj.weight")),
                    down_proj=Linear(W(f"{p}.mlp.down_proj.weight")),
                ),
            )
        )
    embed = V("model.embed_tokens.weight")
    cos, sin = rope_table(
        cfg.max_position_embeddings, cfg.rotary_dim or cfg.head_dim,
        cfg.rope_theta, cfg.rope_scaling,
    )
    lm_head = (
        Linear(W("lm_head.weight"))
        if "lm_head.weight" in raw and not cfg.tie_word_embeddings
        else Linear(embed.T)
    )
    return ModelParams(
        embed=embed,
        blocks=blocks,
        final_norm=V("model.norm.weight"),
        lm_head=lm_head,
        rope_cos=cos,
        rope_sin=sin,
    )


def _import_starcoder2(raw, cfg: ModelConfig, dtype) -> ModelParams:
    """StarCoder2 (HF modeling_starcoder2): llama tensor tree but LayerNorm
    (weight+bias) everywhere, a plain gelu c_fc/c_proj MLP, biases on every
    linear (use_bias), RoPE, tied lm_head. Post-reference family — no
    reference analog (closest: gpt_bigcode, quick/awq/models/gpt_bigcode.py,
    its predecessor architecture)."""
    W, V, B = _mk_wv(raw, dtype)
    blocks = []
    for i in range(cfg.num_hidden_layers):
        p = f"model.layers.{i}"
        qw, kw, vw = (W(f"{p}.self_attn.{n}_proj.weight") for n in "qkv")
        qb, kb, vb = (B(f"{p}.self_attn.{n}_proj") for n in "qkv")
        blocks.append(
            BlockParams(
                attn_norm=V(f"{p}.input_layernorm.weight"),
                attn=AttentionParams(
                    qkv_proj=Linear(
                        jnp.concatenate([qw, kw, vw], axis=1),
                        jnp.concatenate([qb, kb, vb])
                        if qb is not None else None,
                    ),
                    o_proj=Linear(W(f"{p}.self_attn.o_proj.weight"),
                                  B(f"{p}.self_attn.o_proj")),
                ),
                mlp_norm=V(f"{p}.post_attention_layernorm.weight"),
                mlp=MLPParams(
                    gate_up_proj=Linear(W(f"{p}.mlp.c_fc.weight"),
                                        B(f"{p}.mlp.c_fc")),
                    down_proj=Linear(W(f"{p}.mlp.c_proj.weight"),
                                     B(f"{p}.mlp.c_proj")),
                ),
                attn_norm_bias=B(f"{p}.input_layernorm"),
                mlp_norm_bias=B(f"{p}.post_attention_layernorm"),
            )
        )
    embed = V("model.embed_tokens.weight")
    cos, sin = rope_table(
        cfg.max_position_embeddings, cfg.head_dim, cfg.rope_theta,
        cfg.rope_scaling,
    )
    lm_head = (
        Linear(W("lm_head.weight")) if "lm_head.weight" in raw
        else Linear(embed.T)
    )
    return ModelParams(
        embed=embed,
        blocks=blocks,
        final_norm=V("model.norm.weight"),
        lm_head=lm_head,
        rope_cos=cos,
        rope_sin=sin,
        final_norm_bias=B("model.norm"),
    )


def _import_internlm2(raw, cfg: ModelConfig, dtype) -> ModelParams:
    """InternLM2 (HF modeling_internlm2): llama numerics with renamed
    tensors (attention.wqkv/wo, feed_forward.w1/w3/w2, attention_norm /
    ffn_norm, model.tok_embeddings, output) and a GROUPED fused wqkv whose
    columns are laid out [hkv, g+2, hd] — the same grouping falcon's new
    decoder uses, so the same degroup routine applies. Post-reference
    family."""
    W, V, B = _mk_wv(raw, dtype)
    hq, hkv, hd = (cfg.num_attention_heads, cfg.num_key_value_heads,
                   cfg.head_dim)
    blocks = []
    for i in range(cfg.num_hidden_layers):
        p = f"model.layers.{i}"
        wqkv = _degroup_falcon_qkv(W(f"{p}.attention.wqkv.weight"),
                                   hq, hkv, hd)
        bqkv = None
        if f"{p}.attention.wqkv.bias" in raw:
            b = B(f"{p}.attention.wqkv")
            bqkv = _degroup_falcon_qkv(b[None, :], hq, hkv, hd)[0]
        gate = W(f"{p}.feed_forward.w1.weight")
        up = W(f"{p}.feed_forward.w3.weight")
        blocks.append(
            BlockParams(
                attn_norm=V(f"{p}.attention_norm.weight"),
                attn=AttentionParams(
                    qkv_proj=Linear(wqkv, bqkv),
                    o_proj=Linear(W(f"{p}.attention.wo.weight"),
                                  B(f"{p}.attention.wo")),
                ),
                mlp_norm=V(f"{p}.ffn_norm.weight"),
                mlp=MLPParams(
                    gate_up_proj=Linear(jnp.concatenate([gate, up], axis=1)),
                    down_proj=Linear(W(f"{p}.feed_forward.w2.weight")),
                ),
            )
        )
    embed = V("model.tok_embeddings.weight")
    cos, sin = rope_table(
        cfg.max_position_embeddings, cfg.head_dim, cfg.rope_theta,
        cfg.rope_scaling,
    )
    lm_head = (
        Linear(W("output.weight")) if "output.weight" in raw
        else Linear(embed.T)
    )
    return ModelParams(
        embed=embed,
        blocks=blocks,
        final_norm=V("model.norm.weight"),
        lm_head=lm_head,
        rope_cos=cos,
        rope_sin=sin,
    )


def _import_olmo2(raw, cfg: ModelConfig, dtype) -> ModelParams:
    """OLMo-2 (HF modeling_olmo2): llama tensor tree where BOTH norms are
    post-norms on the sub-layer outputs (x + post_attention_layernorm(attn)
    then h + post_feedforward_layernorm(mlp)) — mapped to the
    attn_post_norm/mlp_post_norm slots with NO pre-norms — plus one
    full-projection-width RMSNorm on q/k before the head reshape.
    Post-reference family."""
    W, V, B = _mk_wv(raw, dtype)
    blocks = []
    for i in range(cfg.num_hidden_layers):
        p = f"model.layers.{i}"
        qw, kw, vw = (W(f"{p}.self_attn.{n}_proj.weight") for n in "qkv")
        gate = W(f"{p}.mlp.gate_proj.weight")
        up = W(f"{p}.mlp.up_proj.weight")
        blocks.append(
            BlockParams(
                attn_norm=None,
                attn=AttentionParams(
                    qkv_proj=Linear(jnp.concatenate([qw, kw, vw], axis=1)),
                    o_proj=Linear(W(f"{p}.self_attn.o_proj.weight")),
                    q_norm=V(f"{p}.self_attn.q_norm.weight"),
                    k_norm=V(f"{p}.self_attn.k_norm.weight"),
                ),
                mlp_norm=None,
                mlp=MLPParams(
                    gate_up_proj=Linear(jnp.concatenate([gate, up], axis=1)),
                    down_proj=Linear(W(f"{p}.mlp.down_proj.weight")),
                ),
                attn_post_norm=V(f"{p}.post_attention_layernorm.weight"),
                mlp_post_norm=V(f"{p}.post_feedforward_layernorm.weight"),
            )
        )
    embed = V("model.embed_tokens.weight")
    cos, sin = rope_table(
        cfg.max_position_embeddings, cfg.head_dim, cfg.rope_theta,
        cfg.rope_scaling,
    )
    lm_head = (
        Linear(W("lm_head.weight")) if "lm_head.weight" in raw
        else Linear(embed.T)
    )
    return ModelParams(
        embed=embed,
        blocks=blocks,
        final_norm=V("model.norm.weight"),
        lm_head=lm_head,
        rope_cos=cos,
        rope_sin=sin,
    )


def _import_deepseek(raw, cfg: ModelConfig, dtype) -> ModelParams:
    """DeepSeek-V2/V3 (HF modeling_deepseek_v2/v3): MLA attention
    (q optionally LoRA-factored; kv compressed through kv_a_proj_with_mqa)
    plus DeepSeekMoE (dense first_k layers, routed experts + shared
    experts, v3 e_score_correction_bias). The rope (pe) channels are stored
    in HF's interleaved convention and permuted here to rotate-half (the
    same conversion gptj/cohere use). Post-reference family."""
    from quick_tpu.modules.mla import MLAParams

    W, V, B = _mk_wv(raw, dtype)
    hq = cfg.num_attention_heads
    dn, dr = cfg.qk_nope_head_dim, cfg.qk_rope_head_dim
    R = cfg.kv_lora_rank
    perm = np.concatenate([np.arange(0, dr, 2), np.arange(1, dr, 2)])

    def permute_q(w):  # [Din, hq*(dn+dr)]: rotate-half-ify each head's pe
        Din = w.shape[0]
        wh = w.reshape(Din, hq, dn + dr)
        pe = wh[:, :, dn:][:, :, perm]
        return jnp.concatenate([wh[:, :, :dn], pe], axis=2).reshape(Din, -1)

    blocks = []
    for i in range(cfg.num_hidden_layers):
        p = f"model.layers.{i}"
        if f"{p}.self_attn.q_a_proj.weight" in raw:
            q = Linear(W(f"{p}.self_attn.q_a_proj.weight"))
            q_b = Linear(permute_q(W(f"{p}.self_attn.q_b_proj.weight")))
            q_a_norm = V(f"{p}.self_attn.q_a_layernorm.weight")
        else:  # v2-lite: full q projection
            q = Linear(permute_q(W(f"{p}.self_attn.q_proj.weight")))
            q_b = q_a_norm = None
        kva = W(f"{p}.self_attn.kv_a_proj_with_mqa.weight")  # [D, R+dr]
        kva = jnp.concatenate([kva[:, :R], kva[:, R:][:, perm]], axis=1)
        attn = MLAParams(
            q_proj=q,
            kv_a_proj=Linear(kva),
            kv_a_norm=V(f"{p}.self_attn.kv_a_layernorm.weight"),
            kv_b_proj=Linear(W(f"{p}.self_attn.kv_b_proj.weight")),
            o_proj=Linear(W(f"{p}.self_attn.o_proj.weight")),
            q_b_proj=q_b,
            q_a_norm=q_a_norm,
        )
        if f"{p}.mlp.gate.weight" in raw:  # MoE layer
            E = cfg.num_local_experts
            gus, dns = [], []
            for e in range(E):
                g = W(f"{p}.mlp.experts.{e}.gate_proj.weight")
                u = W(f"{p}.mlp.experts.{e}.up_proj.weight")
                gus.append(jnp.concatenate([g, u], axis=1))
                dns.append(W(f"{p}.mlp.experts.{e}.down_proj.weight"))
            shared_gu = shared_dn = None
            if f"{p}.mlp.shared_experts.gate_proj.weight" in raw:
                sg = W(f"{p}.mlp.shared_experts.gate_proj.weight")
                su = W(f"{p}.mlp.shared_experts.up_proj.weight")
                shared_gu = Linear(jnp.concatenate([sg, su], axis=1))
                shared_dn = Linear(
                    W(f"{p}.mlp.shared_experts.down_proj.weight")
                )
            bias_key = f"{p}.mlp.gate.e_score_correction_bias"
            mlp = MoEParams(
                router=Linear(W(f"{p}.mlp.gate.weight")),
                gate_up_proj=Linear(jnp.stack(gus)),
                down_proj=Linear(jnp.stack(dns)),
                shared_gate_up=shared_gu,
                shared_down=shared_dn,
                score_bias=(
                    jnp.asarray(raw.pop(bias_key), jnp.float32)
                    if bias_key in raw else None
                ),
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
                attn=attn,
                mlp_norm=V(f"{p}.post_attention_layernorm.weight"),
                mlp=mlp,
            )
        )
    embed = V("model.embed_tokens.weight")
    cos, sin = rope_table(
        cfg.max_position_embeddings, dr, cfg.rope_theta, cfg.rope_scaling,
    )
    lm_head = (
        Linear(W("lm_head.weight")) if "lm_head.weight" in raw
        else Linear(embed.T)
    )
    return ModelParams(
        embed=embed,
        blocks=blocks,
        final_norm=V("model.norm.weight"),
        lm_head=lm_head,
        rope_cos=cos,
        rope_sin=sin,
    )


def _import_cohere(raw, cfg: ModelConfig, dtype) -> ModelParams:
    """Cohere command-r/r+ (HF modeling_cohere): llama tensor tree with ONE
    shared input_layernorm feeding parallel attn+mlp (duplicated into both
    norm slots, like phi), INTERLEAVED rope — converted to rotate-half by
    the gptj channel permutation over the full head_dim, applied to q/k
    projections AND (r+) the per-head q/k LayerNorm weights so the norm
    commutes with the permutation. Tied lm_head with logit_scale applied in
    the runtime. Post-reference family."""
    W, V, B = _mk_wv(raw, dtype)
    hq, hkv, hd = (cfg.num_attention_heads, cfg.num_key_value_heads,
                   cfg.head_dim)
    blocks = []
    for i in range(cfg.num_hidden_layers):
        p = f"model.layers.{i}"
        qw = _gptj_rope_permute(W(f"{p}.self_attn.q_proj.weight"), hq, hd, hd)
        kw = _gptj_rope_permute(W(f"{p}.self_attn.k_proj.weight"), hkv, hd, hd)
        vw = W(f"{p}.self_attn.v_proj.weight")
        qn = kn = None
        if f"{p}.self_attn.q_norm.weight" in raw:
            # per-head [h, hd] LayerNorm weights, permuted like the channels
            perm = np.concatenate([np.arange(0, hd, 2), np.arange(1, hd, 2)])
            qn = V(f"{p}.self_attn.q_norm.weight")[:, perm]
            kn = V(f"{p}.self_attn.k_norm.weight")[:, perm]
        gate = W(f"{p}.mlp.gate_proj.weight")
        up = W(f"{p}.mlp.up_proj.weight")
        ln = V(f"{p}.input_layernorm.weight")
        blocks.append(
            BlockParams(
                attn_norm=ln,
                attn=AttentionParams(
                    qkv_proj=Linear(jnp.concatenate([qw, kw, vw], axis=1)),
                    o_proj=Linear(W(f"{p}.self_attn.o_proj.weight")),
                    q_norm=qn, k_norm=kn,
                ),
                mlp_norm=ln,  # shared: both branches read x normed once
                mlp=MLPParams(
                    gate_up_proj=Linear(jnp.concatenate([gate, up], axis=1)),
                    down_proj=Linear(W(f"{p}.mlp.down_proj.weight")),
                ),
            )
        )
    embed = V("model.embed_tokens.weight")
    cos, sin = rope_table(
        cfg.max_position_embeddings, cfg.head_dim, cfg.rope_theta,
        cfg.rope_scaling,
    )
    return ModelParams(
        embed=embed,
        blocks=blocks,
        final_norm=V("model.norm.weight"),
        lm_head=Linear(embed.T),
        rope_cos=cos,
        rope_sin=sin,
    )


_HF_IMPORTERS = {
    "llava": _import_llava,
    "gemma": _import_gemma,
    "gemma2": _import_gemma,
    "gemma3": _import_gemma3,
    "phi": _import_phi,
    "mpt": _import_mpt,
    "falcon": _import_falcon,
    "RefinedWeb": _import_falcon,
    "RefinedWebModel": _import_falcon,
    "gpt_neox": _import_gpt_neox,
    "gptj": _import_gptj,
    "opt": _import_opt,
    "bloom": _import_bloom,
    "gpt_bigcode": _import_gpt_bigcode,
    "baichuan": _import_baichuan,
    "qwen": _import_qwen,
    "phi3": _import_phi3,
    "starcoder2": _import_starcoder2,
    "internlm2": _import_internlm2,
    "cohere": _import_cohere,
    "olmo2": _import_olmo2,
    "deepseek_v2": _import_deepseek,
    "deepseek_v3": _import_deepseek,
    # stablelm / granite / minicpm ride _import_llama_family (llama tensor
    # tree; stablelm's LayerNorm biases are picked up when present, granite/
    # minicpm multipliers are pure ModelConfig switches)
}


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
    from quick_tpu.quantize.packing import (
        import_awq_gemm,
        import_awq_gemv,
        import_exllama,
    )

    with open(os.path.join(model_dir, "config.json")) as f:
        hf_cfg = json.load(f)
    cfg = ModelConfig.from_hf_config(hf_cfg)
    # this loader maps the PLAIN llama rmsnorm schema only. Families whose
    # conventions it does not reproduce must fail loudly instead of loading
    # into silent garbage (gemma's zero-centered +1 norms, qwen3/olmo2
    # q/k norms, stablelm layernorm biases, cohere shared-norm residual)
    _AUTOAWQ_OK = {
        "llama", "mistral", "vicuna", "yi", "aquila", "qwen2", "mixtral",
        "tinyllama", "deepseek",
    }
    if cfg.model_type not in _AUTOAWQ_OK:
        raise NotImplementedError(
            f"AutoAWQ import supports the plain llama-schema families "
            f"{sorted(_AUTOAWQ_OK)}; '{cfg.model_type}' checkpoints carry "
            f"norm/attention conventions this loader does not map — "
            f"quantize from the float checkpoint instead "
            f"(AutoQuickModel.from_pretrained + .quantize)"
        )
    qcfg = QuantConfig.from_pretrained(model_dir)
    G = qcfg.q_group_size
    version = qcfg.version.lower()
    raw: Dict[str, np.ndarray] = dict(_hf_tensor_iter(model_dir))

    def qlin(base: str) -> QuantLinear:
        if version.startswith("exllama"):
            importer = import_exllama
        elif version == "gemv":
            importer = import_awq_gemv
        else:
            importer = import_awq_gemm
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
        cfg.max_position_embeddings, cfg.head_dim, cfg.rope_theta,
        cfg.rope_scaling,
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
