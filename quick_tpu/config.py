"""Configuration dataclasses for quantization and models.

TPU-native re-design of the reference's ``AwqConfig``
(reference: quick/awq/models/_config.py:8-92). Persisted both as a standalone
``quant_config.json`` and embedded under ``quantization_config`` in the HF
model config, mirroring the reference's dual persistence so checkpoints
interoperate.
"""
from __future__ import annotations

import dataclasses
import json
import os
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional

QUANT_CONFIG_FILENAME = "quant_config.json"

#: Kernel/layout family names. "qtpu" is this framework's native layout (the
#: TPU analog of the reference's "QUICK" version string); "gemm" designates an
#: imported AutoAWQ GEMM-layout checkpoint (converted to qtpu at load).
KNOWN_VERSIONS = ("qtpu", "gemm", "gemv", "quick", "exllama", "exllamav2")


@dataclass
class QuantConfig:
    """Group-wise INT4 weight quantization settings.

    Field semantics match the reference AwqConfig
    (quick/awq/models/_config.py:8-16): asymmetric (zero_point=True),
    q_group_size=128, w_bit=4.
    """

    zero_point: bool = True
    q_group_size: int = 128
    w_bit: int = 4
    version: str = "qtpu"
    modules_to_not_convert: Optional[List[str]] = None

    config_file_name: str = QUANT_CONFIG_FILENAME

    def __post_init__(self):
        if self.w_bit not in (4,):
            raise ValueError(f"only 4-bit supported, got w_bit={self.w_bit}")
        if self.q_group_size <= 0 or self.q_group_size % 8 != 0:
            raise ValueError(f"invalid q_group_size={self.q_group_size}")

    # -- persistence ---------------------------------------------------------
    def to_dict(self) -> Dict[str, Any]:
        return {
            "zero_point": self.zero_point,
            "q_group_size": self.q_group_size,
            "w_bit": self.w_bit,
            "version": self.version,
            "modules_to_not_convert": self.modules_to_not_convert,
        }

    def to_transformers_dict(self) -> Dict[str, Any]:
        """HF-style quantization_config dict (reference _config.py:84-92)."""
        return {
            "quant_method": "awq",
            "zero_point": self.zero_point,
            "group_size": self.q_group_size,
            "bits": self.w_bit,
            "version": self.version,
            "modules_to_not_convert": self.modules_to_not_convert,
        }

    @classmethod
    def from_dict(cls, d: Dict[str, Any]) -> "QuantConfig":
        known = {f.name for f in dataclasses.fields(cls)}
        # accept both our names and HF transformers names
        remap = {"group_size": "q_group_size", "bits": "w_bit"}
        kwargs = {}
        for k, v in d.items():
            k = remap.get(k, k)
            if k in known and k != "config_file_name":
                kwargs[k] = v
        return cls(**kwargs)

    def save_pretrained(self, save_dir: str) -> str:
        os.makedirs(save_dir, exist_ok=True)
        path = os.path.join(save_dir, self.config_file_name)
        with open(path, "w") as f:
            json.dump(self.to_dict(), f, indent=2)
        return path

    @classmethod
    def from_pretrained(cls, model_dir: str) -> "QuantConfig":
        """Load from quant_config.json, or from config.json's
        quantization_config (reference _config.py:26-72 search order)."""
        qc_path = os.path.join(model_dir, QUANT_CONFIG_FILENAME)
        if os.path.exists(qc_path):
            with open(qc_path) as f:
                return cls.from_dict(json.load(f))
        cfg_path = os.path.join(model_dir, "config.json")
        if os.path.exists(cfg_path):
            with open(cfg_path) as f:
                cfg = json.load(f)
            if "quantization_config" in cfg:
                return cls.from_dict(cfg["quantization_config"])
        raise FileNotFoundError(f"no quantization config found in {model_dir}")


@dataclass(frozen=True)
class ModelConfig:
    """Architecture hyperparameters for the decoder-only model runtime.

    One config covers the whole Llama-like family (Llama, TinyLlama, Mistral,
    Vicuna, Yi, Qwen2, ...); family-specific switches (MoE, attention bias,
    alibi, parallel residual, ...) widen it to the remaining reference
    architectures (reference model map: quick/awq/models/auto.py:6-24).
    """

    vocab_size: int = 32000
    hidden_size: int = 4096
    intermediate_size: int = 11008
    num_hidden_layers: int = 32
    num_attention_heads: int = 32
    num_key_value_heads: int = 32
    head_dim: Optional[int] = None
    max_position_embeddings: int = 4096
    rms_norm_eps: float = 1e-5
    rope_theta: float = 10000.0
    #: HF ``rope_scaling`` stored as a hashable tuple of sorted (key, value)
    #: pairs (the config must stay hashable — it rides jit static args);
    #: ops/rope.py::rope_table consumes it (linear / dynamic / yarn / llama3)
    rope_scaling: Optional[tuple] = None
    tie_word_embeddings: bool = False
    # family switches
    model_type: str = "llama"
    attention_bias: bool = False          # qwen(1) style qkv bias
    mlp_bias: bool = False
    use_alibi: bool = False               # mpt / baichuan-13b / bloom
    #: global head count for ALiBi slope assignment when this config describes
    #: a TP shard (set by parallel.sharding.local_config); None = not sharded
    alibi_total_heads: Optional[int] = None
    parallel_residual: bool = False       # gptj / gpt-neox / falcon style
    use_rope: bool = True                 # opt/bloom use learned/alibi instead
    rotary_dim: Optional[int] = None      # partial rotary (gpt-neox/gptj);
    # None = full head_dim
    learned_pos: bool = False             # learned position embeddings
    # (opt / gpt_bigcode); table lives in ModelParams.pos_embed
    embed_norm: bool = False              # layernorm right after the token
    # embedding (bloom's word_embeddings_layernorm)
    embed_scale: bool = False             # gemma: hidden = embed * sqrt(D)
    use_qk_norm: bool = False             # qwen3: per-head RMSNorm on q/k
    # projections before RoPE (q_norm/k_norm weights on AttentionParams)
    layernorm: str = "rmsnorm"            # "rmsnorm" | "layernorm"
    act_fn: str = "silu"                  # "silu" | "gelu" | "relu"
    gated_mlp: bool = True                # swiglu vs plain 2-layer mlp
    # MoE (mixtral)
    num_local_experts: int = 0
    num_experts_per_tok: int = 2
    # norm epsilon name differences handled at import time

    def __post_init__(self):
        if self.head_dim is None:
            object.__setattr__(
                self, "head_dim", self.hidden_size // self.num_attention_heads
            )
        if self.rope_scaling is not None and not isinstance(
            self.rope_scaling, tuple
        ):
            # normalize dict / JSON-round-tripped list to the hashable form;
            # non-scalar values (e.g. qwen2-vl mrope_section lists) are
            # dropped — rope_table only reads scalars
            items = (
                self.rope_scaling.items()
                if isinstance(self.rope_scaling, dict)
                else self.rope_scaling
            )
            object.__setattr__(
                self, "rope_scaling",
                tuple(sorted(
                    (k, v) for k, v in items
                    if isinstance(v, (str, int, float, bool))
                )),
            )

    @property
    def is_moe(self) -> bool:
        return self.num_local_experts > 0

    def to_dict(self) -> Dict[str, Any]:
        return dataclasses.asdict(self)

    @classmethod
    def from_dict(cls, d: Dict[str, Any]) -> "ModelConfig":
        known = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in d.items() if k in known})

    @classmethod
    def from_hf_config(cls, hf: Any) -> "ModelConfig":
        """Build from a transformers PretrainedConfig (or dict)."""
        if not isinstance(hf, dict):
            hf = hf.to_dict()
        mt = hf.get("model_type", "llama")
        if mt in ("RefinedWeb", "RefinedWebModel"):  # pre-rename falcon
            mt = "falcon"
        if mt == "llava" and isinstance(hf.get("text_config"), dict):
            # vision2seq: architecture params come from the language tower
            cfg = cls.from_hf_config({**hf["text_config"], "model_type": "llama"})
            import dataclasses as _dc

            return _dc.replace(cfg, model_type="llava")
        kw: Dict[str, Any] = dict(
            vocab_size=hf.get("vocab_size", 32000),
            hidden_size=hf.get("hidden_size", hf.get("n_embd", hf.get("d_model", 4096))),
            num_hidden_layers=hf.get("num_hidden_layers", hf.get("n_layer", hf.get("n_layers", 32))),
            num_attention_heads=hf.get("num_attention_heads", hf.get("n_head", hf.get("n_heads", 32))),
            max_position_embeddings=hf.get("max_position_embeddings", hf.get("n_positions", 4096)),
            model_type=mt,
        )
        kw["num_key_value_heads"] = hf.get("num_key_value_heads", kw["num_attention_heads"])
        kw["intermediate_size"] = hf.get("intermediate_size", hf.get("ffn_dim", 4 * kw["hidden_size"]))
        kw["rms_norm_eps"] = hf.get("rms_norm_eps", hf.get("layer_norm_epsilon", 1e-5))
        kw["rope_theta"] = hf.get("rope_theta", 10000.0)
        rs = hf.get("rope_scaling")
        if isinstance(rs, (list, tuple)):  # our own config.json round trip
            rs = dict(rs)
        if isinstance(rs, dict) and (
            rs.get("rope_type", rs.get("type", "default")) != "default"
        ):
            kw["rope_scaling"] = rs  # normalized to a tuple in __post_init__
        kw["tie_word_embeddings"] = hf.get("tie_word_embeddings", False)
        kw["attention_bias"] = hf.get("attention_bias", mt == "qwen")
        if "head_dim" in hf and hf["head_dim"]:
            kw["head_dim"] = hf["head_dim"]
        if mt == "mixtral":
            kw["num_local_experts"] = hf.get("num_local_experts", 8)
            kw["num_experts_per_tok"] = hf.get("num_experts_per_tok", 2)

        # -- family-specific HF config translations -------------------------
        # (authoritative: AutoQuickModel trusts these over the static
        # MODEL_TYPE_MAP, which only serves from_random/validation)
        D = kw["hidden_size"]
        H = kw["num_attention_heads"]
        if mt in ("mpt", "falcon", "gpt_neox", "gptj", "opt", "bloom",
                  "gpt_bigcode"):
            kw["layernorm"] = "layernorm"
            kw["act_fn"] = "gelu"
            kw["gated_mlp"] = False
        if mt == "mpt":
            kw["intermediate_size"] = int(hf.get("expansion_ratio", 4)) * D
            kw["max_position_embeddings"] = hf.get("max_seq_len", 2048)
            attn_cfg = hf.get("attn_config", {}) or {}
            kw["num_key_value_heads"] = attn_cfg.get("kv_n_heads", H)
            kw["use_alibi"] = bool(attn_cfg.get("alibi", True))
            kw["use_rope"] = not kw["use_alibi"]
        elif mt == "falcon":
            if hf.get("new_decoder_architecture", False) or "n_head_kv" in hf:
                # pre-rename RefinedWeb (falcon-40b) configs carry n_head_kv
                # and imply the grouped qkv layout
                kw["num_key_value_heads"] = hf.get(
                    "num_kv_heads", hf.get("n_head_kv", H)
                )
            elif hf.get("multi_query", True):
                kw["num_key_value_heads"] = 1
            kw["use_alibi"] = bool(hf.get("alibi", False))
            kw["use_rope"] = not kw["use_alibi"]
            kw["parallel_residual"] = bool(hf.get("parallel_attn", True))
            kw["intermediate_size"] = hf.get("ffn_hidden_size", 4 * D)
        elif mt == "gpt_neox":
            hd = D // H
            kw["rotary_dim"] = max(2, int(hd * hf.get("rotary_pct", 1.0)))
            kw["parallel_residual"] = bool(hf.get("use_parallel_residual", True))
            kw["rope_theta"] = hf.get("rotary_emb_base", 10000.0)
        elif mt == "gptj":
            kw["rotary_dim"] = hf.get("rotary_dim") or (D // H)
            kw["intermediate_size"] = hf.get("n_inner") or 4 * D
            kw["max_position_embeddings"] = hf.get("n_positions", 2048)
            kw["parallel_residual"] = True
        elif mt == "opt":
            kw["intermediate_size"] = hf.get("ffn_dim", 4 * D)
            kw["act_fn"] = (
                "relu" if hf.get("activation_function", "relu") == "relu"
                else "gelu"
            )
            kw["learned_pos"] = True
            kw["use_rope"] = False
            kw["tie_word_embeddings"] = hf.get("tie_word_embeddings", True)
        elif mt == "bloom":
            kw["embed_norm"] = True
            kw["use_alibi"] = True
            kw["use_rope"] = False
        elif mt == "gpt_bigcode":
            if hf.get("multi_query", True):
                kw["num_key_value_heads"] = 1
            kw["intermediate_size"] = hf.get("n_inner") or 4 * D
            kw["learned_pos"] = True
            kw["use_rope"] = False
            kw["max_position_embeddings"] = hf.get("n_positions", 2048)
        elif mt == "qwen":
            # HF Qwen-1 halves intermediate_size in code (modeling_qwen
            # ff dims = intermediate_size // 2)
            kw["intermediate_size"] = kw["intermediate_size"] // 2
        elif mt == "phi":
            # phi-1.5/phi-2: layernorm + gelu MLP, ONE shared input
            # layernorm feeding parallel attn+mlp branches, partial rotary,
            # biases everywhere (HF modeling_phi)
            kw["layernorm"] = "layernorm"
            kw["act_fn"] = "gelu"
            kw["gated_mlp"] = False
            kw["parallel_residual"] = True
            kw["attention_bias"] = True
            kw["mlp_bias"] = True
            kw["rms_norm_eps"] = hf.get("layer_norm_eps", 1e-5)
            hd = kw.get("head_dim") or D // H
            kw["rotary_dim"] = max(
                2, int(hd * hf.get("partial_rotary_factor", 0.5))
            )
        elif mt == "gemma":
            # gemma: GeGLU (tanh gelu), embeddings scaled by sqrt(D), tied
            # lm_head, RMSNorm weights stored as (w - 1) — folded to our
            # x*w convention at import (utils/checkpoint.py::_import_gemma)
            kw["act_fn"] = "gelu"
            kw["embed_scale"] = True
            kw["tie_word_embeddings"] = True
            kw["rms_norm_eps"] = hf.get("rms_norm_eps", 1e-6)
        elif mt == "qwen3":
            # llama-like + per-head q/k RMSNorm, explicit head_dim, no bias
            kw["use_qk_norm"] = True
            kw["attention_bias"] = hf.get("attention_bias", False)
        elif mt == "baichuan":
            # Baichuan-13B is the ALiBi variant (reference models/baichuan.py:116);
            # the 7B uses RoPE. Distinguish by width.
            if D >= 5120:
                kw["use_alibi"] = True
                kw["use_rope"] = False
        return cls(**kw)
