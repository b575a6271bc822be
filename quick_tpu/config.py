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
    #: also pack lm_head W4A16 (RTN). The reference always leaves the head
    #: fp16 (modules_to_not_convert semantics); measured cost on random
    #: outlier models is dNLL ~ +0.006 (~ +0.03 PPL at ppl 5.5) for ~6%
    #: bs=1 decode throughput (the head is the single largest GEMM of a
    #: decode step) — opt-in for quality parity, default-on in benches.
    quantize_lm_head: bool = False

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
            "quantize_lm_head": self.quantize_lm_head,
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
    use_post_norms: bool = False          # gemma2 sandwich norms: extra
    # RMSNorm on each sub-layer OUTPUT (attn_post_norm/mlp_post_norm on
    # BlockParams), residual added after
    #: False = NO pre-norm on sub-layer inputs (olmo2: the ONLY norms are
    #: the post-norms — x + post_norm(attn(x)); attn_norm/mlp_norm are None)
    pre_norms: bool = True
    #: qk-norm width: False = per-head [head_dim] weights (qwen3/gemma3),
    #: True = one RMSNorm over the full [heads*head_dim] projection BEFORE
    #: the head reshape (olmo2; under TP the mean-square is psum-reduced
    #: over the model axis so shards see the full-width statistic)
    qk_norm_full: bool = False
    #: sliding-window attention width (mistral-v0.1 4096, gemma2 4096);
    #: None = global attention everywhere. Masking-only: the KV cache keeps
    #: the full context, and kernel paths are bypassed only when the window
    #: actually binds (cache len > window) — see modules/blocks.py
    sliding_window: Optional[int] = None
    #: every Nth layer is GLOBAL, the rest sliding (gemma2: 2 — alternating,
    #: sliding on even layer idx; gemma3: 6). None/0 = all layers sliding
    #: (mistral)
    sliding_window_pattern: Optional[int] = None
    attn_logit_softcap: Optional[float] = None   # gemma2: 50.0
    final_logit_softcap: Optional[float] = None  # gemma2: 30.0
    #: attention scale = query_pre_attn_scalar**-0.5 instead of
    #: head_dim**-0.5 (gemma2-9b: 256, -27b: hidden/heads). Folded into q
    #: once so every kernel path inherits it
    query_pre_attn_scalar: Optional[float] = None
    #: gemma3 dual rope: sliding-window layers use this rope theta (10000)
    #: with NO scaling, while global layers use rope_theta (1e6) with
    #: rope_scaling. Builds a second cos/sin table on ModelParams
    rope_local_theta: Optional[float] = None
    #: logits multiplier applied before final_logit_softcap (cohere
    #: logit_scale; granite 1/logits_scaling; minicpm dim_model_base/D)
    logit_scale: Optional[float] = None
    #: token-embedding multiplier (granite embedding_multiplier, minicpm
    #: scale_emb). Orthogonal to embed_scale (gemma's sqrt(D))
    embed_multiplier: Optional[float] = None
    #: sub-layer output multiplier before each residual add (granite
    #: residual_multiplier; minicpm scale_depth/sqrt(L))
    residual_multiplier: Optional[float] = None
    layernorm: str = "rmsnorm"            # "rmsnorm" | "layernorm"
    act_fn: str = "silu"                  # "silu" | "gelu" | "relu"
    #: MPT attn_config.clip_qkv: clamp the fused qkv ACTIVATIONS to
    #: [-clip, clip] before splitting (HF modeling_mpt applies it every
    #: attention call)
    qkv_clip: Optional[float] = None
    gated_mlp: bool = True                # swiglu vs plain 2-layer mlp
    # MoE (mixtral)
    num_local_experts: int = 0
    num_experts_per_tok: int = 2
    # -- DeepSeek-V2/V3 MLA (multi-head latent attention) --------------------
    #: latent rank of the compressed KV (v2/v3: 512). > 0 switches the
    #: attention to MLA: the cache holds ONLY [c_kv | k_pe] per token
    #: (kv_lora_rank + qk_rope_head_dim bytes regardless of head count)
    kv_lora_rank: int = 0
    q_lora_rank: Optional[int] = None     # v2/v3 full: 1536; lite: None
    qk_nope_head_dim: int = 128
    qk_rope_head_dim: int = 64
    v_head_dim: int = 128
    # -- DeepSeekMoE ----------------------------------------------------------
    n_shared_experts: int = 0             # always-on shared experts
    moe_intermediate_size: Optional[int] = None  # per-expert ffn width
    first_k_dense_replace: int = 0        # first K layers use a dense MLP
    moe_layer_freq: int = 1               # MoE every Nth layer after that
    n_group: Optional[int] = None         # group-limited routing
    topk_group: Optional[int] = None
    routed_scaling_factor: float = 1.0
    norm_topk_prob: bool = True
    scoring_func: str = "softmax"         # "softmax" (v2) | "sigmoid" (v3)
    #: router algorithm: "mixtral" = softmax over the top-k raw logits;
    #: "deepseek" = score-all-first + group-limited selection;
    #: "softmax_all" = softmax over ALL logits, then top-k of the scores
    #: (qwen2/3-MoE — differs from "mixtral" when norm_topk_prob=False)
    #: (see modules/blocks.py::moe_forward)
    moe_router: str = "mixtral"
    #: qwen2_moe: layers listed here use the dense MLP even on MoE models
    mlp_only_layers: tuple = ()
    #: qwen2_moe counts sparse layers as (layer+1) % freq == 0 (deepseek
    #: uses layer % freq == 0)
    moe_freq_shifted: bool = False
    #: width of the always-on shared expert (qwen2_moe
    #: shared_expert_intermediate_size); None = n_shared_experts *
    #: moe_intermediate_size (deepseek)
    shared_intermediate_size: Optional[int] = None
    #: qwen2_moe: the shared expert's output is gated by
    #: sigmoid(shared_expert_gate(x)) (a [D, 1] linear)
    shared_expert_gate: bool = False
    # norm epsilon name differences handled at import time

    @property
    def is_mla(self) -> bool:
        return self.kv_lora_rank > 0

    def layer_is_moe(self, layer_idx: int) -> bool:
        """DeepSeekMoE layer placement: dense for the first
        ``first_k_dense_replace`` layers, MoE every ``moe_layer_freq``-th
        after (mixtral: every layer)."""
        if not self.is_moe:
            return False
        if layer_idx < self.first_k_dense_replace:
            return False
        if layer_idx in self.mlp_only_layers:
            return False
        freq = max(self.moe_layer_freq, 1)
        if self.moe_freq_shifted:  # qwen2/3-MoE decoder_sparse_step
            return (layer_idx + 1) % freq == 0
        return layer_idx % freq == 0

    def __post_init__(self):
        if not isinstance(self.mlp_only_layers, tuple):
            # configs round-tripped through JSON deserialize lists; the
            # config must stay hashable (it is a static jit argument)
            object.__setattr__(
                self, "mlp_only_layers", tuple(self.mlp_only_layers or ())
            )
        if self.head_dim is None:
            object.__setattr__(
                self, "head_dim", self.hidden_size // self.num_attention_heads
            )
        if self.rope_scaling is not None and not isinstance(
            self.rope_scaling, tuple
        ):
            # normalize dict / JSON-round-tripped list to the hashable form;
            # numeric-list values (phi3 longrope short/long_factor,
            # qwen2-vl mrope_section) become tuples, other non-scalars drop
            items = (
                self.rope_scaling.items()
                if isinstance(self.rope_scaling, dict)
                else self.rope_scaling
            )
            object.__setattr__(
                self, "rope_scaling",
                tuple(sorted(
                    (k, tuple(v) if isinstance(v, (list, tuple)) else v)
                    for k, v in items
                    if isinstance(v, (str, int, float, bool, list, tuple))
                )),
            )

    @property
    def is_moe(self) -> bool:
        return self.num_local_experts > 0

    def layer_is_sliding(self, layer_idx: int) -> bool:
        """True iff this layer attends through a sliding window.

        With no pattern, every layer slides (mistral). With pattern N, every
        Nth layer is global and the rest slide (gemma2 N=2: sliding on even
        indices, matching HF's ``not bool(layer_idx % 2)``; gemma3 N=6)."""
        if self.sliding_window is None:
            return False
        n = self.sliding_window_pattern
        if not n:
            return True
        return (layer_idx + 1) % n != 0

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
        if mt == "gemma3" and isinstance(hf.get("text_config"), dict):
            # multimodal wrapper: the language tower carries the params
            return cls.from_hf_config(
                {**hf["text_config"], "model_type": "gemma3_text"}
            )
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
            rs = dict(rs)
            # HF stores the pre-extension length at the config TOP level
            # (phi3 longrope, dynamic NTK); rope_table reads it from the
            # scaling dict — inject it or the long/short regime test never
            # fires (ops/rope.py)
            if (
                "original_max_position_embeddings" not in rs
                and hf.get("original_max_position_embeddings")
            ):
                rs["original_max_position_embeddings"] = int(
                    hf["original_max_position_embeddings"]
                )
            rtype = rs.get("rope_type", rs.get("type"))
            if rtype == "dynamic":
                # dynamic NTK grows the table with the ACTUAL length; the
                # static-table approximation is a factor*L0 table with the
                # rescaled theta — extend max_position_embeddings so the
                # rescale actually binds (rope_table's L0 regime test)
                L0 = int(
                    rs.get(
                        "original_max_position_embeddings",
                        hf.get("max_position_embeddings", 2048),
                    )
                )
                rs.setdefault("original_max_position_embeddings", L0)
                kw["max_position_embeddings"] = int(
                    L0 * float(rs.get("factor", 1.0))
                )
            kw["rope_scaling"] = rs  # normalized to a tuple in __post_init__
        kw["tie_word_embeddings"] = hf.get("tie_word_embeddings", False)
        kw["attention_bias"] = hf.get("attention_bias", mt == "qwen")
        if "head_dim" in hf and hf["head_dim"]:
            kw["head_dim"] = hf["head_dim"]
        if mt == "mixtral":
            kw["num_local_experts"] = hf.get("num_local_experts", 8)
            kw["num_experts_per_tok"] = hf.get("num_experts_per_tok", 2)
        if hf.get("sliding_window") and (
            mt == "mistral" or hf.get("use_sliding_window")  # qwen2 opt-in
        ):
            kw["sliding_window"] = hf["sliding_window"]  # all layers sliding

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
            if attn_cfg.get("clip_qkv"):
                kw["qkv_clip"] = float(attn_cfg["clip_qkv"])
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
        elif mt in ("gemma3", "gemma3_text"):
            # gemma3 (HF modeling_gemma3): gemma2 minus the softcaps, plus
            # zero-centered per-head q/k RMSNorm and DUAL rope — sliding
            # layers (5 of every 6) at rope_local_base_freq with no
            # scaling, global layers at rope_theta with linear scaling
            kw["model_type"] = "gemma3"
            kw["act_fn"] = "gelu"
            kw["embed_scale"] = True
            kw["tie_word_embeddings"] = hf.get("tie_word_embeddings", True)
            kw["rms_norm_eps"] = hf.get("rms_norm_eps", 1e-6)
            kw["use_post_norms"] = True
            kw["use_qk_norm"] = True
            kw["query_pre_attn_scalar"] = hf.get("query_pre_attn_scalar", 256)
            kw["rope_theta"] = hf.get("rope_theta", 1e6)
            kw["rope_local_theta"] = hf.get("rope_local_base_freq", 1e4)
            if hf.get("sliding_window"):
                kw["sliding_window"] = hf["sliding_window"]
                kw["sliding_window_pattern"] = hf.get(
                    "sliding_window_pattern", 6
                )
        elif mt == "gemma2":
            # gemma2 (HF modeling_gemma2): gemma plus sandwich norms on both
            # sub-layer outputs, attention+final logit softcapping, custom
            # query scale, and alternating sliding-window/global layers
            kw["act_fn"] = "gelu"
            kw["embed_scale"] = True
            kw["tie_word_embeddings"] = True
            kw["rms_norm_eps"] = hf.get("rms_norm_eps", 1e-6)
            kw["use_post_norms"] = True
            kw["query_pre_attn_scalar"] = hf.get("query_pre_attn_scalar")
            kw["attn_logit_softcap"] = hf.get("attn_logit_softcapping", 50.0)
            kw["final_logit_softcap"] = hf.get(
                "final_logit_softcapping", 30.0
            )
            if hf.get("sliding_window"):
                kw["sliding_window"] = hf["sliding_window"]
                kw["sliding_window_pattern"] = 2
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
        elif mt in ("qwen2_moe", "qwen3_moe"):
            # HF modeling_qwen2_moe / modeling_qwen3_moe: softmax-over-all
            # routing, decoder_sparse_step placement counted from layer+1,
            # optional dense-MLP exception layers; qwen2 adds an always-on
            # shared expert gated by sigmoid(shared_expert_gate(x)) and
            # qkv biases, qwen3 per-head q/k RMSNorm instead
            kw["num_local_experts"] = hf.get("num_experts", 0)
            kw["num_experts_per_tok"] = hf.get("num_experts_per_tok", 4)
            kw["moe_router"] = "softmax_all"
            kw["norm_topk_prob"] = hf.get(
                "norm_topk_prob", mt == "qwen3_moe"
            )
            kw["moe_intermediate_size"] = hf.get("moe_intermediate_size")
            kw["moe_layer_freq"] = hf.get("decoder_sparse_step", 1)
            kw["moe_freq_shifted"] = True
            kw["mlp_only_layers"] = tuple(hf.get("mlp_only_layers") or ())
            if mt == "qwen2_moe":
                kw["attention_bias"] = True
                kw["shared_intermediate_size"] = hf.get(
                    "shared_expert_intermediate_size"
                )
                kw["shared_expert_gate"] = True
                kw["n_shared_experts"] = 1
            else:
                kw["use_qk_norm"] = True
                kw["attention_bias"] = hf.get("attention_bias", False)
        elif mt == "phi3":
            # phi3/phi3.5/phi4 (HF modeling_phi3): llama numerics with
            # FUSED qkv_proj / gate_up_proj checkpoint tensors, longrope
            # scaling (handled by rope_table), sliding window on all layers
            kw["rms_norm_eps"] = hf.get("rms_norm_eps", 1e-5)
            kw["tie_word_embeddings"] = hf.get("tie_word_embeddings", False)
            hd = kw.get("head_dim") or D // H
            if hf.get("partial_rotary_factor"):
                kw["rotary_dim"] = max(
                    2, int(hd * hf["partial_rotary_factor"])
                )
            if hf.get("sliding_window"):
                kw["sliding_window"] = hf["sliding_window"]
        elif mt == "starcoder2":
            # starcoder2 (HF modeling_starcoder2): gpt_bigcode's successor —
            # LayerNorm (w/ bias), plain gelu c_fc/c_proj MLP, RoPE, GQA,
            # biases on every linear (use_bias), tied lm_head
            kw["layernorm"] = "layernorm"
            kw["act_fn"] = "gelu"
            kw["gated_mlp"] = False
            kw["rms_norm_eps"] = hf.get("norm_epsilon", 1e-5)
            kw["attention_bias"] = hf.get("use_bias", True)
            kw["mlp_bias"] = hf.get("use_bias", True)
            kw["tie_word_embeddings"] = hf.get("tie_word_embeddings", True)
            if hf.get("sliding_window"):
                kw["sliding_window"] = hf["sliding_window"]
        elif mt == "stablelm":
            # stablelm/stablelm2 (HF modeling_stablelm): llama tree with
            # LayerNorm (w/ bias), partial rotary (25% default), optional
            # qkv bias (stablelm-2) and optional parallel residual (zephyr)
            kw["layernorm"] = "layernorm"
            kw["rms_norm_eps"] = hf.get("layer_norm_eps", 1e-5)
            kw["attention_bias"] = hf.get("use_qkv_bias", False)
            kw["parallel_residual"] = hf.get("use_parallel_residual", False)
            hd = kw.get("head_dim") or D // H
            kw["rotary_dim"] = max(
                2, int(hd * hf.get("partial_rotary_factor", 0.25))
            )
        elif mt == "internlm2":
            # internlm2 (HF modeling_internlm2): llama numerics, renamed
            # tensor tree, grouped fused wqkv, optional bias
            kw["attention_bias"] = hf.get("bias", False)
        elif mt in ("deepseek_v2", "deepseek_v3"):
            # deepseek v2/v3 (HF modeling_deepseek_v2/v3): MLA attention
            # (latent KV cache) + DeepSeekMoE (shared experts, group-limited
            # routing; v3 adds sigmoid scoring with a selection bias)
            kw["rms_norm_eps"] = hf.get("rms_norm_eps", 1e-6)
            kw["kv_lora_rank"] = hf.get("kv_lora_rank", 512)
            kw["q_lora_rank"] = hf.get("q_lora_rank")
            kw["qk_nope_head_dim"] = hf.get("qk_nope_head_dim", 128)
            kw["qk_rope_head_dim"] = hf.get("qk_rope_head_dim", 64)
            kw["v_head_dim"] = hf.get("v_head_dim", 128)
            kw["head_dim"] = kw["qk_nope_head_dim"] + kw["qk_rope_head_dim"]
            kw["rotary_dim"] = kw["qk_rope_head_dim"]
            if hf.get("n_routed_experts"):
                kw["num_local_experts"] = hf["n_routed_experts"]
                kw["num_experts_per_tok"] = hf.get("num_experts_per_tok", 6)
                kw["moe_router"] = "deepseek"
                kw["n_shared_experts"] = hf.get("n_shared_experts") or 0
                kw["moe_intermediate_size"] = hf.get("moe_intermediate_size")
                kw["first_k_dense_replace"] = hf.get(
                    "first_k_dense_replace", 0
                )
                kw["moe_layer_freq"] = hf.get("moe_layer_freq", 1)
                if hf.get("topk_method") in (
                    "group_limited_greedy", "noaux_tc",
                ):
                    kw["n_group"] = hf.get("n_group")
                    kw["topk_group"] = hf.get("topk_group")
                kw["routed_scaling_factor"] = hf.get(
                    "routed_scaling_factor", 1.0
                )
                kw["norm_topk_prob"] = hf.get("norm_topk_prob", True)
                kw["scoring_func"] = hf.get("scoring_func", "softmax")
        elif mt == "olmo2":
            # olmo2 (HF modeling_olmo2): llama tree where the ONLY norms
            # are post-norms on each sub-layer OUTPUT (x + norm(attn(x))),
            # plus full-projection-width RMSNorm on q/k before the head
            # reshape
            kw["use_post_norms"] = True
            kw["pre_norms"] = False
            kw["use_qk_norm"] = True
            kw["qk_norm_full"] = True
        elif mt == "cohere":
            # cohere command-r/r+ (HF modeling_cohere): bias-free LayerNorm,
            # parallel attn+mlp on ONE shared input norm, logit_scale on the
            # logits, tied embeddings, optional per-head q/k LayerNorm (r+),
            # INTERLEAVED rope (converted to rotate-half by an import-time
            # channel permutation, like gptj — see _import_cohere)
            kw["layernorm"] = "layernorm"
            kw["parallel_residual"] = True
            kw["rms_norm_eps"] = hf.get("layer_norm_eps", 1e-5)
            kw["logit_scale"] = hf.get("logit_scale", 0.0625)
            kw["tie_word_embeddings"] = True
            kw["use_qk_norm"] = hf.get("use_qk_norm", False)
        elif mt == "granite":
            # granite (HF modeling_granite): llama tree + four static
            # multipliers (mup-style width scaling)
            kw["embed_multiplier"] = hf.get("embedding_multiplier")
            kw["residual_multiplier"] = hf.get("residual_multiplier")
            if hf.get("logits_scaling"):
                kw["logit_scale"] = 1.0 / hf["logits_scaling"]
            am = hf.get("attention_multiplier")
            if am:
                # attention scale = am; folded via query_pre_attn_scalar
                # (scale = qpas**-0.5), shared with the gemma2 mechanism
                kw["query_pre_attn_scalar"] = am ** -2
            kw["tie_word_embeddings"] = hf.get("tie_word_embeddings", True)
        elif mt == "minicpm":
            # minicpm 1/2 (modeling_minicpm): llama tree + mup multipliers —
            # scale_emb on embeddings, scale_depth/sqrt(L) on residual
            # branches, dim_model_base/D on logits
            kw["embed_multiplier"] = hf.get("scale_emb")
            sd = hf.get("scale_depth")
            if sd:
                kw["residual_multiplier"] = (
                    sd / kw["num_hidden_layers"] ** 0.5
                )
            if hf.get("dim_model_base"):
                kw["logit_scale"] = hf["dim_model_base"] / D
            kw["tie_word_embeddings"] = hf.get("tie_word_embeddings", True)
        elif mt == "baichuan":
            # Baichuan-13B is the ALiBi variant (reference models/baichuan.py:116);
            # the 7B uses RoPE. Distinguish by width.
            if D >= 5120:
                kw["use_alibi"] = True
                kw["use_rope"] = False
        return cls(**kw)
