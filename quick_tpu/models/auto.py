"""High-level model API — the ``AutoAWQForCausalLM`` equivalent.

Mirrors the reference's user surface (quick/awq/models/auto.py:37-99 and
models/base.py:68-194):

    model = AutoQuickModel.from_pretrained(hf_dir)        # float import
    model.quantize(calib_tokens, quant_config)            # AWQ search+pack
    model.save_quantized(out_dir)
    model = AutoQuickModel.from_quantized(out_dir)        # serve path
    out = model.generate(tokens, max_new_tokens=...)

The model-type registry mirrors AWQ_CAUSAL_LM_MODEL_MAP
(reference models/auto.py:6-24); Llama-like types all share one runtime,
differing only in ModelConfig switches.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import jax
import jax.numpy as jnp

from quick_tpu.config import ModelConfig, QuantConfig

#: model_type -> config switch overrides (the adapter registry; analog of
#: reference models/auto.py:6-24 which maps 17 model types).
MODEL_TYPE_MAP: Dict[str, dict] = {
    "llama": {},
    "mistral": {},
    "vicuna": {},          # llama arch
    "yi": {},              # llama arch
    "aquila": {},          # llama arch
    "qwen2": {},
    "qwen": {"attention_bias": True},
    "mixtral": {},         # MoE handled via num_local_experts
    "gpt_neox": {"parallel_residual": True, "layernorm": "layernorm",
                 "act_fn": "gelu", "gated_mlp": False},
    "gptj": {"parallel_residual": True, "layernorm": "layernorm",
             "act_fn": "gelu", "gated_mlp": False},
    "opt": {"use_rope": False, "layernorm": "layernorm", "act_fn": "gelu",
            "gated_mlp": False},
    "bloom": {"use_rope": False, "use_alibi": True, "layernorm": "layernorm",
              "act_fn": "gelu", "gated_mlp": False},
    "mpt": {"use_rope": False, "use_alibi": True, "layernorm": "layernorm",
            "act_fn": "gelu", "gated_mlp": False},
    "falcon": {"parallel_residual": True, "layernorm": "layernorm",
               "act_fn": "gelu", "gated_mlp": False},
    "baichuan": {},
    "gpt_bigcode": {"layernorm": "layernorm", "act_fn": "gelu",
                    "gated_mlp": False},
    "llava": {},           # language tower is llama; vision tower external
    # post-reference families (no reference analog — current-gen coverage)
    "phi": {"parallel_residual": True, "layernorm": "layernorm",
            "act_fn": "gelu", "gated_mlp": False, "attention_bias": True,
            "mlp_bias": True},
    "gemma": {"act_fn": "gelu", "embed_scale": True,
              "tie_word_embeddings": True},
    "gemma2": {"act_fn": "gelu", "embed_scale": True,
               "tie_word_embeddings": True, "use_post_norms": True,
               "attn_logit_softcap": 50.0, "final_logit_softcap": 30.0},
    "gemma3": {"act_fn": "gelu", "embed_scale": True,
               "tie_word_embeddings": True, "use_post_norms": True,
               "use_qk_norm": True},
    "qwen3": {"use_qk_norm": True},
    "qwen2_moe": {
        "moe_router": "softmax_all", "moe_freq_shifted": True,
        "attention_bias": True, "shared_expert_gate": True,
        "n_shared_experts": 1, "norm_topk_prob": False,
    },
    "qwen3_moe": {
        "use_qk_norm": True, "moe_router": "softmax_all",
        "moe_freq_shifted": True, "norm_topk_prob": True,
    },
    "phi3": {},
    "cohere": {"layernorm": "layernorm", "parallel_residual": True,
               "tie_word_embeddings": True, "logit_scale": 0.0625},
    "granite": {"tie_word_embeddings": True},
    "olmo2": {"use_post_norms": True, "pre_norms": False,
              "use_qk_norm": True, "qk_norm_full": True},
    "minicpm": {"tie_word_embeddings": True},
    "starcoder2": {"layernorm": "layernorm", "act_fn": "gelu",
                   "gated_mlp": False, "attention_bias": True,
                   "mlp_bias": True, "tie_word_embeddings": True},
    "stablelm": {"layernorm": "layernorm"},
    "internlm2": {},
    "deepseek_v2": {"moe_router": "deepseek"},
    "deepseek_v3": {"moe_router": "deepseek", "scoring_func": "sigmoid"},
}


def check_and_get_model_type(
    model_type: str, allow_fallback: bool = False
) -> str:
    """Validate a model type against the registry (analog of
    reference models/auto.py:27-33).

    ``allow_fallback=True`` is the generality analog of the reference's
    unfused ``from_quantized`` path (reference models/base.py:241-335,
    which runs ANY HF architecture through transformers): an unmapped
    type whose tensors already imported via the generic llama schema is
    accepted with a warning instead of a hard error — most current
    releases are llama-schema clones with a new model_type string."""
    if model_type not in MODEL_TYPE_MAP:
        if allow_fallback:
            import warnings

            warnings.warn(
                f"model_type '{model_type}' is not in the registry; it "
                "was imported via the generic llama-family fallback and "
                "will RUN with llama-family semantics. Verify outputs "
                "against the source model — family-specific switches "
                "(norm kind, softcaps, windows, qk-norm, ...) are NOT "
                "auto-detected.",
                stacklevel=2,
            )
            return model_type
        raise TypeError(
            f"{model_type} isn't supported yet. Supported: "
            f"{sorted(MODEL_TYPE_MAP)}"
        )
    return model_type


def apply_model_type(cfg: ModelConfig) -> ModelConfig:
    overrides = MODEL_TYPE_MAP.get(cfg.model_type, {})
    return dataclasses.replace(cfg, **overrides) if overrides else cfg


class AutoQuickModel:
    """Stateful convenience wrapper over the functional core."""

    def __init__(
        self,
        params,
        cfg: ModelConfig,
        qcfg: Optional[QuantConfig] = None,
        model_dir: Optional[str] = None,
    ):
        from quick_tpu.modules.linear import cast_scales, scales_dtype_env

        # single choke point for every load path (from_quantized /
        # from_gguf / from_random / quantize): opt-in bf16 scale streaming
        self.params = cast_scales(params, scales_dtype_env())
        self.cfg = cfg
        self.qcfg = qcfg
        self.model_dir = model_dir
        self._tokenizer = None
        self._vision = None  # lazy (VisionParams, VisionConfig) — see .vision

    @property
    def tokenizer(self):
        """Lazy HF tokenizer from the checkpoint dir (the reference returns
        the tokenizer separately; here it rides along, auto.py:47-52)."""
        if self._tokenizer is None:
            from transformers import AutoTokenizer

            gguf = getattr(self, "gguf_path", None)
            if gguf is not None:
                # transformers loads GGUF-embedded tokenizers via the
                # gguf_file kwarg on the CONTAINING directory
                import os

                self._tokenizer = AutoTokenizer.from_pretrained(
                    os.path.dirname(os.path.abspath(gguf)) or ".",
                    gguf_file=os.path.basename(gguf),
                )
            elif self.model_dir is None:
                raise ValueError(
                    "no model_dir — construct via from_pretrained/"
                    "from_quantized or set .model_dir"
                )
            else:
                self._tokenizer = AutoTokenizer.from_pretrained(
                    self.model_dir
                )
        return self._tokenizer

    # -- constructors --------------------------------------------------------
    @classmethod
    def from_pretrained(cls, model_dir: str, dtype=jnp.bfloat16) -> "AutoQuickModel":
        """Import an HF float checkpoint (reference base.py:196-239)."""
        from quick_tpu.utils.checkpoint import load_hf_float

        params, cfg = load_hf_float(model_dir, dtype)
        check_and_get_model_type(cfg.model_type, allow_fallback=True)
        # cfg comes from ModelConfig.from_hf_config, which is authoritative
        # for family switches — MODEL_TYPE_MAP is not re-applied here
        return cls(params, cfg, model_dir=model_dir)

    @classmethod
    def from_quantized(cls, model_dir: str) -> "AutoQuickModel":
        """Load a quantized checkpoint — native QTPU or AutoAWQ GEMM
        (reference base.py:241-335 + the GEMM repack path)."""
        from quick_tpu.utils.checkpoint import load_autoawq, load_quantized

        qcfg = QuantConfig.from_pretrained(model_dir)
        if qcfg.version.lower() in ("gemm", "gemv", "exllama", "exllamav2"):
            params, cfg, qcfg = load_autoawq(model_dir)
            qcfg = dataclasses.replace(qcfg, version="qtpu")
        else:
            params, cfg, qcfg = load_quantized(model_dir)
        check_and_get_model_type(cfg.model_type, allow_fallback=True)
        return cls(params, cfg, qcfg, model_dir=model_dir)

    @classmethod
    def from_gguf(cls, path: str) -> "AutoQuickModel":
        """Load a llama.cpp GGUF file (no reference analog).

        Q4_0/Q4_1/Q4_K tensors import BIT-EXACTLY onto the fused kernel's
        (scales, zeros_x_scales) contract at group_size 32; other quant
        types re-quantize to int4 g=32 — see utils/gguf.py."""
        from quick_tpu.utils.gguf import load_gguf

        params, cfg, qcfg = load_gguf(path)
        check_and_get_model_type(cfg.model_type)
        m = cls(params, cfg, qcfg)
        m.gguf_path = path  # tokenizer property loads via gguf_file=
        return m

    @classmethod
    def from_random(
        cls, cfg: ModelConfig, seed: int = 0, dtype=jnp.bfloat16
    ) -> "AutoQuickModel":
        """Random-init float model (hermetic testing/benching)."""
        from quick_tpu.models.model import init_float_params

        cfg = apply_model_type(cfg)
        return cls(
            init_float_params(cfg, jax.random.PRNGKey(seed), dtype), cfg
        )

    # -- pipeline ------------------------------------------------------------
    def quantize(
        self,
        calib_tokens=None,
        quant_config: Optional[QuantConfig] = None,
        use_awq_search: bool = True,
        verbose: bool = True,
    ) -> "AutoQuickModel":
        """AWQ scale/clip search + quantize + pack (reference base.py:91-121).

        With ``use_awq_search=False`` (or no calibration data) falls back to
        plain RTN quantization."""
        from quick_tpu.models.model import quantize_params
        from quick_tpu.quantize.awq import awq_quantize_model

        qcfg = quant_config or QuantConfig()
        if use_awq_search and calib_tokens is not None:
            self.params = awq_quantize_model(
                self.params, self.cfg, calib_tokens, qcfg, verbose=verbose
            )
        else:
            self.params = quantize_params(
                self.params, self.cfg, qcfg.q_group_size, qcfg.zero_point,
                modules_to_not_convert=qcfg.modules_to_not_convert,
            )
        self.qcfg = qcfg
        return self

    def save_quantized(self, save_dir: str, awq_format: bool = False) -> None:
        """Persist the quantized model. ``awq_format=True`` writes an
        AutoAWQ-GEMM-compatible checkpoint instead of the native QTPU one
        (the reference's ``export_compatible`` artifact, models/base.py:
        123-138) — loadable by AutoAWQ/vLLM and by ``from_quantized``."""
        from quick_tpu.utils.checkpoint import export_autoawq, save_quantized

        if self.qcfg is None:
            raise ValueError("model is not quantized; call .quantize() first")
        if awq_format:
            export_autoawq(self.params, self.cfg, self.qcfg, save_dir)
        else:
            save_quantized(self.params, self.cfg, self.qcfg, save_dir)
        if self.cfg.model_type == "llava" and self.model_dir is not None:
            # carry the float vision tower along (reference keeps it as
            # the unquantized HF submodule; here it's a safetensors
            # side-car read back by load_vision_tower)
            from quick_tpu.utils.checkpoint import save_vision_tower

            save_vision_tower(self.model_dir, save_dir)

    # -- inference -----------------------------------------------------------
    @property
    def vision(self):
        """Lazy (VisionParams, VisionConfig) for multimodal checkpoints
        (llava) — the TPU-native replacement for the reference's float HF
        vision submodule (models/llava.py:13-129). None for text-only
        models."""
        if self._vision is None and self.model_dir is not None:
            from quick_tpu.utils.checkpoint import load_vision_tower

            self._vision = load_vision_tower(self.model_dir)
        return self._vision if self._vision is not None else (None, None)

    def embed_multimodal(self, tokens, pixel_values):
        """Text embeddings with image features spliced at <image> tokens
        (tokens must carry the HF-processor-expanded image token runs)."""
        from quick_tpu.modules.vision import (
            splice_image_features, vision_forward,
        )

        vp, vcfg = self.vision
        if vp is None:
            raise ValueError(
                "no vision tower: not a multimodal checkpoint "
                f"(model_type={self.cfg.model_type})"
            )
        feats = vision_forward(vp, vcfg, pixel_values)
        text = self.params.embed[tokens]
        return splice_image_features(
            text, feats, tokens, vcfg.image_token_index
        )

    def generate(self, tokens, max_new_tokens: int = 128,
                 pixel_values=None, **kw):
        from quick_tpu.runtime.generate import generate

        if pixel_values is not None:
            kw["inputs_embeds"] = self.embed_multimodal(tokens, pixel_values)
        return generate(self.params, self.cfg, tokens, max_new_tokens, **kw)

    def generate_text(
        self, prompt: str, max_new_tokens: int = 128, sampling=None,
        seed: int = 0,
    ) -> str:
        """Tokenize → generate → decode (convenience; needs a tokenizer)."""
        import numpy as np

        from quick_tpu.runtime.generate import SamplingParams

        tok = self.tokenizer
        ids = tok.encode(prompt)
        out = self.generate(
            jnp.asarray([ids], jnp.int32), max_new_tokens,
            sampling=sampling or SamplingParams(),
            key=jax.random.PRNGKey(seed),
            eos_token_id=tok.eos_token_id,
        )
        new = np.asarray(out)[0, len(ids):]
        return tok.decode(new, skip_special_tokens=True)

    def forward(self, tokens, cache=None):
        from quick_tpu.models.model import model_forward

        return model_forward(self.params, self.cfg, tokens, cache)

    def shard(self, tp: int = 1, dp: int = 1):
        """Shard over a device mesh; returns (mesh, sharded_params, fn)."""
        from quick_tpu.parallel import (
            create_mesh,
            shard_params,
            sharded_forward_fn,
        )

        mesh = create_mesh(tp=tp, dp=dp)
        sharded = shard_params(self.params, self.cfg, mesh)
        fn = jax.jit(sharded_forward_fn(self.cfg, mesh)(self.params))
        return mesh, sharded, fn
