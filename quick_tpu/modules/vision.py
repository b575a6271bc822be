"""CLIP vision tower + LLaVA multimodal projector (pure JAX, float).

TPU-native replacement for the vision half of the reference's LLaVA
support: the reference keeps the HF ``LlavaForConditionalGeneration``
module tree and only swaps the language tower's linears/blocks
(quick/awq/models/llava.py:13-129 — vision runs fp16, unquantized, and
HF splices image features into the input embeddings). Here the vision
encoder is re-implemented as a functional JAX module so the whole
image+text forward jits on TPU; the language tower stays the quantized
``model_forward`` path, consuming ``inputs_embeds``.

Conventions match HF ``CLIPVisionModel`` (modeling_clip.py) with
LLaVA-1.5 defaults: pre-LN encoder blocks, quick_gelu MLP, class token,
learned position embeddings, feature layer -2, "default" feature-select
strategy (drop CLS), two-layer GELU projector (modeling_llava.py).
"""
from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp

from quick_tpu.modules.linear import Linear


@dataclasses.dataclass(frozen=True)
class VisionConfig:
    """CLIP-ViT shape parameters (HF vision_config fields)."""

    hidden_size: int = 1024
    intermediate_size: int = 4096
    num_hidden_layers: int = 24
    num_attention_heads: int = 16
    image_size: int = 336
    patch_size: int = 14
    layer_norm_eps: float = 1e-5
    projection_dim: int = 768          # unused by llava (no pooled head)
    vision_feature_layer: int = -2     # llava default
    vision_feature_select_strategy: str = "default"  # drop CLS
    image_token_index: int = 32000     # llava <image> id (top-level config)

    @property
    def num_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2

    @classmethod
    def from_hf_config(cls, hf: dict) -> "VisionConfig":
        v = hf.get("vision_config", hf)
        return cls(
            hidden_size=v.get("hidden_size", 1024),
            intermediate_size=v.get("intermediate_size", 4096),
            num_hidden_layers=v.get("num_hidden_layers", 24),
            num_attention_heads=v.get("num_attention_heads", 16),
            image_size=v.get("image_size", 336),
            patch_size=v.get("patch_size", 14),
            layer_norm_eps=v.get("layer_norm_eps", 1e-5),
            projection_dim=v.get("projection_dim", 768),
            vision_feature_layer=hf.get("vision_feature_layer", -2),
            vision_feature_select_strategy=hf.get(
                "vision_feature_select_strategy", "default"
            ),
            image_token_index=hf.get("image_token_index", 32000),
        )


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class VisionBlockParams:
    """One pre-LN CLIP encoder layer."""

    ln1: jax.Array
    ln1_bias: jax.Array
    qkv: Linear          # fused q/k/v (concat on N, each with bias)
    o: Linear
    ln2: jax.Array
    ln2_bias: jax.Array
    fc1: Linear
    fc2: Linear


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class VisionParams:
    """CLIP vision tower + llava projector."""

    patch_embed: jax.Array        # [3*p*p, D] (conv kernel as matmul)
    class_embed: jax.Array        # [D]
    pos_embed: jax.Array          # [1 + n_patches, D]
    pre_ln: jax.Array
    pre_ln_bias: jax.Array
    blocks: List[VisionBlockParams]
    proj1: Linear                 # multi_modal_projector.linear_1
    proj2: Linear                 # multi_modal_projector.linear_2


def _layer_norm(x, w, b, eps):
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = ((xf - mu) ** 2).mean(-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    return (y * w + b).astype(x.dtype)


def _quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


def vision_forward(
    vp: VisionParams,
    vcfg: VisionConfig,
    pixel_values: jax.Array,  # [B, 3, H, W] float (CLIP-normalized)
) -> jax.Array:
    """Image features for the language tower: [B, n_patches, D_lm].

    Runs the CLIP encoder to ``vision_feature_layer``, selects patch
    tokens, and applies the llava projector."""
    B = pixel_values.shape[0]
    p, D = vcfg.patch_size, vcfg.hidden_size
    nh = vcfg.image_size // p

    # patch "conv" as a matmul: [B,3,H,W] -> [B, nh*nw, 3*p*p] @ [3pp, D].
    # Patch vector order (c, ph, pw) matches the HF conv kernel flatten in
    # the importer (load_vision_tower).
    x = pixel_values.reshape(B, 3, nh, p, nh, p)
    x = x.transpose(0, 2, 4, 1, 3, 5).reshape(B, nh * nh, 3 * p * p)
    x = jnp.dot(
        x.astype(jnp.bfloat16), vp.patch_embed.astype(jnp.bfloat16)
    )
    cls = jnp.broadcast_to(
        vp.class_embed.astype(x.dtype)[None, None, :], (B, 1, D)
    )
    x = jnp.concatenate([cls, x], axis=1)  # [B, 1+P, D]
    x = x + vp.pos_embed.astype(x.dtype)[None]
    x = _layer_norm(x, vp.pre_ln, vp.pre_ln_bias, vcfg.layer_norm_eps)

    # vision_feature_layer indexes HF's hidden_states tuple (embeddings +
    # one entry per layer, L+1 total): index i means "run i layers";
    # llava's default -2 runs all but the last layer
    layer = vcfg.vision_feature_layer
    n_run = len(vp.blocks) + 1 + layer if layer < 0 else layer
    n_run = min(max(n_run, 0), len(vp.blocks))

    hq = vcfg.num_attention_heads
    hd = D // hq
    scale = hd ** -0.5
    for blk in vp.blocks[:n_run]:
        h = _layer_norm(x, blk.ln1, blk.ln1_bias, vcfg.layer_norm_eps)
        qkv = blk.qkv(h)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        S = q.shape[1]
        q = q.reshape(B, S, hq, hd)
        k = k.reshape(B, S, hq, hd)
        v = v.reshape(B, S, hq, hd)
        scores = jnp.einsum(
            "bshd,bthd->bhst", q, k, preferred_element_type=jnp.float32
        ) * scale
        attn = jax.nn.softmax(scores, axis=-1)
        ctx = jnp.einsum(
            "bhst,bthd->bshd", attn.astype(v.dtype), v,
            preferred_element_type=jnp.float32,
        ).astype(x.dtype).reshape(B, S, D)
        x = x + blk.o(ctx)
        h = _layer_norm(x, blk.ln2, blk.ln2_bias, vcfg.layer_norm_eps)
        x = x + blk.fc2(_quick_gelu(blk.fc1(h)))

    if vcfg.vision_feature_select_strategy == "default":
        x = x[:, 1:]  # drop CLS
    # llava projector: linear -> gelu -> linear, into the LM hidden size
    x = vp.proj2(jax.nn.gelu(vp.proj1(x), approximate=False))
    return x


def splice_image_features(
    text_embeds: jax.Array,   # [B, S, D_lm]
    image_feats: jax.Array,   # [B, P, D_lm] (or [N_img, P, D] flattened)
    tokens: jax.Array,        # [B, S]
    image_token_id: int,
) -> jax.Array:
    """Replace image-token positions with projected patch features.

    Follows the HF processor convention: the prompt already contains
    ``n_patches`` repeated image tokens per image (in order); features
    fill those slots left-to-right across the flattened batch."""
    B, S, D = text_embeds.shape
    flat_tok = tokens.reshape(-1)
    mask = flat_tok == image_token_id
    feats = image_feats.reshape(-1, D).astype(text_embeds.dtype)
    idx = jnp.clip(jnp.cumsum(mask) - 1, 0, feats.shape[0] - 1)
    spliced = jnp.where(
        mask[:, None], feats[idx], text_embeds.reshape(-1, D)
    )
    return spliced.reshape(B, S, D)


def init_vision_params(
    vcfg: VisionConfig, key: jax.Array, lm_hidden: int, dtype=jnp.bfloat16
) -> VisionParams:
    """Random init (hermetic tests/benches)."""
    D, F, p = vcfg.hidden_size, vcfg.intermediate_size, vcfg.patch_size
    ks = jax.random.split(key, vcfg.num_hidden_layers + 2)

    def lin(k, kin, kout):
        k1, k2 = jax.random.split(k)
        return Linear(
            jax.random.normal(k1, (kin, kout), dtype) * 0.02,
            jnp.zeros((kout,), dtype),
        )

    blocks = []
    for i in range(vcfg.num_hidden_layers):
        k1, k2, k3, k4 = jax.random.split(ks[i], 4)
        blocks.append(VisionBlockParams(
            ln1=jnp.ones((D,), jnp.float32),
            ln1_bias=jnp.zeros((D,), jnp.float32),
            qkv=lin(k1, D, 3 * D),
            o=lin(k2, D, D),
            ln2=jnp.ones((D,), jnp.float32),
            ln2_bias=jnp.zeros((D,), jnp.float32),
            fc1=lin(k3, D, F),
            fc2=lin(k4, F, D),
        ))
    k1, k2, k3, k4 = jax.random.split(ks[-1], 4)
    return VisionParams(
        patch_embed=jax.random.normal(k1, (3 * p * p, D), dtype) * 0.02,
        class_embed=jax.random.normal(k2, (D,), dtype) * 0.02,
        pos_embed=jax.random.normal(
            k3, (1 + vcfg.num_patches, D), dtype
        ) * 0.02,
        pre_ln=jnp.ones((D,), jnp.float32),
        pre_ln_bias=jnp.zeros((D,), jnp.float32),
        blocks=blocks,
        proj1=lin(k4, D, lm_hidden),
        proj2=lin(ks[-2], lm_hidden, lm_hidden),
    )
