"""LLaVA vision tower: HF-CLIP parity, splice semantics, save round-trip.

The reference serves LLaVA by quantizing only the language tower and
keeping the HF float vision modules (quick/awq/models/llava.py:13-129);
here the vision tower is re-implemented in JAX (modules/vision.py), so
these tests check it against the actual HF CLIP forward."""
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quick_tpu.modules.vision import (
    VisionConfig,
    init_vision_params,
    splice_image_features,
    vision_forward,
)

TINY = dict(
    hidden_size=64, intermediate_size=128, num_hidden_layers=3,
    num_attention_heads=4, image_size=28, patch_size=14,
)  # 4 patches


def _torch_clip_and_projector(lm_hidden=32):
    import torch
    from transformers import CLIPVisionConfig
    from transformers.models.clip.modeling_clip import CLIPVisionModel

    torch.manual_seed(0)
    cfg = CLIPVisionConfig(**TINY)
    model = CLIPVisionModel(cfg).eval()
    proj1 = torch.nn.Linear(TINY["hidden_size"], lm_hidden)
    proj2 = torch.nn.Linear(lm_hidden, lm_hidden)
    return model, proj1, proj2


def _export_llava_dir(tmp_path, model, proj1, proj2, lm_hidden=32):
    """Write a synthetic llava checkpoint dir: vision tensors under HF
    names + a config.json with vision_config (no LM tensors needed for
    load_vision_tower)."""
    from safetensors.numpy import save_file

    store = {}
    for k, v in model.state_dict().items():
        store["vision_tower." + k] = v.numpy()
    store["multi_modal_projector.linear_1.weight"] = proj1.weight.detach().numpy()
    store["multi_modal_projector.linear_1.bias"] = proj1.bias.detach().numpy()
    store["multi_modal_projector.linear_2.weight"] = proj2.weight.detach().numpy()
    store["multi_modal_projector.linear_2.bias"] = proj2.bias.detach().numpy()
    d = str(tmp_path)
    os.makedirs(d, exist_ok=True)
    save_file(store, os.path.join(d, "model.safetensors"))
    with open(os.path.join(d, "config.json"), "w") as f:
        json.dump({
            "model_type": "llava",
            "vision_config": TINY,
            "image_token_index": 99,
            "vision_feature_layer": -2,
        }, f)
    return d


def test_vision_forward_matches_hf_clip(tmp_path):
    torch = pytest.importorskip("torch")
    model, proj1, proj2 = _torch_clip_and_projector()
    d = _export_llava_dir(tmp_path, model, proj1, proj2)

    from quick_tpu.utils.checkpoint import load_vision_tower

    vp, vcfg = load_vision_tower(d, dtype=jnp.float32)
    assert vp is not None and vcfg.image_token_index == 99

    rng = np.random.default_rng(0)
    pix = rng.standard_normal((2, 3, 28, 28)).astype(np.float32)
    ours = np.asarray(
        vision_forward(vp, vcfg, jnp.asarray(pix)), np.float32
    )

    with torch.no_grad():
        hs = model(torch.from_numpy(pix), output_hidden_states=True).hidden_states
        feats = hs[-2][:, 1:]  # llava: layer -2, drop CLS
        ref = proj2(torch.nn.functional.gelu(proj1(feats))).numpy()
    assert ours.shape == ref.shape == (2, 4, 32)
    # bf16 matmuls inside vision_forward -> ~1% tolerance
    scale = np.abs(ref).max() + 1e-6
    assert np.abs(ours - ref).max() / scale < 2e-2


def test_splice_image_features():
    D = 8
    text = jnp.zeros((2, 6, D), jnp.float32)
    feats = jnp.stack([
        jnp.full((3, D), 1.0), jnp.full((3, D), 2.0)
    ])  # one image per row, 3 patches
    toks = jnp.asarray([
        [5, 99, 99, 99, 7, 8],
        [99, 99, 99, 5, 6, 7],
    ], jnp.int32)
    out = np.asarray(splice_image_features(text, feats, toks, 99))
    assert (out[0, 1:4] == 1.0).all() and (out[0, 0] == 0).all()
    assert (out[1, 0:3] == 2.0).all() and (out[1, 3:] == 0).all()


def test_generate_with_pixel_values(tmp_path):
    """End-to-end: random tiny llava LM + real vision params -> generate
    with pixel_values runs and differs from the text-only generation."""
    pytest.importorskip("torch")
    from quick_tpu import ModelConfig
    from quick_tpu.models.auto import AutoQuickModel

    model, proj1, proj2 = _torch_clip_and_projector(lm_hidden=128)
    d = _export_llava_dir(tmp_path, model, proj1, proj2)

    cfg = ModelConfig(
        vocab_size=128, hidden_size=128, intermediate_size=256,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64, model_type="llava")
    m = AutoQuickModel.from_random(cfg).quantize(use_awq_search=False)
    m.model_dir = d
    m._vision = None

    toks = jnp.asarray([[1, 99, 99, 99, 99, 2, 3]], jnp.int32)
    pix = jnp.asarray(
        np.random.default_rng(0).standard_normal((1, 3, 28, 28)), jnp.float32
    )
    out = m.generate(toks, max_new_tokens=4, pixel_values=pix)
    assert out.shape == (1, 11)
    out_text_only = m.generate(toks, max_new_tokens=4)
    assert out.shape == out_text_only.shape


def test_save_quantized_roundtrips_vision(tmp_path):
    pytest.importorskip("torch")
    from quick_tpu import ModelConfig
    from quick_tpu.models.auto import AutoQuickModel
    from quick_tpu.config import QuantConfig

    model, proj1, proj2 = _torch_clip_and_projector(lm_hidden=128)
    src = _export_llava_dir(tmp_path / "src", model, proj1, proj2)

    cfg = ModelConfig(
        vocab_size=128, hidden_size=128, intermediate_size=256,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64, model_type="llava")
    m = AutoQuickModel.from_random(cfg).quantize(use_awq_search=False)
    m.model_dir = src
    out_dir = str(tmp_path / "out")
    m.save_quantized(out_dir)
    assert os.path.exists(os.path.join(out_dir, "vision.safetensors"))

    m2 = AutoQuickModel.from_quantized(out_dir)
    vp, vcfg = m2.vision
    assert vp is not None and vcfg.image_token_index == 99
    pix = jnp.asarray(
        np.random.default_rng(1).standard_normal((1, 3, 28, 28)), jnp.float32
    )
    feats = vision_forward(vp, vcfg, pix)
    assert feats.shape == (1, 4, 128)


def test_init_vision_params_shapes():
    vcfg = VisionConfig(**TINY)
    vp = init_vision_params(vcfg, jax.random.PRNGKey(0), lm_hidden=32)
    pix = jnp.zeros((1, 3, 28, 28), jnp.float32)
    feats = vision_forward(vp, vcfg, pix)
    assert feats.shape == (1, vcfg.num_patches, 32)
