"""Checkpoint IO: native save/load round trip, HF import, AutoAWQ import."""
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from safetensors.numpy import save_file

from quick_tpu import ModelConfig, QuantConfig
from quick_tpu.models import init_float_params, model_forward, quantize_params
from quick_tpu.models.auto import AutoQuickModel
from quick_tpu.quantize.calib import get_calib_tokens
from quick_tpu.utils.checkpoint import (
    load_autoawq,
    load_hf_float,
    load_quantized,
    save_quantized,
)

CFG = ModelConfig(
    vocab_size=128, hidden_size=64, intermediate_size=128,
    num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
    max_position_embeddings=32,
)


def test_native_round_trip(tmp_path):
    p = init_float_params(CFG, jax.random.PRNGKey(0))
    qp = quantize_params(p, CFG, group_size=32)
    qcfg = QuantConfig(q_group_size=32)
    save_quantized(qp, CFG, qcfg, str(tmp_path))
    assert os.path.exists(tmp_path / "model.safetensors")
    assert os.path.exists(tmp_path / "quant_config.json")

    params2, cfg2, qcfg2 = load_quantized(str(tmp_path))
    assert cfg2.hidden_size == CFG.hidden_size
    assert qcfg2.q_group_size == 32
    toks = jnp.arange(8, dtype=jnp.int32).reshape(1, 8)
    l1, _ = model_forward(qp, CFG, toks)
    l2, _ = model_forward(params2, cfg2, toks)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), atol=1e-5)


def test_awq_export_roundtrip(tmp_path):
    """save_quantized(awq_format=True) writes an AutoAWQ GEMM checkpoint
    that loads back through the AWQ importer with matching logits (the
    reference export_compatible artifact, models/base.py:123-138)."""
    p = init_float_params(CFG, jax.random.PRNGKey(3))
    qp = quantize_params(p, CFG, group_size=32)
    qcfg = QuantConfig(q_group_size=32)
    model = AutoQuickModel(qp, CFG, qcfg)
    out = str(tmp_path / "awq")
    model.save_quantized(out, awq_format=True)
    assert os.path.exists(os.path.join(out, "model.safetensors"))
    with open(os.path.join(out, "quant_config.json")) as f:
        assert json.load(f)["version"] == "gemm"

    m2 = AutoQuickModel.from_quantized(out)
    toks = jnp.arange(8, dtype=jnp.int32).reshape(1, 8)
    l1, _ = model_forward(qp, CFG, toks)
    l2, _ = model_forward(m2.params, m2.cfg, toks)
    # qweight/qzeros round-trip exactly; scales pass through fp16
    np.testing.assert_allclose(
        np.asarray(l1), np.asarray(l2), atol=0.05, rtol=0.05
    )


def _write_hf_llama_checkpoint(dirpath, rng, moe=False):
    """Synthesize a minimal HF-format llama/mixtral checkpoint."""
    D, F, L, V = 64, 128, 2, 128
    hq, hkv, hd = 4, 2, 16
    cfg = {
        "model_type": "mixtral" if moe else "llama",
        "vocab_size": V, "hidden_size": D, "intermediate_size": F,
        "num_hidden_layers": L, "num_attention_heads": hq,
        "num_key_value_heads": hkv, "max_position_embeddings": 32,
        "rms_norm_eps": 1e-5, "rope_theta": 10000.0,
    }
    if moe:
        cfg.update(num_local_experts=2, num_experts_per_tok=1)
    tensors = {
        "model.embed_tokens.weight": rng.standard_normal((V, D)).astype(np.float32) * 0.02,
        "model.norm.weight": np.ones(D, np.float32),
        "lm_head.weight": rng.standard_normal((V, D)).astype(np.float32) * 0.02,
    }
    for i in range(L):
        p = f"model.layers.{i}"
        tensors[f"{p}.input_layernorm.weight"] = np.ones(D, np.float32)
        tensors[f"{p}.post_attention_layernorm.weight"] = np.ones(D, np.float32)
        tensors[f"{p}.self_attn.q_proj.weight"] = rng.standard_normal((hq * hd, D)).astype(np.float32) * 0.05
        tensors[f"{p}.self_attn.k_proj.weight"] = rng.standard_normal((hkv * hd, D)).astype(np.float32) * 0.05
        tensors[f"{p}.self_attn.v_proj.weight"] = rng.standard_normal((hkv * hd, D)).astype(np.float32) * 0.05
        tensors[f"{p}.self_attn.o_proj.weight"] = rng.standard_normal((D, hq * hd)).astype(np.float32) * 0.05
        if moe:
            tensors[f"{p}.block_sparse_moe.gate.weight"] = rng.standard_normal((2, D)).astype(np.float32) * 0.05
            for e in range(2):
                q = f"{p}.block_sparse_moe.experts.{e}"
                tensors[f"{q}.w1.weight"] = rng.standard_normal((F, D)).astype(np.float32) * 0.05
                tensors[f"{q}.w3.weight"] = rng.standard_normal((F, D)).astype(np.float32) * 0.05
                tensors[f"{q}.w2.weight"] = rng.standard_normal((D, F)).astype(np.float32) * 0.05
        else:
            tensors[f"{p}.mlp.gate_proj.weight"] = rng.standard_normal((F, D)).astype(np.float32) * 0.05
            tensors[f"{p}.mlp.up_proj.weight"] = rng.standard_normal((F, D)).astype(np.float32) * 0.05
            tensors[f"{p}.mlp.down_proj.weight"] = rng.standard_normal((D, F)).astype(np.float32) * 0.05
    os.makedirs(dirpath, exist_ok=True)
    save_file(tensors, os.path.join(dirpath, "model.safetensors"))
    with open(os.path.join(dirpath, "config.json"), "w") as f:
        json.dump(cfg, f)
    return tensors, cfg


def test_hf_import_matches_manual(tmp_path, rng):
    tensors, hf_cfg = _write_hf_llama_checkpoint(str(tmp_path), rng)
    params, cfg = load_hf_float(str(tmp_path))
    assert cfg.model_type == "llama" and len(params.blocks) == 2
    # spot-check the fused qkv layout: first D columns == q_proj.T
    q_t = tensors["model.layers.0.self_attn.q_proj.weight"].T
    got = np.asarray(params.blocks[0].attn.qkv_proj.weight[:, : q_t.shape[1]], np.float32)
    np.testing.assert_allclose(got, q_t, atol=1e-2, rtol=1e-2)
    # forward runs
    logits, _ = model_forward(params, cfg, jnp.ones((1, 4), jnp.int32))
    assert bool(jnp.isfinite(logits).all())


def test_hf_import_mixtral(tmp_path, rng):
    _write_hf_llama_checkpoint(str(tmp_path), rng, moe=True)
    params, cfg = load_hf_float(str(tmp_path))
    assert cfg.is_moe
    logits, _ = model_forward(params, cfg, jnp.ones((1, 4), jnp.int32))
    assert bool(jnp.isfinite(logits).all())


def test_autoawq_gemm_import(tmp_path, rng):
    """Write an AutoAWQ-GEMM-format quantized checkpoint and import it."""
    from quick_tpu.quantize.numerics import quantize_tensor
    from quick_tpu.quantize.packing import pack_awq_gemm

    D, F, L, V = 64, 128, 1, 128
    hq, hkv, hd = 4, 4, 16
    G = 32
    cfg = {
        "model_type": "llama", "vocab_size": V, "hidden_size": D,
        "intermediate_size": F, "num_hidden_layers": L,
        "num_attention_heads": hq, "num_key_value_heads": hkv,
        "max_position_embeddings": 32, "rms_norm_eps": 1e-5,
    }
    tensors = {
        "model.embed_tokens.weight": rng.standard_normal((V, D)).astype(np.float32) * 0.02,
        "model.norm.weight": np.ones(D, np.float32),
        "lm_head.weight": rng.standard_normal((V, D)).astype(np.float32) * 0.02,
    }
    float_ws = {}

    def add_qlin(base, K, N):
        w = rng.standard_normal((K, N)).astype(np.float32) * 0.05
        qt = quantize_tensor(jnp.asarray(w), group_size=G)
        float_ws[base] = np.asarray(
            (np.asarray(qt.q, np.float32)
             - np.repeat(np.asarray(qt.zeros), G, 0))
            * np.repeat(np.asarray(qt.scales), G, 0)
        )
        tensors[base + ".qweight"] = pack_awq_gemm(np.asarray(qt.q))
        tensors[base + ".qzeros"] = pack_awq_gemm(
            np.asarray(qt.zeros, np.uint8)
        )
        tensors[base + ".scales"] = np.asarray(qt.scales, np.float16)

    p = "model.layers.0"
    tensors[f"{p}.input_layernorm.weight"] = np.ones(D, np.float32)
    tensors[f"{p}.post_attention_layernorm.weight"] = np.ones(D, np.float32)
    for name, K, N in [
        ("self_attn.q_proj", D, hq * hd), ("self_attn.k_proj", D, hkv * hd),
        ("self_attn.v_proj", D, hkv * hd), ("self_attn.o_proj", hq * hd, D),
        ("mlp.gate_proj", D, F), ("mlp.up_proj", D, F), ("mlp.down_proj", F, D),
    ]:
        add_qlin(f"{p}.{name}", K, N)

    os.makedirs(tmp_path, exist_ok=True)
    save_file(tensors, os.path.join(tmp_path, "model.safetensors"))
    with open(os.path.join(tmp_path, "config.json"), "w") as f:
        json.dump(cfg, f)
    QuantConfig(q_group_size=G, version="gemm").save_pretrained(str(tmp_path))

    params, mcfg, qcfg = load_autoawq(str(tmp_path))
    # imported fused qkv must dequantize to the same float weights
    from quick_tpu.ops.quantized_matmul import unpack_qtpu_jax

    ql = params.blocks[0].attn.qkv_proj
    nib = np.asarray(unpack_qtpu_jax(ql.qweight, G), np.float32)
    w_deq = nib * np.repeat(np.asarray(ql.scales), G, 0) - np.repeat(
        np.asarray(ql.zeros_x_scales), G, 0
    )
    w_expect = np.concatenate(
        [float_ws[f"{p}.self_attn.{n}_proj"] for n in ("q", "k", "v")], axis=1
    )
    np.testing.assert_allclose(w_deq, w_expect, atol=1e-2, rtol=1e-2)

    logits, _ = model_forward(params, mcfg, jnp.ones((1, 4), jnp.int32))
    assert bool(jnp.isfinite(logits).all())


def test_auto_api_end_to_end(tmp_path):
    """from_random -> quantize -> save -> from_quantized -> generate."""
    model = AutoQuickModel.from_random(CFG, seed=0)
    calib = get_calib_tokens(n_samples=2, block_size=16, vocab_size=128)
    model.quantize(jnp.asarray(calib), QuantConfig(q_group_size=32), verbose=False)
    model.save_quantized(str(tmp_path / "q"))
    model2 = AutoQuickModel.from_quantized(str(tmp_path / "q"))
    out = model2.generate(jnp.ones((1, 4), jnp.int32), max_new_tokens=4)
    assert out.shape == (1, 8)


def test_calib_tokens_variants():
    t = get_calib_tokens(n_samples=4, block_size=8, vocab_size=100)
    assert t.shape == (4, 8) and t.max() < 100
    t2 = get_calib_tokens(np.arange(64), n_samples=4, block_size=16)
    assert t2.shape == (4, 16)

    class FakeTok:
        def encode(self, s):
            return [ord(c) % 50 for c in s]

    t3 = get_calib_tokens(["hello world"] * 20, tokenizer=FakeTok(),
                          n_samples=2, block_size=32)
    assert t3.shape == (2, 32)


def test_unknown_model_type_rejected():
    from quick_tpu.models.auto import check_and_get_model_type

    with pytest.raises(TypeError):
        check_and_get_model_type("not_a_model")


def test_exllama_import(tmp_path, rng):
    """An exllama/GPTQ-layout checkpoint must import identically to the same
    weights written in GEMM layout (reference exllama repack path,
    linear/exllama.py:15-136)."""
    from quick_tpu.quantize.numerics import quantize_tensor
    from quick_tpu.quantize.packing import pack_awq_gemm, pack_exllama

    D, F, L, V = 64, 128, 1, 128
    hq, hkv, hd = 4, 4, 16
    G = 32
    cfg = {
        "model_type": "llama", "vocab_size": V, "hidden_size": D,
        "intermediate_size": F, "num_hidden_layers": L,
        "num_attention_heads": hq, "num_key_value_heads": hkv,
        "max_position_embeddings": 32, "rms_norm_eps": 1e-5,
    }
    common = {
        "model.embed_tokens.weight": rng.standard_normal((V, D)).astype(np.float32) * 0.02,
        "model.norm.weight": np.ones(D, np.float32),
        "lm_head.weight": rng.standard_normal((V, D)).astype(np.float32) * 0.02,
        "model.layers.0.input_layernorm.weight": np.ones(D, np.float32),
        "model.layers.0.post_attention_layernorm.weight": np.ones(D, np.float32),
    }
    t_gemm, t_exl = dict(common), dict(common)

    def add_qlin(base, K, N):
        w = rng.standard_normal((K, N)).astype(np.float32) * 0.05
        qt = quantize_tensor(jnp.asarray(w), group_size=G)
        q = np.asarray(qt.q, np.uint8)
        z = np.asarray(qt.zeros, np.uint8)
        s = np.asarray(qt.scales, np.float16)
        t_gemm[base + ".qweight"] = pack_awq_gemm(q)
        t_gemm[base + ".qzeros"] = pack_awq_gemm(z)
        t_gemm[base + ".scales"] = s
        qe, ze = pack_exllama(q, z)
        t_exl[base + ".qweight"] = qe
        t_exl[base + ".qzeros"] = ze
        t_exl[base + ".scales"] = s

    p = "model.layers.0"
    for name, K, N in [
        ("self_attn.q_proj", D, hq * hd), ("self_attn.k_proj", D, hkv * hd),
        ("self_attn.v_proj", D, hkv * hd), ("self_attn.o_proj", hq * hd, D),
        ("mlp.gate_proj", D, F), ("mlp.up_proj", D, F), ("mlp.down_proj", F, D),
    ]:
        add_qlin(f"{p}.{name}", K, N)

    dirs = {}
    for version, tensors in (("gemm", t_gemm), ("exllama", t_exl)):
        d = tmp_path / version
        os.makedirs(d, exist_ok=True)
        save_file(tensors, os.path.join(d, "model.safetensors"))
        with open(os.path.join(d, "config.json"), "w") as f:
            json.dump(cfg, f)
        QuantConfig(q_group_size=G, version=version).save_pretrained(str(d))
        dirs[version] = str(d)

    pg, cg, _ = load_autoawq(dirs["gemm"])
    pe, ce, _ = load_autoawq(dirs["exllama"])
    for attr in ("qweight", "scales", "zeros_x_scales"):
        np.testing.assert_array_equal(
            np.asarray(getattr(pg.blocks[0].attn.qkv_proj, attr)),
            np.asarray(getattr(pe.blocks[0].attn.qkv_proj, attr)),
        )
    tg, _ = model_forward(pg, cg, jnp.ones((1, 4), jnp.int32))
    te, _ = model_forward(pe, ce, jnp.ones((1, 4), jnp.int32))
    np.testing.assert_allclose(np.asarray(tg), np.asarray(te), atol=1e-5)

    # auto API routes exllama through the same converter
    from quick_tpu.models.auto import AutoQuickModel

    m = AutoQuickModel.from_quantized(dirs["exllama"])
    assert m.qcfg.version == "qtpu"


def test_native_round_trip_qk_norm(tmp_path):
    """q_norm/k_norm (qwen3) survive the native save/load round trip."""
    import dataclasses

    cfg = dataclasses.replace(CFG, use_qk_norm=True)
    p = init_float_params(cfg, jax.random.PRNGKey(1))
    # perturb so a dropped weight would change the forward
    b0 = p.blocks[0]
    p = dataclasses.replace(
        p,
        blocks=[dataclasses.replace(
            b0, attn=dataclasses.replace(
                b0.attn,
                q_norm=b0.attn.q_norm * 1.5,
                k_norm=b0.attn.k_norm * 0.5,
            ),
        )] + list(p.blocks[1:]),
    )
    qp = quantize_params(p, cfg, group_size=32)
    save_quantized(qp, cfg, QuantConfig(q_group_size=32), str(tmp_path))
    params2, cfg2, _ = load_quantized(str(tmp_path))
    assert cfg2.use_qk_norm
    np.testing.assert_allclose(
        np.asarray(params2.blocks[0].attn.q_norm),
        np.asarray(qp.blocks[0].attn.q_norm),
    )
    toks = jnp.arange(8, dtype=jnp.int32).reshape(1, 8)
    l1, _ = model_forward(qp, cfg, toks)
    l2, _ = model_forward(params2, cfg2, toks)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), atol=1e-5)
