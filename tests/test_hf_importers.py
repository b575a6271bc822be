"""HF checkpoint importers for the non-llama families.

Each test writes a tiny synthetic checkpoint in the family's native tensor
layout, imports it via AutoQuickModel.from_pretrained, and checks the
forward runs and the layout conversions (qkv de-interleave, GPT-J rotary
permutation, OPT position offset) are mathematically right."""
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from safetensors.numpy import save_file

from quick_tpu.models.auto import AutoQuickModel
from quick_tpu.models.model import model_forward

D, H, HD, L, V, F = 64, 4, 16, 2, 128, 128
RNG = np.random.default_rng(0)


def _w(*shape):
    return (RNG.standard_normal(shape) * 0.05).astype(np.float32)


def _write(tmp_path, cfg, tensors):
    os.makedirs(tmp_path, exist_ok=True)
    save_file(tensors, os.path.join(tmp_path, "model.safetensors"))
    with open(os.path.join(tmp_path, "config.json"), "w") as f:
        json.dump(cfg, f)
    return str(tmp_path)


def _forward_ok(model, check_cache=True):
    toks = jnp.asarray(RNG.integers(0, V, (1, 10)), jnp.int32)
    logits, _ = model_forward(model.params, model.cfg, toks)
    assert logits.shape == (1, 10, V)
    assert bool(jnp.isfinite(logits).all())
    if check_cache:
        from quick_tpu.runtime import make_cache, prefill

        cache = make_cache(model.cfg, 1, 16, dtype=jnp.float32)
        _, cache = prefill(model.params, model.cfg, toks[:, :6], cache)
        outs = []
        for t in range(6, 10):
            lg, cache = model_forward(
                model.params, model.cfg, toks[:, t : t + 1], cache
            )
            outs.append(lg[:, 0])
        inc = jnp.stack(outs, axis=1)
        np.testing.assert_allclose(
            np.asarray(inc), np.asarray(logits[:, 6:]), atol=0.05, rtol=0.05
        )
    return logits


def test_import_mpt(tmp_path):
    cfg = {
        "model_type": "mpt", "d_model": D, "n_heads": H, "n_layers": L,
        "expansion_ratio": 2, "max_seq_len": 64, "vocab_size": V,
        "attn_config": {"alibi": True},
    }
    t = {"transformer.wte.weight": _w(V, D),
         "transformer.norm_f.weight": np.ones(D, np.float32)}
    for i in range(L):
        p = f"transformer.blocks.{i}"
        t[f"{p}.norm_1.weight"] = np.ones(D, np.float32)
        t[f"{p}.norm_2.weight"] = np.ones(D, np.float32)
        t[f"{p}.attn.Wqkv.weight"] = _w(3 * D, D)
        t[f"{p}.attn.out_proj.weight"] = _w(D, D)
        t[f"{p}.ffn.up_proj.weight"] = _w(2 * D, D)
        t[f"{p}.ffn.down_proj.weight"] = _w(D, 2 * D)
    m = AutoQuickModel.from_pretrained(_write(tmp_path, cfg, t), jnp.float32)
    assert m.cfg.use_alibi and not m.cfg.use_rope
    assert m.cfg.intermediate_size == 2 * D
    _forward_ok(m)


def test_import_falcon_7b_style(tmp_path):
    cfg = {
        "model_type": "falcon", "hidden_size": D, "num_attention_heads": H,
        "num_hidden_layers": L, "vocab_size": V, "multi_query": True,
        "parallel_attn": True, "alibi": False, "bias": False,
        "max_position_embeddings": 64,
    }
    t = {"transformer.word_embeddings.weight": _w(V, D),
         "transformer.ln_f.weight": np.ones(D, np.float32),
         "transformer.ln_f.bias": np.zeros(D, np.float32)}
    for i in range(L):
        p = f"transformer.h.{i}"
        t[f"{p}.input_layernorm.weight"] = np.ones(D, np.float32)
        t[f"{p}.input_layernorm.bias"] = np.zeros(D, np.float32)
        t[f"{p}.self_attention.query_key_value.weight"] = _w(D + 2 * HD, D)
        t[f"{p}.self_attention.dense.weight"] = _w(D, D)
        t[f"{p}.mlp.dense_h_to_4h.weight"] = _w(4 * D, D)
        t[f"{p}.mlp.dense_4h_to_h.weight"] = _w(D, 4 * D)
    m = AutoQuickModel.from_pretrained(_write(tmp_path, cfg, t), jnp.float32)
    assert m.cfg.num_key_value_heads == 1  # MQA
    assert m.cfg.parallel_residual and m.cfg.use_rope
    _forward_ok(m)


def test_import_gpt_neox(tmp_path):
    cfg = {
        "model_type": "gpt_neox", "hidden_size": D,
        "num_attention_heads": H, "num_hidden_layers": L, "vocab_size": V,
        "intermediate_size": F, "rotary_pct": 0.25,
        "use_parallel_residual": True, "max_position_embeddings": 64,
    }
    t = {"gpt_neox.embed_in.weight": _w(V, D),
         "gpt_neox.final_layer_norm.weight": np.ones(D, np.float32),
         "gpt_neox.final_layer_norm.bias": np.zeros(D, np.float32),
         "embed_out.weight": _w(V, D)}
    for i in range(L):
        p = f"gpt_neox.layers.{i}"
        for n in ("input_layernorm", "post_attention_layernorm"):
            t[f"{p}.{n}.weight"] = np.ones(D, np.float32)
            t[f"{p}.{n}.bias"] = np.zeros(D, np.float32)
        t[f"{p}.attention.query_key_value.weight"] = _w(3 * D, D)
        t[f"{p}.attention.query_key_value.bias"] = _w(3 * D)
        t[f"{p}.attention.dense.weight"] = _w(D, D)
        t[f"{p}.mlp.dense_h_to_4h.weight"] = _w(F, D)
        t[f"{p}.mlp.dense_h_to_4h.bias"] = _w(F)
        t[f"{p}.mlp.dense_4h_to_h.weight"] = _w(D, F)
        t[f"{p}.mlp.dense_4h_to_h.bias"] = _w(D)
    m = AutoQuickModel.from_pretrained(_write(tmp_path, cfg, t), jnp.float32)
    assert m.cfg.rotary_dim == 4  # 16 * 0.25
    assert m.params.rope_cos.shape[-1] == 2
    _forward_ok(m)


def test_deinterleave_identity():
    """Fused [H, 3, hd] layout recovers the exact q/k/v blocks."""
    from quick_tpu.utils.checkpoint import _deinterleave_qkv

    q = _w(D, H * HD)
    k = _w(D, H * HD)
    v = _w(D, H * HD)
    fused = np.stack(
        [q.reshape(D, H, HD), k.reshape(D, H, HD), v.reshape(D, H, HD)],
        axis=2,
    ).reshape(D, 3 * H * HD)  # [D, H, 3, hd] column order
    out, _ = _deinterleave_qkv(jnp.asarray(fused), None, H, H, HD)
    np.testing.assert_allclose(
        np.asarray(out), np.concatenate([q, k, v], axis=1), atol=1e-6
    )


def test_gptj_rope_permutation_identity():
    """perm(interleaved_rot(x)) == rotate_half_rot(perm(x)) — the identity
    that lets one rotate-half runtime serve GPT-J checkpoints."""
    hd, r, pos, base = 16, 8, 5, 10000.0
    x = RNG.standard_normal(hd)
    inv = base ** (-np.arange(0, r, 2) / r)         # [r/2]
    ang = pos * inv
    # GPT-J interleaved: pairs (x[2i], x[2i+1])
    rot = x.copy()
    for i in range(r // 2):
        c, s = np.cos(ang[i]), np.sin(ang[i])
        a, b = x[2 * i], x[2 * i + 1]
        rot[2 * i], rot[2 * i + 1] = a * c - b * s, b * c + a * s
    perm = np.concatenate(
        [np.arange(0, r, 2), np.arange(1, r, 2), np.arange(r, hd)]
    )
    lhs = rot[perm]
    # rotate-half on permuted input
    y = x[perm]
    out = y.copy()
    for i in range(r // 2):
        c, s = np.cos(ang[i]), np.sin(ang[i])
        a, b = y[i], y[i + r // 2]
        out[i], out[i + r // 2] = a * c - b * s, b * c + a * s
    np.testing.assert_allclose(lhs, out, atol=1e-12)


def test_import_gptj(tmp_path):
    cfg = {
        "model_type": "gptj", "n_embd": D, "n_head": H, "n_layer": L,
        "vocab_size": V, "rotary_dim": 8, "n_positions": 64,
    }
    t = {"transformer.wte.weight": _w(V, D),
         "transformer.ln_f.weight": np.ones(D, np.float32),
         "transformer.ln_f.bias": np.zeros(D, np.float32),
         "lm_head.weight": _w(V, D), "lm_head.bias": _w(V)}
    for i in range(L):
        p = f"transformer.h.{i}"
        t[f"{p}.ln_1.weight"] = np.ones(D, np.float32)
        t[f"{p}.ln_1.bias"] = np.zeros(D, np.float32)
        for n in ("q_proj", "k_proj", "v_proj", "out_proj"):
            t[f"{p}.attn.{n}.weight"] = _w(D, D)
        t[f"{p}.mlp.fc_in.weight"] = _w(4 * D, D)
        t[f"{p}.mlp.fc_in.bias"] = _w(4 * D)
        t[f"{p}.mlp.fc_out.weight"] = _w(D, 4 * D)
        t[f"{p}.mlp.fc_out.bias"] = _w(D)
    m = AutoQuickModel.from_pretrained(_write(tmp_path, cfg, t), jnp.float32)
    assert m.cfg.parallel_residual and m.cfg.rotary_dim == 8
    _forward_ok(m)


def test_import_opt(tmp_path):
    cfg = {
        "model_type": "opt", "hidden_size": D, "num_attention_heads": H,
        "num_hidden_layers": L, "vocab_size": V, "ffn_dim": F,
        "max_position_embeddings": 32, "activation_function": "relu",
    }
    t = {"model.decoder.embed_tokens.weight": _w(V, D),
         "model.decoder.embed_positions.weight": _w(34, D),  # +2 offset rows
         "model.decoder.final_layer_norm.weight": np.ones(D, np.float32),
         "model.decoder.final_layer_norm.bias": np.zeros(D, np.float32)}
    for i in range(L):
        p = f"model.decoder.layers.{i}"
        for n in ("self_attn_layer_norm", "final_layer_norm"):
            t[f"{p}.{n}.weight"] = np.ones(D, np.float32)
            t[f"{p}.{n}.bias"] = np.zeros(D, np.float32)
        for n in ("q_proj", "k_proj", "v_proj", "out_proj"):
            t[f"{p}.self_attn.{n}.weight"] = _w(D, D)
            t[f"{p}.self_attn.{n}.bias"] = _w(D)
        t[f"{p}.fc1.weight"] = _w(F, D)
        t[f"{p}.fc1.bias"] = _w(F)
        t[f"{p}.fc2.weight"] = _w(D, F)
        t[f"{p}.fc2.bias"] = _w(D)
    m = AutoQuickModel.from_pretrained(_write(tmp_path, cfg, t), jnp.float32)
    assert m.cfg.act_fn == "relu" and m.cfg.learned_pos
    assert m.params.pos_embed.shape == (32, D)  # offset rows stripped
    _forward_ok(m)


def test_import_bloom(tmp_path):
    cfg = {
        "model_type": "bloom", "hidden_size": D, "n_head": H,
        "n_layer": L, "vocab_size": V,
    }
    t = {"transformer.word_embeddings.weight": _w(V, D),
         "transformer.word_embeddings_layernorm.weight": np.ones(D, np.float32),
         "transformer.word_embeddings_layernorm.bias": np.zeros(D, np.float32),
         "transformer.ln_f.weight": np.ones(D, np.float32),
         "transformer.ln_f.bias": np.zeros(D, np.float32)}
    for i in range(L):
        p = f"transformer.h.{i}"
        for n in ("input_layernorm", "post_attention_layernorm"):
            t[f"{p}.{n}.weight"] = np.ones(D, np.float32)
            t[f"{p}.{n}.bias"] = np.zeros(D, np.float32)
        t[f"{p}.self_attention.query_key_value.weight"] = _w(3 * D, D)
        t[f"{p}.self_attention.query_key_value.bias"] = _w(3 * D)
        t[f"{p}.self_attention.dense.weight"] = _w(D, D)
        t[f"{p}.self_attention.dense.bias"] = _w(D)
        t[f"{p}.mlp.dense_h_to_4h.weight"] = _w(4 * D, D)
        t[f"{p}.mlp.dense_h_to_4h.bias"] = _w(4 * D)
        t[f"{p}.mlp.dense_4h_to_h.weight"] = _w(D, 4 * D)
        t[f"{p}.mlp.dense_4h_to_h.bias"] = _w(D)
    m = AutoQuickModel.from_pretrained(_write(tmp_path, cfg, t), jnp.float32)
    assert m.cfg.use_alibi and m.cfg.embed_norm
    assert m.params.embed_norm is not None
    _forward_ok(m)


def test_import_gpt_bigcode(tmp_path):
    cfg = {
        "model_type": "gpt_bigcode", "n_embd": D, "n_head": H,
        "n_layer": L, "vocab_size": V, "n_positions": 32,
        "multi_query": True,
    }
    t = {"transformer.wte.weight": _w(V, D),
         "transformer.wpe.weight": _w(32, D),
         "transformer.ln_f.weight": np.ones(D, np.float32),
         "transformer.ln_f.bias": np.zeros(D, np.float32)}
    for i in range(L):
        p = f"transformer.h.{i}"
        for n in ("ln_1", "ln_2"):
            t[f"{p}.{n}.weight"] = np.ones(D, np.float32)
            t[f"{p}.{n}.bias"] = np.zeros(D, np.float32)
        t[f"{p}.attn.c_attn.weight"] = _w(D + 2 * HD, D)
        t[f"{p}.attn.c_attn.bias"] = _w(D + 2 * HD)
        t[f"{p}.attn.c_proj.weight"] = _w(D, D)
        t[f"{p}.attn.c_proj.bias"] = _w(D)
        t[f"{p}.mlp.c_fc.weight"] = _w(4 * D, D)
        t[f"{p}.mlp.c_fc.bias"] = _w(4 * D)
        t[f"{p}.mlp.c_proj.weight"] = _w(D, 4 * D)
        t[f"{p}.mlp.c_proj.bias"] = _w(D)
    m = AutoQuickModel.from_pretrained(_write(tmp_path, cfg, t), jnp.float32)
    assert m.cfg.num_key_value_heads == 1 and m.cfg.learned_pos
    _forward_ok(m)


def test_import_baichuan_13b_alibi(tmp_path):
    D13 = 5120  # width triggers the ALiBi variant detection
    cfg = {
        "model_type": "baichuan", "hidden_size": D13,
        "num_attention_heads": 4, "num_hidden_layers": 1, "vocab_size": V,
        "intermediate_size": 128, "max_position_embeddings": 64,
    }
    t = {"model.embed_tokens.weight": _w(V, D13),
         "model.norm.weight": np.ones(D13, np.float32),
         "lm_head.weight": _w(V, D13)}
    p = "model.layers.0"
    t[f"{p}.input_layernorm.weight"] = np.ones(D13, np.float32)
    t[f"{p}.post_attention_layernorm.weight"] = np.ones(D13, np.float32)
    t[f"{p}.self_attn.W_pack.weight"] = _w(3 * D13, D13)
    t[f"{p}.self_attn.o_proj.weight"] = _w(D13, D13)
    t[f"{p}.mlp.gate_proj.weight"] = _w(128, D13)
    t[f"{p}.mlp.up_proj.weight"] = _w(128, D13)
    t[f"{p}.mlp.down_proj.weight"] = _w(D13, 128)
    m = AutoQuickModel.from_pretrained(_write(tmp_path, cfg, t), jnp.float32)
    assert m.cfg.use_alibi and not m.cfg.use_rope
    _forward_ok(m, check_cache=False)  # 1 layer, width 5120 — keep it quick


def test_import_qwen_v1(tmp_path):
    cfg = {
        "model_type": "qwen", "hidden_size": D, "num_attention_heads": H,
        "num_hidden_layers": L, "vocab_size": V,
        "intermediate_size": 2 * F,  # HF qwen halves this in code
        "max_position_embeddings": 64,
    }
    t = {"transformer.wte.weight": _w(V, D),
         "transformer.ln_f.weight": np.ones(D, np.float32),
         "lm_head.weight": _w(V, D)}
    for i in range(L):
        p = f"transformer.h.{i}"
        t[f"{p}.ln_1.weight"] = np.ones(D, np.float32)
        t[f"{p}.ln_2.weight"] = np.ones(D, np.float32)
        t[f"{p}.attn.c_attn.weight"] = _w(3 * D, D)
        t[f"{p}.attn.c_attn.bias"] = _w(3 * D)
        t[f"{p}.attn.c_proj.weight"] = _w(D, D)
        t[f"{p}.mlp.w1.weight"] = _w(F, D)
        t[f"{p}.mlp.w2.weight"] = _w(F, D)
        t[f"{p}.mlp.c_proj.weight"] = _w(D, F)
    m = AutoQuickModel.from_pretrained(_write(tmp_path, cfg, t), jnp.float32)
    assert m.cfg.intermediate_size == F
    assert m.cfg.layernorm == "rmsnorm" and m.cfg.gated_mlp
    _forward_ok(m)


def test_partial_rotary_passthrough(rng):
    """With rotary_dim < head_dim, the non-rotary dims must pass through."""
    from quick_tpu.ops.rope import apply_rope, rope_table

    cos, sin = rope_table(32, 8)  # rotary_dim=8 of head_dim=16
    x = jnp.asarray(rng.standard_normal((1, 4, 2, 16)), jnp.float32)
    pos = jnp.arange(4)[None]
    out = apply_rope(x, pos, cos, sin)
    np.testing.assert_allclose(
        np.asarray(out[..., 8:]), np.asarray(x[..., 8:]), atol=1e-6
    )
    assert float(jnp.abs(out[:, 1:, :, :8] - x[:, 1:, :, :8]).max()) > 1e-4


def test_import_falcon_rw_interleaved_bias(tmp_path):
    """falcon-rw (old arch, multi_query=False, bias=True): per-head
    interleaved qkv weight AND bias must both be de-interleaved. Built by
    interleaving known q/k/v blocks and checking exact recovery."""
    cfg = {
        "model_type": "falcon", "hidden_size": D, "num_attention_heads": H,
        "num_hidden_layers": 1, "vocab_size": V, "multi_query": False,
        "parallel_attn": False, "alibi": True, "bias": True,
        "max_position_embeddings": 64,
    }
    q = _w(D, H * HD); k = _w(D, H * HD); v = _w(D, H * HD)
    bq_, bk_, bv_ = _w(H * HD), _w(H * HD), _w(H * HD)
    fused_w = np.stack(
        [q.reshape(D, H, HD), k.reshape(D, H, HD), v.reshape(D, H, HD)],
        axis=2,
    ).reshape(D, 3 * H * HD)
    fused_b = np.stack(
        [bq_.reshape(H, HD), bk_.reshape(H, HD), bv_.reshape(H, HD)], axis=1
    ).reshape(3 * H * HD)
    t = {"transformer.word_embeddings.weight": _w(V, D),
         "transformer.ln_f.weight": np.ones(D, np.float32),
         "transformer.ln_f.bias": np.zeros(D, np.float32)}
    p = "transformer.h.0"
    t[f"{p}.input_layernorm.weight"] = np.ones(D, np.float32)
    t[f"{p}.input_layernorm.bias"] = np.zeros(D, np.float32)
    t[f"{p}.post_attention_layernorm.weight"] = np.ones(D, np.float32)
    t[f"{p}.post_attention_layernorm.bias"] = np.zeros(D, np.float32)
    t[f"{p}.self_attention.query_key_value.weight"] = fused_w.T.copy()  # HF [out,in]
    t[f"{p}.self_attention.query_key_value.bias"] = fused_b
    t[f"{p}.self_attention.dense.weight"] = _w(D, D)
    t[f"{p}.self_attention.dense.bias"] = _w(D)
    t[f"{p}.mlp.dense_h_to_4h.weight"] = _w(4 * D, D)
    t[f"{p}.mlp.dense_h_to_4h.bias"] = _w(4 * D)
    t[f"{p}.mlp.dense_4h_to_h.weight"] = _w(D, 4 * D)
    t[f"{p}.mlp.dense_4h_to_h.bias"] = _w(D)
    m = AutoQuickModel.from_pretrained(_write(tmp_path, cfg, t), jnp.float32)
    assert m.cfg.num_key_value_heads == H  # multi_query=False -> MHA
    lin = m.params.blocks[0].attn.qkv_proj
    np.testing.assert_allclose(
        np.asarray(lin.weight), np.concatenate([q, k, v], axis=1), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(lin.bias), np.concatenate([bq_, bk_, bv_]), atol=1e-6
    )
    _forward_ok(m, check_cache=False)


def test_refinedweb_config_translation():
    """Pre-rename falcon-40b configs (RefinedWeb, n_head_kv) must map to
    the grouped-kv falcon architecture."""
    from quick_tpu import ModelConfig

    cfg = ModelConfig.from_hf_config({
        "model_type": "RefinedWeb", "hidden_size": 256,
        "n_head": 16, "n_layer": 2, "vocab_size": 1000, "n_head_kv": 4,
    })
    assert cfg.model_type == "falcon"
    assert cfg.num_key_value_heads == 4


def test_import_phi(tmp_path):
    """Phi-2 layout: ONE shared input layernorm feeding parallel attn+mlp,
    gelu fc1/fc2, partial rotary (factor 0.5), biases on every linear."""
    cfg = {
        "model_type": "phi", "hidden_size": D, "num_attention_heads": H,
        "num_hidden_layers": L, "vocab_size": V, "intermediate_size": F,
        "max_position_embeddings": 64, "partial_rotary_factor": 0.5,
        "layer_norm_eps": 1e-5,
    }
    t = {"model.embed_tokens.weight": _w(V, D),
         "model.final_layernorm.weight": np.ones(D, np.float32),
         "model.final_layernorm.bias": np.zeros(D, np.float32),
         "lm_head.weight": _w(V, D), "lm_head.bias": _w(V)}
    for i in range(L):
        p = f"model.layers.{i}"
        t[f"{p}.input_layernorm.weight"] = np.ones(D, np.float32)
        t[f"{p}.input_layernorm.bias"] = np.zeros(D, np.float32)
        for n in "qkv":
            t[f"{p}.self_attn.{n}_proj.weight"] = _w(D, D)
            t[f"{p}.self_attn.{n}_proj.bias"] = _w(D)
        t[f"{p}.self_attn.dense.weight"] = _w(D, D)
        t[f"{p}.self_attn.dense.bias"] = _w(D)
        t[f"{p}.mlp.fc1.weight"] = _w(F, D)
        t[f"{p}.mlp.fc1.bias"] = _w(F)
        t[f"{p}.mlp.fc2.weight"] = _w(D, F)
        t[f"{p}.mlp.fc2.bias"] = _w(D)
    m = AutoQuickModel.from_pretrained(_write(tmp_path, cfg, t), jnp.float32)
    assert m.cfg.parallel_residual and m.cfg.layernorm == "layernorm"
    assert not m.cfg.gated_mlp and m.cfg.act_fn == "gelu"
    assert m.cfg.rotary_dim == HD // 2
    assert m.params.lm_head.bias is not None
    # shared norm duplicated into both slots
    b = m.params.blocks[0]
    np.testing.assert_allclose(np.asarray(b.attn_norm), np.asarray(b.mlp_norm))
    _forward_ok(m)


def test_import_gemma(tmp_path):
    """Gemma: zero-centered RMSNorm weights folded (+1) at import, tied
    lm_head, sqrt(D)-scaled embeddings (runtime switch)."""
    cfg = {
        "model_type": "gemma", "hidden_size": D, "num_attention_heads": H,
        "num_key_value_heads": 1, "num_hidden_layers": L, "vocab_size": V,
        "intermediate_size": F, "max_position_embeddings": 64,
        "head_dim": HD, "rms_norm_eps": 1e-6,
    }
    t = {"model.embed_tokens.weight": _w(V, D),
         # gemma stores (w - 1): zeros here must import as ones
         "model.norm.weight": np.zeros(D, np.float32)}
    for i in range(L):
        p = f"model.layers.{i}"
        t[f"{p}.input_layernorm.weight"] = np.zeros(D, np.float32)
        t[f"{p}.post_attention_layernorm.weight"] = np.zeros(D, np.float32)
        t[f"{p}.self_attn.q_proj.weight"] = _w(H * HD, D)
        t[f"{p}.self_attn.k_proj.weight"] = _w(HD, D)
        t[f"{p}.self_attn.v_proj.weight"] = _w(HD, D)
        t[f"{p}.self_attn.o_proj.weight"] = _w(D, H * HD)
        t[f"{p}.mlp.gate_proj.weight"] = _w(F, D)
        t[f"{p}.mlp.up_proj.weight"] = _w(F, D)
        t[f"{p}.mlp.down_proj.weight"] = _w(D, F)
    m = AutoQuickModel.from_pretrained(_write(tmp_path, cfg, t), jnp.float32)
    assert m.cfg.embed_scale and m.cfg.tie_word_embeddings
    assert m.cfg.act_fn == "gelu" and m.cfg.num_key_value_heads == 1
    np.testing.assert_allclose(
        np.asarray(m.params.final_norm), np.ones(D, np.float32)
    )
    np.testing.assert_allclose(  # tied: lm_head is embed.T
        np.asarray(m.params.lm_head.weight),
        np.asarray(m.params.embed).T, atol=1e-6,
    )
    _forward_ok(m)
    # embed_scale actually changes the forward
    import dataclasses
    cfg_noscale = dataclasses.replace(m.cfg, embed_scale=False)
    toks = jnp.asarray([[1, 2, 3]], jnp.int32)
    a, _ = model_forward(m.params, m.cfg, toks)
    bld, _ = model_forward(m.params, cfg_noscale, toks)
    assert float(jnp.abs(a - bld).max()) > 1e-3


def test_import_qwen3(tmp_path):
    """Qwen3: llama layout + per-head q/k RMSNorm weights applied before
    RoPE (use_qk_norm)."""
    cfg = {
        "model_type": "qwen3", "hidden_size": D, "num_attention_heads": H,
        "num_key_value_heads": 2, "num_hidden_layers": L, "vocab_size": V,
        "intermediate_size": F, "max_position_embeddings": 64,
        "head_dim": HD, "rms_norm_eps": 1e-6,
    }
    t = {"model.embed_tokens.weight": _w(V, D),
         "model.norm.weight": np.ones(D, np.float32),
         "lm_head.weight": _w(V, D)}
    for i in range(L):
        p = f"model.layers.{i}"
        t[f"{p}.input_layernorm.weight"] = np.ones(D, np.float32)
        t[f"{p}.post_attention_layernorm.weight"] = np.ones(D, np.float32)
        t[f"{p}.self_attn.q_proj.weight"] = _w(H * HD, D)
        t[f"{p}.self_attn.k_proj.weight"] = _w(2 * HD, D)
        t[f"{p}.self_attn.v_proj.weight"] = _w(2 * HD, D)
        t[f"{p}.self_attn.o_proj.weight"] = _w(D, H * HD)
        t[f"{p}.self_attn.q_norm.weight"] = 1 + 0.1 * _w(HD)
        t[f"{p}.self_attn.k_norm.weight"] = 1 + 0.1 * _w(HD)
        t[f"{p}.mlp.gate_proj.weight"] = _w(F, D)
        t[f"{p}.mlp.up_proj.weight"] = _w(F, D)
        t[f"{p}.mlp.down_proj.weight"] = _w(D, F)
    m = AutoQuickModel.from_pretrained(_write(tmp_path, cfg, t), jnp.float32)
    assert m.cfg.use_qk_norm and m.cfg.num_key_value_heads == 2
    assert m.params.blocks[0].attn.q_norm is not None
    assert m.params.blocks[0].attn.q_norm.shape == (HD,)
    _forward_ok(m)
    # the qk-norm path is live: disabling it changes logits
    import dataclasses
    toks = jnp.asarray([[5, 6, 7]], jnp.int32)
    a, _ = model_forward(m.params, m.cfg, toks)
    bld, _ = model_forward(
        m.params, dataclasses.replace(m.cfg, use_qk_norm=False), toks
    )
    assert float(jnp.abs(a - bld).max()) > 1e-3


def test_import_gemma2(tmp_path):
    """Gemma2: four sandwich norms per block (all stored zero-centered),
    softcaps, query_pre_attn_scalar, alternating sliding window. The
    incremental-vs-full check in _forward_ok exercises window+softcap
    consistency between the prefill and cached decode paths (window 4 binds
    at 10 tokens)."""
    cfg = {
        "model_type": "gemma2", "hidden_size": D, "num_attention_heads": H,
        "num_key_value_heads": 2, "num_hidden_layers": L, "vocab_size": V,
        "intermediate_size": F, "max_position_embeddings": 64,
        "head_dim": HD, "rms_norm_eps": 1e-6, "query_pre_attn_scalar": 64,
        "attn_logit_softcapping": 50.0, "final_logit_softcapping": 30.0,
        "sliding_window": 4,
    }
    t = {"model.embed_tokens.weight": _w(V, D),
         "model.norm.weight": np.zeros(D, np.float32)}
    for i in range(L):
        p = f"model.layers.{i}"
        for n in ("input_layernorm", "post_attention_layernorm",
                  "pre_feedforward_layernorm", "post_feedforward_layernorm"):
            t[f"{p}.{n}.weight"] = np.zeros(D, np.float32)
        t[f"{p}.self_attn.q_proj.weight"] = _w(H * HD, D)
        t[f"{p}.self_attn.k_proj.weight"] = _w(2 * HD, D)
        t[f"{p}.self_attn.v_proj.weight"] = _w(2 * HD, D)
        t[f"{p}.self_attn.o_proj.weight"] = _w(D, H * HD)
        t[f"{p}.mlp.gate_proj.weight"] = _w(F, D)
        t[f"{p}.mlp.up_proj.weight"] = _w(F, D)
        t[f"{p}.mlp.down_proj.weight"] = _w(D, F)
    m = AutoQuickModel.from_pretrained(_write(tmp_path, cfg, t), jnp.float32)
    assert m.cfg.use_post_norms and m.cfg.embed_scale
    assert m.cfg.attn_logit_softcap == 50.0
    assert m.cfg.final_logit_softcap == 30.0
    assert m.cfg.query_pre_attn_scalar == 64
    assert m.cfg.sliding_window == 4 and m.cfg.sliding_window_pattern == 2
    # alternating: sliding on even layer idx, global on odd
    assert m.cfg.layer_is_sliding(0) and not m.cfg.layer_is_sliding(1)
    b0 = m.params.blocks[0]
    assert b0.attn_post_norm is not None and b0.mlp_post_norm is not None
    np.testing.assert_allclose(  # zero-centered folding on all 4 norms
        np.asarray(b0.attn_post_norm), np.ones(D, np.float32)
    )
    logits = _forward_ok(m)
    # final softcap bounds the logits
    assert float(jnp.abs(logits).max()) <= 30.0 + 1e-4
    # the sliding window is live: widening it changes prefill logits
    import dataclasses
    wide = dataclasses.replace(m.cfg, sliding_window=None)
    toks = jnp.asarray(RNG.integers(0, V, (1, 12)), jnp.int32)
    a, _ = model_forward(m.params, m.cfg, toks)
    bld, _ = model_forward(m.params, wide, toks)
    assert float(jnp.abs(a - bld).max()) > 1e-4


def test_import_gemma3(tmp_path):
    """Gemma3: multimodal checkpoint (language_model. prefix + vision tower
    dropped), zero-centered q/k norms folded, dual rope (local table for
    sliding layers), 5:1 sliding pattern."""
    text_cfg = {
        "model_type": "gemma3_text", "hidden_size": D,
        "num_attention_heads": H, "num_key_value_heads": 2,
        "num_hidden_layers": L, "vocab_size": V, "intermediate_size": F,
        "max_position_embeddings": 64, "head_dim": HD,
        "rms_norm_eps": 1e-6, "query_pre_attn_scalar": HD,
        "sliding_window": 4, "sliding_window_pattern": 2,
        "rope_theta": 1000000.0, "rope_local_base_freq": 10000.0,
    }
    cfg = {"model_type": "gemma3", "text_config": text_cfg}
    t = {"language_model.model.embed_tokens.weight": _w(V, D),
         "language_model.model.norm.weight": np.zeros(D, np.float32),
         "vision_tower.blocks.0.w": _w(4, 4),          # must be dropped
         "multi_modal_projector.w": _w(4, 4)}
    for i in range(L):
        p = f"language_model.model.layers.{i}"
        for n in ("input_layernorm", "post_attention_layernorm",
                  "pre_feedforward_layernorm", "post_feedforward_layernorm"):
            t[f"{p}.{n}.weight"] = np.zeros(D, np.float32)
        t[f"{p}.self_attn.q_proj.weight"] = _w(H * HD, D)
        t[f"{p}.self_attn.k_proj.weight"] = _w(2 * HD, D)
        t[f"{p}.self_attn.v_proj.weight"] = _w(2 * HD, D)
        t[f"{p}.self_attn.o_proj.weight"] = _w(D, H * HD)
        t[f"{p}.self_attn.q_norm.weight"] = np.zeros(HD, np.float32)
        t[f"{p}.self_attn.k_norm.weight"] = np.zeros(HD, np.float32)
        t[f"{p}.mlp.gate_proj.weight"] = _w(F, D)
        t[f"{p}.mlp.up_proj.weight"] = _w(F, D)
        t[f"{p}.mlp.down_proj.weight"] = _w(D, F)
    m = AutoQuickModel.from_pretrained(_write(tmp_path, cfg, t), jnp.float32)
    assert m.cfg.model_type == "gemma3"
    assert m.cfg.use_qk_norm and m.cfg.use_post_norms and m.cfg.embed_scale
    assert m.cfg.attn_logit_softcap is None  # gemma3 dropped the softcaps
    assert m.cfg.rope_local_theta == 10000.0
    assert m.params.rope_cos_local is not None
    # zero-centered fold applied to the per-head norms too
    np.testing.assert_allclose(
        np.asarray(m.params.blocks[0].attn.q_norm), np.ones(HD, np.float32)
    )
    # local and global tables genuinely differ (theta 1e4 vs 1e6)
    assert float(jnp.abs(
        m.params.rope_cos_local - m.params.rope_cos
    ).max()) > 1e-3
    _forward_ok(m)
    # the dual rope is live: zeroing the local table changes logits
    import dataclasses
    toks = jnp.asarray(RNG.integers(0, V, (1, 10)), jnp.int32)
    a, _ = model_forward(m.params, m.cfg, toks)
    p2 = dataclasses.replace(
        m.params, rope_cos_local=None, rope_sin_local=None
    )
    bld, _ = model_forward(p2, m.cfg, toks)
    assert float(jnp.abs(a - bld).max()) > 1e-4

def test_import_starcoder2(tmp_path):
    """StarCoder2: LayerNorm w/ bias everywhere, plain gelu c_fc/c_proj MLP,
    biases on every linear, RoPE, tied lm_head."""
    cfg = {
        "model_type": "starcoder2", "hidden_size": D,
        "num_attention_heads": H, "num_key_value_heads": 2,
        "num_hidden_layers": L, "vocab_size": V, "intermediate_size": F,
        "max_position_embeddings": 64, "norm_epsilon": 1e-5,
        "use_bias": True,
    }
    t = {"model.embed_tokens.weight": _w(V, D),
         "model.norm.weight": np.ones(D, np.float32),
         "model.norm.bias": np.zeros(D, np.float32)}
    for i in range(L):
        p = f"model.layers.{i}"
        for n in ("input_layernorm", "post_attention_layernorm"):
            t[f"{p}.{n}.weight"] = np.ones(D, np.float32)
            t[f"{p}.{n}.bias"] = np.zeros(D, np.float32)
        t[f"{p}.self_attn.q_proj.weight"] = _w(H * HD, D)
        t[f"{p}.self_attn.q_proj.bias"] = _w(H * HD)
        t[f"{p}.self_attn.k_proj.weight"] = _w(2 * HD, D)
        t[f"{p}.self_attn.k_proj.bias"] = _w(2 * HD)
        t[f"{p}.self_attn.v_proj.weight"] = _w(2 * HD, D)
        t[f"{p}.self_attn.v_proj.bias"] = _w(2 * HD)
        t[f"{p}.self_attn.o_proj.weight"] = _w(D, H * HD)
        t[f"{p}.self_attn.o_proj.bias"] = _w(D)
        t[f"{p}.mlp.c_fc.weight"] = _w(F, D)
        t[f"{p}.mlp.c_fc.bias"] = _w(F)
        t[f"{p}.mlp.c_proj.weight"] = _w(D, F)
        t[f"{p}.mlp.c_proj.bias"] = _w(D)
    m = AutoQuickModel.from_pretrained(_write(tmp_path, cfg, t), jnp.float32)
    assert m.cfg.layernorm == "layernorm" and not m.cfg.gated_mlp
    assert m.cfg.act_fn == "gelu" and m.cfg.use_rope
    assert m.cfg.tie_word_embeddings
    b0 = m.params.blocks[0]
    assert b0.attn.qkv_proj.bias is not None
    assert b0.attn_norm_bias is not None and b0.mlp_norm_bias is not None
    np.testing.assert_allclose(  # tied head
        np.asarray(m.params.lm_head.weight), np.asarray(m.params.embed).T,
        atol=1e-6,
    )
    _forward_ok(m)


def test_import_stablelm(tmp_path):
    """StableLM-2: llama tensor tree + LayerNorm biases (picked up by the
    family importer), partial rotary (25%), qkv bias via use_qkv_bias."""
    cfg = {
        "model_type": "stablelm", "hidden_size": D,
        "num_attention_heads": H, "num_key_value_heads": 2,
        "num_hidden_layers": L, "vocab_size": V, "intermediate_size": F,
        "max_position_embeddings": 64, "layer_norm_eps": 1e-5,
        "partial_rotary_factor": 0.25, "use_qkv_bias": True,
        "use_parallel_residual": False,
    }
    t = {"model.embed_tokens.weight": _w(V, D),
         "model.norm.weight": np.ones(D, np.float32),
         "model.norm.bias": np.zeros(D, np.float32),
         "lm_head.weight": _w(V, D)}
    for i in range(L):
        p = f"model.layers.{i}"
        for n in ("input_layernorm", "post_attention_layernorm"):
            t[f"{p}.{n}.weight"] = np.ones(D, np.float32)
            t[f"{p}.{n}.bias"] = np.zeros(D, np.float32)
        t[f"{p}.self_attn.q_proj.weight"] = _w(H * HD, D)
        t[f"{p}.self_attn.q_proj.bias"] = _w(H * HD)
        t[f"{p}.self_attn.k_proj.weight"] = _w(2 * HD, D)
        t[f"{p}.self_attn.k_proj.bias"] = _w(2 * HD)
        t[f"{p}.self_attn.v_proj.weight"] = _w(2 * HD, D)
        t[f"{p}.self_attn.v_proj.bias"] = _w(2 * HD)
        t[f"{p}.self_attn.o_proj.weight"] = _w(D, H * HD)
        t[f"{p}.mlp.gate_proj.weight"] = _w(F, D)
        t[f"{p}.mlp.up_proj.weight"] = _w(F, D)
        t[f"{p}.mlp.down_proj.weight"] = _w(D, F)
    m = AutoQuickModel.from_pretrained(_write(tmp_path, cfg, t), jnp.float32)
    assert m.cfg.layernorm == "layernorm" and m.cfg.gated_mlp
    assert m.cfg.rotary_dim == HD // 4 and not m.cfg.parallel_residual
    b0 = m.params.blocks[0]
    assert b0.attn.qkv_proj.bias is not None      # use_qkv_bias
    assert b0.attn.o_proj.bias is None
    assert b0.attn_norm_bias is not None
    assert m.params.final_norm_bias is not None
    _forward_ok(m)


def test_import_internlm2(tmp_path):
    """InternLM2: renamed llama tree with GROUPED fused wqkv (columns
    [hkv, g+2, hd]); degrouping must reproduce a plain [q|k|v] concat."""
    HKV = 2
    g = H // HKV
    cfg = {
        "model_type": "internlm2", "hidden_size": D,
        "num_attention_heads": H, "num_key_value_heads": HKV,
        "num_hidden_layers": L, "vocab_size": V, "intermediate_size": F,
        "max_position_embeddings": 64, "rms_norm_eps": 1e-5, "bias": False,
    }
    wq = _w(H * HD, D)
    wk = _w(HKV * HD, D)
    wv = _w(HKV * HD, D)
    # rows ordered [hkv, g+2, hd]: per kv group, g q-heads then k then v
    grouped = np.concatenate([
        np.concatenate([
            wq[h * g * HD:(h + 1) * g * HD],
            wk[h * HD:(h + 1) * HD],
            wv[h * HD:(h + 1) * HD],
        ]) for h in range(HKV)
    ])
    t = {"model.tok_embeddings.weight": _w(V, D),
         "model.norm.weight": np.ones(D, np.float32),
         "output.weight": _w(V, D)}
    for i in range(L):
        p = f"model.layers.{i}"
        t[f"{p}.attention_norm.weight"] = np.ones(D, np.float32)
        t[f"{p}.ffn_norm.weight"] = np.ones(D, np.float32)
        t[f"{p}.attention.wqkv.weight"] = grouped
        t[f"{p}.attention.wo.weight"] = _w(D, H * HD)
        t[f"{p}.feed_forward.w1.weight"] = _w(F, D)
        t[f"{p}.feed_forward.w3.weight"] = _w(F, D)
        t[f"{p}.feed_forward.w2.weight"] = _w(D, F)
    m = AutoQuickModel.from_pretrained(_write(tmp_path, cfg, t), jnp.float32)
    assert m.cfg.num_key_value_heads == HKV
    expect = np.concatenate([wq.T, wk.T, wv.T], axis=1)
    np.testing.assert_allclose(
        np.asarray(m.params.blocks[0].attn.qkv_proj.weight), expect,
        atol=1e-6,
    )
    _forward_ok(m)

def test_import_phi3(tmp_path):
    """Phi-3: pre-fused qkv_proj/gate_up_proj tensors import directly;
    longrope scaling builds the table; fused layout matches a manual
    [q|k|v] / [gate|up] concat."""
    cfg = {
        "model_type": "phi3", "hidden_size": D, "num_attention_heads": H,
        "num_key_value_heads": 2, "num_hidden_layers": L, "vocab_size": V,
        "intermediate_size": F, "max_position_embeddings": 64,
        "original_max_position_embeddings": 32, "rms_norm_eps": 1e-5,
        "rope_scaling": {"rope_type": "longrope",
                         "short_factor": [1.0] * (HD // 2),
                         "long_factor": [2.0] * (HD // 2),
                         "original_max_position_embeddings": 32},
    }
    wq = _w(H * HD, D)
    wk = _w(2 * HD, D)
    wv = _w(2 * HD, D)
    gate = _w(F, D)
    up = _w(F, D)
    t = {"model.embed_tokens.weight": _w(V, D),
         "model.norm.weight": np.ones(D, np.float32),
         "lm_head.weight": _w(V, D)}
    for i in range(L):
        p = f"model.layers.{i}"
        t[f"{p}.input_layernorm.weight"] = np.ones(D, np.float32)
        t[f"{p}.post_attention_layernorm.weight"] = np.ones(D, np.float32)
        t[f"{p}.self_attn.qkv_proj.weight"] = np.concatenate([wq, wk, wv])
        t[f"{p}.self_attn.o_proj.weight"] = _w(D, H * HD)
        t[f"{p}.mlp.gate_up_proj.weight"] = np.concatenate([gate, up])
        t[f"{p}.mlp.down_proj.weight"] = _w(D, F)
    m = AutoQuickModel.from_pretrained(_write(tmp_path, cfg, t), jnp.float32)
    assert m.cfg.gated_mlp and m.cfg.layernorm == "rmsnorm"
    assert dict(m.cfg.rope_scaling)["long_factor"] == (2.0,) * (HD // 2)
    b0 = m.params.blocks[0]
    np.testing.assert_allclose(
        np.asarray(b0.attn.qkv_proj.weight),
        np.concatenate([wq.T, wk.T, wv.T], axis=1), atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(b0.mlp.gate_up_proj.weight),
        np.concatenate([gate.T, up.T], axis=1), atol=1e-6,
    )
    # longrope attention factor applied (64 > original 32)
    import math
    mscale = math.sqrt(1.0 + math.log(2.0) / math.log(32.0))
    np.testing.assert_allclose(
        np.asarray(m.params.rope_cos[0, 0]), mscale, rtol=1e-5
    )
    _forward_ok(m)

def test_import_cohere(tmp_path):
    """Cohere command-r+: shared input norm feeding parallel attn+mlp,
    interleaved-rope conversion (channel permutation on q/k AND the
    per-head q/k LayerNorm weights), logit_scale, tied head."""
    cfg = {
        "model_type": "cohere", "hidden_size": D, "num_attention_heads": H,
        "num_key_value_heads": 2, "num_hidden_layers": L, "vocab_size": V,
        "intermediate_size": F, "max_position_embeddings": 64,
        "layer_norm_eps": 1e-5, "logit_scale": 0.25, "use_qk_norm": True,
    }
    t = {"model.embed_tokens.weight": _w(V, D),
         "model.norm.weight": np.ones(D, np.float32)}
    for i in range(L):
        p = f"model.layers.{i}"
        t[f"{p}.input_layernorm.weight"] = np.ones(D, np.float32)
        t[f"{p}.self_attn.q_proj.weight"] = _w(H * HD, D)
        t[f"{p}.self_attn.k_proj.weight"] = _w(2 * HD, D)
        t[f"{p}.self_attn.v_proj.weight"] = _w(2 * HD, D)
        t[f"{p}.self_attn.o_proj.weight"] = _w(D, H * HD)
        t[f"{p}.self_attn.q_norm.weight"] = 1 + 0.1 * _w(H, HD)
        t[f"{p}.self_attn.k_norm.weight"] = 1 + 0.1 * _w(2, HD)
        t[f"{p}.mlp.gate_proj.weight"] = _w(F, D)
        t[f"{p}.mlp.up_proj.weight"] = _w(F, D)
        t[f"{p}.mlp.down_proj.weight"] = _w(D, F)
    m = AutoQuickModel.from_pretrained(_write(tmp_path, cfg, t), jnp.float32)
    assert m.cfg.parallel_residual and m.cfg.layernorm == "layernorm"
    assert m.cfg.logit_scale == 0.25 and m.cfg.tie_word_embeddings
    b0 = m.params.blocks[0]
    assert b0.attn.q_norm.shape == (H, HD)   # per-head LayerNorm weights
    np.testing.assert_allclose(  # shared norm duplicated into both slots
        np.asarray(b0.attn_norm), np.asarray(b0.mlp_norm)
    )
    _forward_ok(m)
    # logit_scale is live and exactly linear in the logits
    import dataclasses
    toks = jnp.asarray(RNG.integers(0, V, (1, 5)), jnp.int32)
    a, _ = model_forward(m.params, m.cfg, toks)
    b, _ = model_forward(
        m.params, dataclasses.replace(m.cfg, logit_scale=0.5), toks
    )
    np.testing.assert_allclose(np.asarray(a) * 2, np.asarray(b), rtol=1e-5)


def test_cohere_norm_permutation_commutes():
    """LayerNorm over head_dim commutes with the interleave->rotate-half
    channel permutation (mean/var are permutation invariant), so permuting
    the projection AND the norm weights preserves cohere's numerics."""
    hd = 16
    perm = np.concatenate([np.arange(0, hd, 2), np.arange(1, hd, 2)])
    x = RNG.standard_normal((3, hd)).astype(np.float32)
    w = (1 + 0.1 * RNG.standard_normal(hd)).astype(np.float32)

    def ln(x, w):
        mu = x.mean(-1, keepdims=True)
        var = x.var(-1, keepdims=True)
        return (x - mu) / np.sqrt(var + 1e-5) * w

    np.testing.assert_allclose(
        ln(x[:, perm], w[perm]), ln(x, w)[:, perm], rtol=1e-5, atol=1e-6
    )


def test_import_granite(tmp_path):
    """Granite: llama tree + four static multipliers (embedding, residual,
    logits, attention)."""
    cfg = {
        "model_type": "granite", "hidden_size": D,
        "num_attention_heads": H, "num_key_value_heads": 2,
        "num_hidden_layers": L, "vocab_size": V, "intermediate_size": F,
        "max_position_embeddings": 64, "rms_norm_eps": 1e-5,
        "embedding_multiplier": 12.0, "residual_multiplier": 0.22,
        "logits_scaling": 8.0, "attention_multiplier": 0.5,
    }
    t = {"model.embed_tokens.weight": _w(V, D),
         "model.norm.weight": np.ones(D, np.float32)}
    for i in range(L):
        p = f"model.layers.{i}"
        t[f"{p}.input_layernorm.weight"] = np.ones(D, np.float32)
        t[f"{p}.post_attention_layernorm.weight"] = np.ones(D, np.float32)
        t[f"{p}.self_attn.q_proj.weight"] = _w(H * HD, D)
        t[f"{p}.self_attn.k_proj.weight"] = _w(2 * HD, D)
        t[f"{p}.self_attn.v_proj.weight"] = _w(2 * HD, D)
        t[f"{p}.self_attn.o_proj.weight"] = _w(D, H * HD)
        t[f"{p}.mlp.gate_proj.weight"] = _w(F, D)
        t[f"{p}.mlp.up_proj.weight"] = _w(F, D)
        t[f"{p}.mlp.down_proj.weight"] = _w(D, F)
    m = AutoQuickModel.from_pretrained(_write(tmp_path, cfg, t), jnp.float32)
    assert m.cfg.embed_multiplier == 12.0
    assert m.cfg.residual_multiplier == 0.22
    assert m.cfg.logit_scale == 1 / 8.0
    # attention_multiplier am -> query_pre_attn_scalar am**-2 (scale == am)
    assert abs(m.cfg.query_pre_attn_scalar - 4.0) < 1e-9
    _forward_ok(m)
    # each multiplier is live
    import dataclasses
    toks = jnp.asarray(RNG.integers(0, V, (1, 6)), jnp.int32)
    a, _ = model_forward(m.params, m.cfg, toks)
    for off in ("embed_multiplier", "residual_multiplier",
                "query_pre_attn_scalar"):
        b, _ = model_forward(
            m.params, dataclasses.replace(m.cfg, **{off: None}), toks
        )
        assert float(jnp.abs(a - b).max()) > 1e-4, off


def test_minicpm_config_translation():
    """MiniCPM mup multipliers: scale_emb -> embed, scale_depth/sqrt(L) ->
    residual, dim_model_base/D -> logit scale."""
    from quick_tpu import ModelConfig
    cfg = ModelConfig.from_hf_config({
        "model_type": "minicpm", "hidden_size": 64,
        "num_attention_heads": 4, "num_hidden_layers": 4, "vocab_size": 128,
        "intermediate_size": 128, "scale_emb": 12.0, "scale_depth": 1.4,
        "dim_model_base": 16,
    })
    assert cfg.embed_multiplier == 12.0
    assert abs(cfg.residual_multiplier - 1.4 / 2.0) < 1e-9
    assert abs(cfg.logit_scale - 16 / 64) < 1e-9
    assert cfg.tie_word_embeddings

def test_import_olmo2(tmp_path):
    """OLMo-2: post-norm-only block (x + post_norm(attn(x))), full-width
    q/k RMSNorm before the head reshape."""
    cfg = {
        "model_type": "olmo2", "hidden_size": D, "num_attention_heads": H,
        "num_key_value_heads": 2, "num_hidden_layers": L, "vocab_size": V,
        "intermediate_size": F, "max_position_embeddings": 64,
        "rms_norm_eps": 1e-5,
    }
    t = {"model.embed_tokens.weight": _w(V, D),
         "model.norm.weight": np.ones(D, np.float32),
         "lm_head.weight": _w(V, D)}
    for i in range(L):
        p = f"model.layers.{i}"
        t[f"{p}.post_attention_layernorm.weight"] = np.ones(D, np.float32)
        t[f"{p}.post_feedforward_layernorm.weight"] = np.ones(D, np.float32)
        t[f"{p}.self_attn.q_proj.weight"] = _w(H * HD, D)
        t[f"{p}.self_attn.k_proj.weight"] = _w(2 * HD, D)
        t[f"{p}.self_attn.v_proj.weight"] = _w(2 * HD, D)
        t[f"{p}.self_attn.o_proj.weight"] = _w(D, H * HD)
        t[f"{p}.self_attn.q_norm.weight"] = 1 + 0.1 * _w(H * HD)
        t[f"{p}.self_attn.k_norm.weight"] = 1 + 0.1 * _w(2 * HD)
        t[f"{p}.mlp.gate_proj.weight"] = _w(F, D)
        t[f"{p}.mlp.up_proj.weight"] = _w(F, D)
        t[f"{p}.mlp.down_proj.weight"] = _w(D, F)
    m = AutoQuickModel.from_pretrained(_write(tmp_path, cfg, t), jnp.float32)
    assert not m.cfg.pre_norms and m.cfg.use_post_norms
    assert m.cfg.qk_norm_full and m.cfg.use_qk_norm
    b0 = m.params.blocks[0]
    assert b0.attn_norm is None and b0.mlp_norm is None
    assert b0.attn_post_norm is not None and b0.mlp_post_norm is not None
    assert b0.attn.q_norm.shape == (H * HD,)
    assert b0.attn.k_norm.shape == (2 * HD,)
    _forward_ok(m)
    # full-width q/k norm matches a manual reference on the first block
    # (rms over the WHOLE projection, not per head)
    x = jnp.asarray(RNG.standard_normal((1, 3, D)), jnp.float32)
    qkv = x @ b0.attn.qkv_proj.weight
    q = np.asarray(qkv[..., : H * HD], np.float64)
    ref = (q / np.sqrt((q ** 2).mean(-1, keepdims=True) + 1e-5)
           ) * np.asarray(b0.attn.q_norm, np.float64)
    from quick_tpu.ops.norms import rms_norm
    got = rms_norm(jnp.asarray(q, jnp.float32), b0.attn.q_norm, 1e-5)
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-4, atol=1e-5)


def test_olmo2_save_quantize_roundtrip(tmp_path):
    """olmo2's pre-norm-less blocks survive RTN quantize + save + load
    (None norms round-trip through the flat checkpoint schema)."""
    from quick_tpu import ModelConfig, QuantConfig
    from quick_tpu.models.model import quantize_params
    from quick_tpu.utils.checkpoint import load_quantized, save_quantized

    cfg = ModelConfig(
        model_type="olmo2", vocab_size=V, hidden_size=D,
        intermediate_size=F, num_hidden_layers=L, num_attention_heads=H,
        num_key_value_heads=2, max_position_embeddings=64,
        use_post_norms=True, pre_norms=False, use_qk_norm=True,
        qk_norm_full=True,
    )
    m = AutoQuickModel.from_random(cfg, dtype=jnp.float32)
    qp = quantize_params(m.params, cfg, group_size=32)
    d = str(tmp_path / "q")
    save_quantized(qp, cfg, QuantConfig(q_group_size=32), d)
    p2, cfg2, _ = load_quantized(d)
    assert cfg2.pre_norms is False and cfg2.qk_norm_full
    assert p2.blocks[0].attn_norm is None
    toks = jnp.asarray(RNG.integers(0, V, (1, 8)), jnp.int32)
    a, _ = model_forward(qp, cfg, toks)
    b, _ = model_forward(p2, cfg2, toks)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_import_qwen2_moe(tmp_path):
    _rng = np.random.default_rng(77)
    _wl = lambda *sh: (_rng.standard_normal(sh) * 0.05).astype(np.float32)
    """qwen2_moe: softmax-all routing, per-layer sparse/dense mix
    (mlp_only_layers), shared expert with sigmoid gate, qkv biases."""
    E, Fe, Fs = 4, 32, 48
    cfg = {
        "model_type": "qwen2_moe", "hidden_size": D,
        "num_attention_heads": H, "num_key_value_heads": 2,
        "num_hidden_layers": L, "intermediate_size": F,
        "moe_intermediate_size": Fe,
        "shared_expert_intermediate_size": Fs,
        "num_experts": E, "num_experts_per_tok": 2,
        "norm_topk_prob": False, "decoder_sparse_step": 1,
        "mlp_only_layers": [0], "vocab_size": V,
        "max_position_embeddings": 64, "rms_norm_eps": 1e-6,
    }
    t = {"model.embed_tokens.weight": _wl(V, D),
         "model.norm.weight": np.ones(D, np.float32),
         "lm_head.weight": _wl(V, D)}
    for i in range(L):
        p = f"model.layers.{i}"
        t[f"{p}.input_layernorm.weight"] = np.ones(D, np.float32)
        t[f"{p}.post_attention_layernorm.weight"] = np.ones(D, np.float32)
        for n, o in (("q_proj", D), ("k_proj", 2 * HD), ("v_proj", 2 * HD)):
            t[f"{p}.self_attn.{n}.weight"] = _wl(o, D)
            t[f"{p}.self_attn.{n}.bias"] = _wl(o)
        t[f"{p}.self_attn.o_proj.weight"] = _wl(D, D)
        if i == 0:  # mlp_only layer: dense MLP
            t[f"{p}.mlp.gate_proj.weight"] = _wl(F, D)
            t[f"{p}.mlp.up_proj.weight"] = _wl(F, D)
            t[f"{p}.mlp.down_proj.weight"] = _wl(D, F)
        else:
            t[f"{p}.mlp.gate.weight"] = _wl(E, D)
            for e in range(E):
                t[f"{p}.mlp.experts.{e}.gate_proj.weight"] = _wl(Fe, D)
                t[f"{p}.mlp.experts.{e}.up_proj.weight"] = _wl(Fe, D)
                t[f"{p}.mlp.experts.{e}.down_proj.weight"] = _wl(D, Fe)
            t[f"{p}.mlp.shared_expert.gate_proj.weight"] = _wl(Fs, D)
            t[f"{p}.mlp.shared_expert.up_proj.weight"] = _wl(Fs, D)
            t[f"{p}.mlp.shared_expert.down_proj.weight"] = _wl(D, Fs)
            t[f"{p}.mlp.shared_expert_gate.weight"] = _wl(1, D)
    m = AutoQuickModel.from_pretrained(_write(tmp_path, cfg, t), jnp.float32)
    assert m.cfg.moe_router == "softmax_all" and not m.cfg.norm_topk_prob
    assert not m.cfg.layer_is_moe(0) and m.cfg.layer_is_moe(1)
    from quick_tpu.modules.blocks import MLPParams, MoEParams

    assert isinstance(m.params.blocks[0].mlp, MLPParams)
    moe = m.params.blocks[1].mlp
    assert isinstance(moe, MoEParams)
    assert moe.shared_gate is not None
    assert moe.shared_gate.weight.shape == (D, 1)
    assert moe.shared_gate_up.weight.shape == (D, 2 * Fs)
    assert m.params.blocks[1].attn.qkv_proj.bias is not None
    _forward_ok(m)


def test_import_qwen3_moe(tmp_path):
    _rng = np.random.default_rng(77)
    _wl = lambda *sh: (_rng.standard_normal(sh) * 0.05).astype(np.float32)
    """qwen3_moe: per-head q/k RMSNorm + softmax-all routing with
    norm_topk_prob, no shared expert."""
    E, Fe = 4, 32
    cfg = {
        "model_type": "qwen3_moe", "hidden_size": D,
        "num_attention_heads": H, "num_key_value_heads": 2,
        "num_hidden_layers": L, "intermediate_size": F,
        "moe_intermediate_size": Fe, "num_experts": E,
        "num_experts_per_tok": 2, "norm_topk_prob": True,
        "decoder_sparse_step": 1, "head_dim": HD, "vocab_size": V,
        "max_position_embeddings": 64, "rms_norm_eps": 1e-6,
    }
    t = {"model.embed_tokens.weight": _wl(V, D),
         "model.norm.weight": np.ones(D, np.float32),
         "lm_head.weight": _wl(V, D)}
    for i in range(L):
        p = f"model.layers.{i}"
        t[f"{p}.input_layernorm.weight"] = np.ones(D, np.float32)
        t[f"{p}.post_attention_layernorm.weight"] = np.ones(D, np.float32)
        for n, o in (("q_proj", D), ("k_proj", 2 * HD), ("v_proj", 2 * HD)):
            t[f"{p}.self_attn.{n}.weight"] = _wl(o, D)
        t[f"{p}.self_attn.o_proj.weight"] = _wl(D, D)
        t[f"{p}.self_attn.q_norm.weight"] = np.ones(HD, np.float32)
        t[f"{p}.self_attn.k_norm.weight"] = np.ones(HD, np.float32)
        t[f"{p}.mlp.gate.weight"] = _wl(E, D)
        for e in range(E):
            t[f"{p}.mlp.experts.{e}.gate_proj.weight"] = _wl(Fe, D)
            t[f"{p}.mlp.experts.{e}.up_proj.weight"] = _wl(Fe, D)
            t[f"{p}.mlp.experts.{e}.down_proj.weight"] = _wl(D, Fe)
    m = AutoQuickModel.from_pretrained(_write(tmp_path, cfg, t), jnp.float32)
    assert m.cfg.use_qk_norm and m.cfg.norm_topk_prob
    moe = m.params.blocks[0].mlp
    assert moe.shared_gate is None and moe.shared_gate_up is None
    _forward_ok(m)


def test_qwen2_moe_routing_reference():
    """moe_forward with softmax_all routing + sigmoid-gated shared expert
    vs a straight-line numpy port of HF modeling_qwen2_moe's sparse MLP."""
    from quick_tpu import ModelConfig
    from quick_tpu.modules.blocks import MoEParams, moe_forward
    from quick_tpu.modules.linear import Linear

    rng = np.random.default_rng(5)
    Dm, E, Fe, Fs, topk = 16, 4, 8, 12, 2
    cfg = ModelConfig(
        vocab_size=32, hidden_size=Dm, intermediate_size=32,
        num_hidden_layers=1, num_attention_heads=2,
        max_position_embeddings=32, num_local_experts=E,
        num_experts_per_tok=topk, moe_router="softmax_all",
        norm_topk_prob=False, shared_expert_gate=True,
    )
    Wr = rng.standard_normal((Dm, E)).astype(np.float32)
    Gu = rng.standard_normal((E, Dm, 2 * Fe)).astype(np.float32) * 0.2
    Dn = rng.standard_normal((E, Fe, Dm)).astype(np.float32) * 0.2
    Sgu = rng.standard_normal((Dm, 2 * Fs)).astype(np.float32) * 0.2
    Sdn = rng.standard_normal((Fs, Dm)).astype(np.float32) * 0.2
    Wg = rng.standard_normal((Dm, 1)).astype(np.float32)
    x = rng.standard_normal((1, 3, Dm)).astype(np.float32) * 0.5
    p = MoEParams(
        router=Linear(jnp.asarray(Wr)),
        gate_up_proj=Linear(jnp.asarray(Gu)),
        down_proj=Linear(jnp.asarray(Dn)),
        shared_gate_up=Linear(jnp.asarray(Sgu)),
        shared_down=Linear(jnp.asarray(Sdn)),
        shared_gate=Linear(jnp.asarray(Wg)),
    )
    got = np.asarray(moe_forward(p, cfg, jnp.asarray(x)))

    def silu(a):
        return a / (1.0 + np.exp(-a))

    ref = np.zeros_like(x)
    for b in range(1):
        for s in range(3):
            h = x[b, s]
            logits = h @ Wr
            sm = np.exp(logits - logits.max())
            sm = sm / sm.sum()
            sel = np.argsort(sm)[::-1][:topk]
            acc = np.zeros(Dm, np.float32)
            for e in sel:
                z = h @ Gu[e]
                acc += sm[e] * (silu(z[:Fe]) * z[Fe:]) @ Dn[e]
            z = h @ Sgu
            shared = (silu(z[:Fs]) * z[Fs:]) @ Sdn
            g = 1.0 / (1.0 + np.exp(-(h @ Wg)[0]))
            ref[b, s] = acc + g * shared
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=2e-5)


def test_import_baichuan2_normhead(tmp_path):
    """Baichuan2 (same model_type, vocab 125696) uses NormHead: each output
    row of lm_head is L2-normalized at inference — the import must fold
    that in or logits are scaled by per-row norms."""
    V2 = 125696
    cfg = {
        "model_type": "baichuan", "hidden_size": 32,
        "num_attention_heads": 2, "num_hidden_layers": 1, "vocab_size": V2,
        "intermediate_size": 64, "max_position_embeddings": 32,
    }
    t = {"model.embed_tokens.weight": _w(V2, 32),
         "model.norm.weight": np.ones(32, np.float32),
         "lm_head.weight": _w(V2, 32) * 3.0}
    p = "model.layers.0"
    t[f"{p}.input_layernorm.weight"] = np.ones(32, np.float32)
    t[f"{p}.post_attention_layernorm.weight"] = np.ones(32, np.float32)
    t[f"{p}.self_attn.W_pack.weight"] = _w(96, 32)
    t[f"{p}.self_attn.o_proj.weight"] = _w(32, 32)
    t[f"{p}.mlp.gate_proj.weight"] = _w(64, 32)
    t[f"{p}.mlp.up_proj.weight"] = _w(64, 32)
    t[f"{p}.mlp.down_proj.weight"] = _w(32, 64)
    m = AutoQuickModel.from_pretrained(_write(tmp_path, cfg, t), jnp.float32)
    hw = np.asarray(m.params.lm_head.weight, np.float32)  # [D, vocab]
    norms = np.linalg.norm(hw, axis=0)
    np.testing.assert_allclose(norms, np.ones_like(norms), atol=1e-4)


def _llama_clone_tensors(include_head=True):
    t = {"model.embed_tokens.weight": _w(V, D),
         "model.norm.weight": np.ones(D, np.float32)}
    if include_head:
        t["lm_head.weight"] = _w(V, D)
    for i in range(L):
        p = f"model.layers.{i}"
        t[f"{p}.input_layernorm.weight"] = np.ones(D, np.float32)
        t[f"{p}.post_attention_layernorm.weight"] = np.ones(D, np.float32)
        t[f"{p}.self_attn.q_proj.weight"] = _w(H * HD, D)
        t[f"{p}.self_attn.k_proj.weight"] = _w(2 * HD, D)
        t[f"{p}.self_attn.v_proj.weight"] = _w(2 * HD, D)
        t[f"{p}.self_attn.o_proj.weight"] = _w(D, H * HD)
        t[f"{p}.mlp.gate_proj.weight"] = _w(F, D)
        t[f"{p}.mlp.up_proj.weight"] = _w(F, D)
        t[f"{p}.mlp.down_proj.weight"] = _w(D, F)
    return t


def test_import_unmapped_llama_clone_falls_back(tmp_path):
    """Generality fallback (the analog of the reference's unfused
    run-anything path, base.py:241-335): an UNMAPPED model_type whose
    checkpoint is a llama-schema clone imports with a warning instead of
    a hard error."""
    cfg = {
        "model_type": "frontierlm_v9", "hidden_size": D,
        "num_attention_heads": H, "num_key_value_heads": 2,
        "num_hidden_layers": L, "vocab_size": V, "intermediate_size": F,
        "max_position_embeddings": 64, "head_dim": HD,
        "rms_norm_eps": 1e-6,
    }
    path = _write(tmp_path, cfg, _llama_clone_tensors())
    with pytest.warns(UserWarning, match="frontierlm_v9"):
        m = AutoQuickModel.from_pretrained(path, jnp.float32)
    assert m.cfg.model_type == "frontierlm_v9"
    _forward_ok(m)


def test_import_unmapped_non_llama_schema_fails_clearly(tmp_path):
    """An unmapped type whose tensors do NOT match the llama schema must
    fail naming the missing tensor, not with a bare KeyError."""
    cfg = {
        "model_type": "alienformer", "hidden_size": D,
        "num_attention_heads": H, "num_hidden_layers": L, "vocab_size": V,
        "intermediate_size": F, "max_position_embeddings": 64,
    }
    t = {"transformer.wte.weight": _w(V, D)}  # not a llama layout
    path = _write(tmp_path, cfg, t)
    with pytest.raises(NotImplementedError, match="alienformer"):
        AutoQuickModel.from_pretrained(path, jnp.float32)
