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
