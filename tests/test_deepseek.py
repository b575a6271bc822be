"""DeepSeek-V2/V3: MLA attention (latent cache, absorbed formulation) and
DeepSeekMoE (shared experts, group-limited / sigmoid+bias routing)."""
import dataclasses
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from safetensors.numpy import save_file

from quick_tpu import ModelConfig, QuantConfig
from quick_tpu.models.auto import AutoQuickModel
from quick_tpu.models.model import (
    init_float_params,
    model_forward,
    quantize_params,
)
from quick_tpu.modules.mla import mla_attention_forward, mla_softmax_scale

RNG = np.random.default_rng(0)
D, HQ, DN, DR, DV, R = 64, 4, 16, 8, 16, 32
V, F, L = 128, 64, 3


def _cfg(**kw):
    base = dict(
        model_type="deepseek_v2", vocab_size=V, hidden_size=D,
        intermediate_size=F, num_hidden_layers=L, num_attention_heads=HQ,
        num_key_value_heads=HQ, max_position_embeddings=64,
        kv_lora_rank=R, qk_nope_head_dim=DN, qk_rope_head_dim=DR,
        v_head_dim=DV, head_dim=DN + DR, rotary_dim=DR,
    )
    base.update(kw)
    return ModelConfig(**base)


def _w(*shape):
    return (RNG.standard_normal(shape) * 0.05).astype(np.float32)


def test_mla_absorbed_matches_naive_expansion():
    """The absorbed latent-space attention equals the naive expanded MHA:
    k_nope = c @ W_UK, v = c @ W_UV, k_pe broadcast across heads."""
    cfg = _cfg()
    p = init_float_params(cfg, jax.random.PRNGKey(0), jnp.float32)
    a = p.blocks[0].attn
    B, S = 2, 10
    x = jnp.asarray(RNG.standard_normal((B, S, D)), jnp.float32)
    positions = jnp.broadcast_to(jnp.arange(S)[None], (B, S))
    out, _ = mla_attention_forward(
        a, cfg, x, p.rope_cos, p.rope_sin, None, 0, positions
    )

    # naive expansion (f64-ish reference in f32 numpy)
    from quick_tpu.ops.norms import rms_norm
    from quick_tpu.ops.rope import apply_rope

    q = a.q_proj(x).reshape(B, S, HQ, DN + DR)
    q_nope, q_pe = q[..., :DN], q[..., DN:]
    q_pe = apply_rope(q_pe, positions, p.rope_cos, p.rope_sin)
    ckv = a.kv_a_proj(x)
    c = rms_norm(ckv[..., :R], a.kv_a_norm, cfg.rms_norm_eps)
    k_pe = apply_rope(
        ckv[..., None, R:], positions, p.rope_cos, p.rope_sin
    )  # [B,S,1,DR]
    wkv = a.kv_b_proj.weight.reshape(R, HQ, DN + DV)
    k_nope = jnp.einsum("btr,rhd->bthd", c, wkv[..., :DN])
    v = jnp.einsum("btr,rhd->bthd", c, wkv[..., DN:])
    k = jnp.concatenate(
        [k_nope, jnp.broadcast_to(k_pe, (B, S, HQ, DR))], axis=-1
    )
    qq = jnp.concatenate([q_nope, q_pe], axis=-1)
    scores = jnp.einsum("bshd,bthd->bhst", qq, k) * mla_softmax_scale(cfg)
    mask = jnp.tril(jnp.ones((S, S), bool))
    scores = jnp.where(mask[None, None], scores, -jnp.inf)
    attn = jax.nn.softmax(scores, axis=-1)
    ref = jnp.einsum("bhst,bthd->bshd", attn, v).reshape(B, S, HQ * DV)
    ref = a.o_proj(ref)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-3, atol=2e-4
    )


def test_mla_incremental_matches_full():
    """Prefill + per-token decode through the LATENT cache reproduces the
    uncached full forward; the cache stores only R+DR floats per token."""
    from quick_tpu.runtime import make_cache, prefill

    cfg = _cfg(q_lora_rank=32)  # exercise the q-LoRA path too
    p = init_float_params(cfg, jax.random.PRNGKey(1), jnp.float32)
    assert p.blocks[0].attn.q_b_proj is not None
    toks = jnp.asarray(RNG.integers(0, V, (2, 12)), jnp.int32)
    full, _ = model_forward(p, cfg, toks)

    cache = make_cache(cfg, 2, 16, dtype=jnp.float32)
    assert cache.k.shape == (L, 2, 1, 16, DR)   # k_pe slot
    assert cache.v.shape == (L, 2, 1, 16, R)    # latent slot
    _, cache = prefill(p, cfg, toks[:, :6], cache)
    outs = []
    for t in range(6, 12):
        lg, cache = model_forward(p, cfg, toks[:, t : t + 1], cache)
        outs.append(lg[:, 0])
    inc = jnp.stack(outs, axis=1)
    np.testing.assert_allclose(
        np.asarray(inc), np.asarray(full[:, 6:]), atol=0.05, rtol=0.05
    )


def test_deepseek_moe_group_limited_routing():
    """Group-limited routing masks experts outside the top groups; the
    selected experts' weights come from the ORIGINAL scores, renormalized
    and scaled by routed_scaling_factor."""
    from quick_tpu.modules.blocks import MoEParams, moe_forward
    from quick_tpu.modules.linear import Linear

    E, topk = 4, 2
    cfg = _cfg(
        num_local_experts=E, num_experts_per_tok=topk,
        moe_router="deepseek", n_group=2, topk_group=1,
        routed_scaling_factor=2.0, norm_topk_prob=True,
        moe_intermediate_size=32,
    )
    # router that strongly prefers experts 0 (group 0) and 2,3 (group 1):
    # group 1's max (expert 2) below expert 0, so with topk_group=1 the
    # winning group is 0 — expert 1 must be chosen over 2/3 despite lower
    # raw score
    Wr = np.zeros((D, E), np.float32)
    Wr[0] = [9.0, 1.0, 5.0, 4.0]
    gu = Linear(jnp.asarray(_w(E, D, 64)))
    dn = Linear(jnp.asarray(_w(E, 32, D)))
    p = MoEParams(router=Linear(jnp.asarray(Wr)), gate_up_proj=gu,
                  down_proj=dn)
    x = jnp.ones((1, 1, D), jnp.float32)  # activates row 0 of the router
    # capture the combine weights by probing with identity-ish experts:
    # use the routing math directly instead
    logits = x.reshape(-1) @ Wr
    scores = jax.nn.softmax(jnp.asarray(logits))
    # group 0 wins (max 9 > 5); top-2 inside masked scores = experts 0,1
    w0, w1 = float(scores[0]), float(scores[1])
    expect = np.zeros(E, np.float32)
    expect[0] = w0 / (w0 + w1) * 2.0
    expect[1] = w1 / (w0 + w1) * 2.0

    # instrument: run moe_forward with experts that return their index
    # as a constant so the output reveals the combine weights
    outs = []
    for e in range(E):
        g = np.zeros((D, 64), np.float32)
        d = np.zeros((32, D), np.float32)
        outs.append((g, d))
    # simpler: monkey-check by building expert weights where expert e
    # contributes e+1 in every output channel
    guw = np.zeros((E, D, 64), np.float32)
    guw[:, 0, :32] = 10.0   # gate: silu(10) ~ 10
    guw[:, 0, 32:] = 1.0    # up = 1
    dnw = np.stack([
        np.full((32, D), (e + 1) / 320.0, np.float32) for e in range(E)
    ])
    p = MoEParams(
        router=Linear(jnp.asarray(Wr)),
        gate_up_proj=Linear(jnp.asarray(guw)),
        down_proj=Linear(jnp.asarray(dnw)),
    )
    y = moe_forward(p, cfg, x)
    # expert e output ≈ silu(10)*1*32*(e+1)/320 ≈ (e+1) * 0.99966
    per_expert = np.array([
        float(jax.nn.silu(jnp.asarray(10.0))) * 32 * (e + 1) / 320.0
        for e in range(E)
    ])
    expect_y = (expect * per_expert).sum()
    np.testing.assert_allclose(float(y[0, 0, 0]), expect_y, rtol=1e-3)


def test_deepseek_v3_bias_affects_selection_not_weights():
    """v3 e_score_correction_bias flips WHICH experts win but the combine
    weights still come from the unbiased sigmoid scores."""
    from quick_tpu.modules.blocks import MoEParams, moe_forward
    from quick_tpu.modules.linear import Linear

    E = 4
    cfg = _cfg(
        model_type="deepseek_v3", num_local_experts=E,
        num_experts_per_tok=1, moe_router="deepseek",
        scoring_func="sigmoid", routed_scaling_factor=1.0,
        norm_topk_prob=False, moe_intermediate_size=32,
    )
    Wr = np.zeros((D, E), np.float32)
    Wr[0] = [2.0, 1.9, 0.0, 0.0]   # expert 0 wins on raw score
    guw = np.zeros((E, D, 64), np.float32)
    guw[:, 0, :32] = 10.0
    guw[:, 0, 32:] = 1.0
    dnw = np.stack([
        np.full((32, D), (e + 1) / 320.0, np.float32) for e in range(E)
    ])
    bias = jnp.asarray([0.0, 5.0, 0.0, 0.0])  # flips selection to expert 1
    p = MoEParams(
        router=Linear(jnp.asarray(Wr)),
        gate_up_proj=Linear(jnp.asarray(guw)),
        down_proj=Linear(jnp.asarray(dnw)),
        score_bias=bias,
    )
    x = jnp.ones((1, 1, D), jnp.float32)
    y = moe_forward(p, cfg, x)
    s1 = float(jax.nn.sigmoid(jnp.asarray(1.9)))  # weight = UNBIASED score
    per1 = float(jax.nn.silu(jnp.asarray(10.0))) * 32 * 2 / 320.0
    np.testing.assert_allclose(float(y[0, 0, 0]), s1 * per1, rtol=1e-3)


def test_import_deepseek_v2_lite_style(tmp_path):
    """Synthetic v2-lite checkpoint: full q_proj (no q-LoRA), dense layer 0
    + MoE layers with shared experts, interleaved-pe conversion."""
    E = 4
    cfg = {
        "model_type": "deepseek_v2", "hidden_size": D,
        "num_attention_heads": HQ, "num_key_value_heads": HQ,
        "num_hidden_layers": L, "vocab_size": V, "intermediate_size": F,
        "max_position_embeddings": 64, "rms_norm_eps": 1e-6,
        "kv_lora_rank": R, "q_lora_rank": None, "qk_nope_head_dim": DN,
        "qk_rope_head_dim": DR, "v_head_dim": DV,
        "n_routed_experts": E, "num_experts_per_tok": 2,
        "n_shared_experts": 1, "moe_intermediate_size": 32,
        "first_k_dense_replace": 1, "moe_layer_freq": 1,
        "topk_method": "greedy", "routed_scaling_factor": 1.0,
        "norm_topk_prob": False,
    }
    t = {"model.embed_tokens.weight": _w(V, D),
         "model.norm.weight": np.ones(D, np.float32),
         "lm_head.weight": _w(V, D)}
    for i in range(L):
        p = f"model.layers.{i}"
        t[f"{p}.input_layernorm.weight"] = np.ones(D, np.float32)
        t[f"{p}.post_attention_layernorm.weight"] = np.ones(D, np.float32)
        t[f"{p}.self_attn.q_proj.weight"] = _w(HQ * (DN + DR), D)
        t[f"{p}.self_attn.kv_a_proj_with_mqa.weight"] = _w(R + DR, D)
        t[f"{p}.self_attn.kv_a_layernorm.weight"] = np.ones(R, np.float32)
        t[f"{p}.self_attn.kv_b_proj.weight"] = _w(HQ * (DN + DV), R)
        t[f"{p}.self_attn.o_proj.weight"] = _w(D, HQ * DV)
        if i == 0:  # dense (first_k_dense_replace=1)
            t[f"{p}.mlp.gate_proj.weight"] = _w(F, D)
            t[f"{p}.mlp.up_proj.weight"] = _w(F, D)
            t[f"{p}.mlp.down_proj.weight"] = _w(D, F)
        else:
            t[f"{p}.mlp.gate.weight"] = _w(E, D)
            for e in range(E):
                t[f"{p}.mlp.experts.{e}.gate_proj.weight"] = _w(32, D)
                t[f"{p}.mlp.experts.{e}.up_proj.weight"] = _w(32, D)
                t[f"{p}.mlp.experts.{e}.down_proj.weight"] = _w(D, 32)
            t[f"{p}.mlp.shared_experts.gate_proj.weight"] = _w(32, D)
            t[f"{p}.mlp.shared_experts.up_proj.weight"] = _w(32, D)
            t[f"{p}.mlp.shared_experts.down_proj.weight"] = _w(D, 32)
    os.makedirs(tmp_path, exist_ok=True)
    save_file(t, os.path.join(str(tmp_path), "model.safetensors"))
    with open(os.path.join(str(tmp_path), "config.json"), "w") as f:
        json.dump(cfg, f)
    m = AutoQuickModel.from_pretrained(str(tmp_path), jnp.float32)
    assert m.cfg.is_mla and m.cfg.kv_lora_rank == R
    assert m.cfg.moe_router == "deepseek" and m.cfg.n_group is None
    assert m.cfg.layer_is_moe(1) and not m.cfg.layer_is_moe(0)
    from quick_tpu.modules.blocks import MLPParams, MoEParams
    assert isinstance(m.params.blocks[0].mlp, MLPParams)
    assert isinstance(m.params.blocks[1].mlp, MoEParams)
    assert m.params.blocks[1].mlp.shared_gate_up is not None
    # forward + incremental through the latent cache
    from quick_tpu.runtime import make_cache, prefill

    toks = jnp.asarray(RNG.integers(0, V, (1, 10)), jnp.int32)
    logits, _ = model_forward(m.params, m.cfg, toks)
    assert bool(jnp.isfinite(logits).all())
    cache = make_cache(m.cfg, 1, 16, dtype=jnp.float32)
    _, cache = prefill(m.params, m.cfg, toks[:, :6], cache)
    outs = []
    for tt in range(6, 10):
        lg, cache = model_forward(m.params, m.cfg, toks[:, tt : tt + 1], cache)
        outs.append(lg[:, 0])
    inc = jnp.stack(outs, axis=1)
    np.testing.assert_allclose(
        np.asarray(inc), np.asarray(logits[:, 6:]), atol=0.05, rtol=0.05
    )


def test_deepseek_quantize_save_load_roundtrip(tmp_path):
    """RTN quantization keeps kv_b float; the quantized model round-trips
    through the flat checkpoint schema (MLA + shared experts + bias)."""
    from quick_tpu.modules.linear import Linear, QuantLinear
    from quick_tpu.utils.checkpoint import load_quantized, save_quantized

    cfg = _cfg(
        model_type="deepseek_v3", q_lora_rank=32,
        num_local_experts=4, num_experts_per_tok=2,
        moe_router="deepseek", scoring_func="sigmoid",
        n_group=2, topk_group=1, moe_intermediate_size=32,
        n_shared_experts=1, first_k_dense_replace=1,
    )
    p = init_float_params(cfg, jax.random.PRNGKey(2), jnp.float32)
    qp = quantize_params(p, cfg, group_size=16)
    b1 = qp.blocks[1]
    assert isinstance(b1.attn.q_proj, QuantLinear)
    assert isinstance(b1.attn.kv_b_proj, Linear)      # stays float
    assert isinstance(b1.mlp.shared_gate_up, QuantLinear)
    assert b1.mlp.score_bias is not None
    d = str(tmp_path / "q")
    save_quantized(qp, cfg, QuantConfig(q_group_size=16), d)
    p2, cfg2, _ = load_quantized(d)
    assert cfg2.is_mla and cfg2.scoring_func == "sigmoid"
    toks = jnp.asarray(RNG.integers(0, V, (1, 8)), jnp.int32)
    a, _ = model_forward(qp, cfg, toks)
    b, _ = model_forward(p2, cfg2, toks)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_deepseek_awq_pipeline():
    """AWQ on a deepseek model: MLA projections RTN+clip, MoE gets the full
    scale search (shared experts in the joint group); logits stay close."""
    from quick_tpu.quantize.awq import awq_quantize_model

    cfg = _cfg(
        num_local_experts=4, num_experts_per_tok=2, moe_router="deepseek",
        moe_intermediate_size=32, n_shared_experts=1,
        first_k_dense_replace=1, norm_topk_prob=True,
    )
    p = init_float_params(cfg, jax.random.PRNGKey(3), jnp.float32)
    calib = jax.random.randint(jax.random.PRNGKey(4), (2, 24), 0, V)
    qp = awq_quantize_model(
        p, cfg, calib, QuantConfig(q_group_size=16), verbose=False
    )
    from quick_tpu.modules.linear import Linear, QuantLinear
    assert isinstance(qp.blocks[0].attn.q_proj, QuantLinear)
    assert isinstance(qp.blocks[0].attn.kv_b_proj, Linear)
    toks = jax.random.randint(jax.random.PRNGKey(5), (1, 12), 0, V)
    lf, _ = model_forward(p, cfg, toks)
    lq, _ = model_forward(qp, cfg, toks)
    assert bool(jnp.isfinite(lq).all())
    assert float(jnp.abs(lf - lq).mean()) < 0.5


def test_deepseek_paged_engine_matches_generate():
    """Continuous-batching engine over the paged LATENT cache: greedy
    outputs match dense-cache generate; cache planes hold only
    [k_pe | c_kv] per token (asymmetric k/v page widths)."""
    from quick_tpu.runtime import SamplingParams, generate
    from quick_tpu.runtime.serving import Engine

    cfg = _cfg(
        q_lora_rank=32, num_local_experts=4, num_experts_per_tok=2,
        moe_router="deepseek", moe_intermediate_size=32,
        n_shared_experts=1, first_k_dense_replace=1,
    )
    p = init_float_params(cfg, jax.random.PRNGKey(7), jnp.float32)
    prompt = list(range(7, 17))
    ref = generate(
        p, cfg, jnp.asarray([prompt], jnp.int32), max_new_tokens=6,
        sampling=SamplingParams(temperature=0.0),
    )
    ref = list(np.asarray(ref)[0, len(prompt):])
    eng = Engine(p, cfg, max_slots=2, max_seq=64, page_size=8, chunk=8,
                 dtype=jnp.float32)
    assert eng.cache.k_pages.shape[-2:] == (8, DR)   # k_pe plane
    assert eng.cache.v_pages.shape[-2:] == (8, R)    # latent plane
    assert eng.cache.k_pages.shape[2] == 1           # MQA
    uid = eng.submit(prompt, max_new_tokens=6)
    outs = eng.run()
    assert outs[uid] == ref


def test_deepseek_paged_write_kernel_asymmetric(monkeypatch):
    """The Pallas page-write kernel handles the MLA planes' asymmetric
    widths (k_pe vs latent): kernel (interpret) == XLA scatter."""
    import dataclasses

    L, P, page = 2, 5, 32
    bt = jnp.asarray([[1, 2], [3, 4]], jnp.int32)
    rng2 = np.random.default_rng(3)
    k = jnp.asarray(rng2.standard_normal((2, 1, 1, DR)), jnp.float32)
    v = jnp.asarray(rng2.standard_normal((2, 1, 1, R)), jnp.float32)

    def run(env):
        monkeypatch.setenv("QUICK_TPU_PAGED_WRITE", env)
        from quick_tpu.modules.paged_cache import PagedKVCache

        cache = PagedKVCache.create(
            L, P, page, max_slots=2, max_seq=64, n_kv=1, head_dim=DR,
            dtype=jnp.float32, v_head_dim=R,
        )
        cache = dataclasses.replace(cache, block_table=bt)
        cache = cache.update(1, k, v, jnp.asarray([3, 33]))
        return cache

    a, b = run("1"), run("0")
    np.testing.assert_array_equal(np.asarray(a.k_pages), np.asarray(b.k_pages))
    np.testing.assert_array_equal(np.asarray(a.v_pages), np.asarray(b.v_pages))


@pytest.mark.parametrize("dtype", ["float32", "int8"])
def test_mla_paged_kernel_matches_gather(monkeypatch, dtype):
    """The fused MLA paged-decode kernel (interpret mode) must match the
    XLA gather baseline through a full prefill+decode, float and INT8."""
    from quick_tpu.modules.paged_cache import PagedKVCache

    cfg = _cfg(q_lora_rank=32)
    p = init_float_params(cfg, jax.random.PRNGKey(9), jnp.float32)
    toks = jnp.asarray(RNG.integers(0, V, (2, 9)), jnp.int32)
    page = 8

    def run(env):
        monkeypatch.setenv("QUICK_TPU_PAGED", env)
        import dataclasses

        jdt = jnp.int8 if dtype == "int8" else jnp.float32
        cache = PagedKVCache.create(
            L, 9, page, max_slots=2, max_seq=32, n_kv=1, head_dim=DR,
            dtype=jdt, v_head_dim=R,
        )
        bt = jnp.asarray([[1, 2, 3, 4], [5, 6, 7, 8]], jnp.int32)
        cache = dataclasses.replace(cache, block_table=bt)
        logits, cache = model_forward(p, cfg, toks[:, :6], cache)
        outs = [logits[:, -1]]
        for t in range(6, 9):
            lg, cache = model_forward(p, cfg, toks[:, t : t + 1], cache)
            outs.append(lg[:, 0])
        return np.asarray(jnp.stack(outs, axis=1))

    kern, gath = run("1"), run("0")
    # hidden states ride in bf16 (models/model.py:86): the two paths
    # reassociate bf16 products differently — strict kernel equivalence is
    # test_mla_paged_kernel_direct below
    np.testing.assert_allclose(kern, gath, rtol=0.05, atol=0.08)


@pytest.mark.parametrize("quant", [False, True])
def test_mla_paged_kernel_direct(quant):
    """Strict f32 equivalence of the MLA paged kernel against a dense
    softmax reference on random latent pages (incl. INT8 scale folding)."""
    from quick_tpu.modules.paged_cache import PagedKVCache
    from quick_tpu.ops.mla_paged_attention import mla_paged_decode_attention

    import dataclasses

    B, HQ2, R2, DR2, page, n_pt = 2, 4, 64, 16, 8, 4
    rng2 = np.random.default_rng(11)
    jdt = jnp.int8 if quant else jnp.float32
    cache = PagedKVCache.create(
        1, 9, page, max_slots=B, max_seq=page * n_pt, n_kv=1, head_dim=DR2,
        dtype=jdt, v_head_dim=R2,
    )
    bt = jnp.asarray([[1, 2, 3, 4], [5, 6, 7, 8]], jnp.int32)
    cache = dataclasses.replace(cache, block_table=bt)
    lengths = jnp.asarray([13, 27], jnp.int32)
    T = int(lengths.max())
    kpe = jnp.asarray(rng2.standard_normal((B, T, 1, DR2)), jnp.float32)
    c = jnp.asarray(rng2.standard_normal((B, T, 1, R2)), jnp.float32)
    cache = cache.update(0, kpe, c, jnp.zeros((B,), jnp.int32))
    q_c = jnp.asarray(rng2.standard_normal((B, HQ2, R2)), jnp.float32)
    q_pe = jnp.asarray(rng2.standard_normal((B, HQ2, DR2)), jnp.float32)
    scale = (R2 + DR2) ** -0.5
    out = mla_paged_decode_attention(
        q_c, q_pe, cache.k_pages, cache.v_pages, bt, lengths, layer=0,
        scale=scale,
        kv_scales=cache.kv_scales if quant else None,
        interpret=True,
    )
    # reference over the DEQUANTIZED cache contents (so INT8 rounding is
    # shared) with per-slot length masking
    k_all, v_all = cache.layer(0)  # [B, 1, Tmax, .]
    kpe_d, c_d = k_all[:, 0], v_all[:, 0]
    s = (
        jnp.einsum("bhr,btr->bht", q_c, c_d.astype(jnp.float32))
        + jnp.einsum("bhd,btd->bht", q_pe, kpe_d.astype(jnp.float32))
    ) * scale
    tpos = jnp.arange(c_d.shape[1])[None, None, :]
    s = jnp.where(tpos < lengths[:, None, None], s, -jnp.inf)
    ref = jnp.einsum(
        "bht,btr->bhr", jax.nn.softmax(s, axis=-1), c_d.astype(jnp.float32)
    )
    # INT8 path multiplies bf16-rounded probabilities (by design, like the
    # standard paged kernel); the float path is exact f32
    tol = dict(rtol=2e-2, atol=2e-3) if quant else dict(rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), **tol)


def test_mla_expanded_prefill_matches_absorbed(monkeypatch):
    """Long prefill (S>=32) expands the latent to per-head K/V and rides
    causal_attention (flash when forced): must equal the absorbed-form
    incremental decode through the latent cache, einsum AND flash."""
    from quick_tpu.runtime import make_cache, prefill

    cfg = _cfg(q_lora_rank=32, max_position_embeddings=128)
    p = init_float_params(cfg, jax.random.PRNGKey(10), jnp.float32)
    toks = jnp.asarray(RNG.integers(0, V, (2, 40)), jnp.int32)

    def full(env):
        monkeypatch.setenv("QUICK_TPU_FLASH", env)
        out, _ = model_forward(p, cfg, toks)  # S=40 -> expanded branch
        return np.asarray(out)

    # absorbed reference: chunked S<32 prefill + per-token decode
    cache = make_cache(cfg, 2, 48, dtype=jnp.float32)
    _, cache = prefill(p, cfg, toks[:, :16], cache)
    _, cache = prefill(p, cfg, toks[:, 16:32], cache)
    outs = []
    for t in range(32, 40):
        lg, cache = model_forward(p, cfg, toks[:, t : t + 1], cache)
        outs.append(lg[:, 0])
    inc = np.asarray(jnp.stack(outs, axis=1))
    einsum_out, flash_out = full("0"), full("1")
    # absorbed and expanded are the same math but reassociate every bf16
    # product differently (hidden states are bf16, models/model.py:86)
    np.testing.assert_allclose(
        einsum_out[:, 32:], inc, atol=0.1, rtol=0.05
    )
    # flash (Dv != Dq/k asymmetric tile) vs einsum on the same branch
    np.testing.assert_allclose(flash_out, einsum_out, atol=0.05, rtol=0.05)


def test_deepseek_engine_int8_kv():
    """INT8-quantized latent pages keep the engine functional (capacity
    feature; per-token scales over the asymmetric planes)."""
    from quick_tpu.runtime.serving import Engine

    cfg = _cfg(q_lora_rank=32, first_k_dense_replace=L)
    p = init_float_params(cfg, jax.random.PRNGKey(8), jnp.float32)
    eng = Engine(p, cfg, max_slots=2, max_seq=64, page_size=8, chunk=8,
                 dtype=jnp.int8)
    u1 = eng.submit(list(range(5, 15)), max_new_tokens=5)
    outs = eng.run()
    assert len(outs[u1]) == 5
    assert all(0 <= t < V for t in outs[u1])


def test_deepseek_tp_sharded_forward():
    """MLA + deepseek MoE under TP=2 on the CPU mesh: sharded forward
    matches single-device."""
    from quick_tpu.parallel import (
        create_mesh,
        shard_params,
        sharded_forward_fn,
    )
    from quick_tpu.runtime import make_cache

    if len(jax.devices()) < 2:
        import pytest

        pytest.skip("needs multi-device mesh")
    cfg = _cfg(
        q_lora_rank=32, num_local_experts=4, num_experts_per_tok=2,
        moe_router="deepseek", moe_intermediate_size=32,
        n_shared_experts=1, first_k_dense_replace=1,
    )
    p = init_float_params(cfg, jax.random.PRNGKey(6), jnp.float32)
    toks = jnp.asarray(RNG.integers(0, V, (2, 8)), jnp.int32)
    cache = make_cache(cfg, 2, 16, dtype=jnp.float32)
    ref, _ = model_forward(p, cfg, toks, cache)
    mesh = create_mesh(tp=2)
    sp = shard_params(p, cfg, mesh)
    fn = sharded_forward_fn(cfg, mesh)(p)
    out, _ = jax.jit(fn)(sp, toks, make_cache(cfg, 2, 16, dtype=jnp.float32))
    # hidden states ride in bf16 (models/model.py:86) so TP reassociation
    # differs at bf16-ulp level — same tolerance as test_parallel.py
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=0.05, atol=0.05
    )
