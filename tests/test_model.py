"""Model forward + generation runtime tests (tiny configs, CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quick_tpu import ModelConfig
from quick_tpu.models import init_float_params, model_forward, quantize_params
from quick_tpu.runtime import SamplingParams, decode_loop, generate, make_cache, prefill

TINY = ModelConfig(
    vocab_size=256, hidden_size=128, intermediate_size=256,
    num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
    max_position_embeddings=64,
)


@pytest.fixture(scope="module")
def float_params():
    return init_float_params(TINY, jax.random.PRNGKey(0))


@pytest.fixture(scope="module")
def quant_params(float_params):
    return quantize_params(float_params, TINY)


def test_forward_shapes(float_params):
    logits, _ = model_forward(float_params, TINY, jnp.zeros((2, 5), jnp.int32))
    assert logits.shape == (2, 5, 256)
    assert bool(jnp.isfinite(logits).all())


def test_quant_forward_close_to_float(float_params, quant_params):
    toks = jax.random.randint(jax.random.PRNGKey(1), (2, 8), 0, 256)
    lf, _ = model_forward(float_params, TINY, toks)
    lq, _ = model_forward(quant_params, TINY, toks)
    pf = jax.nn.log_softmax(lf[:, -1])
    pq = jax.nn.log_softmax(lq[:, -1])
    kl = float(jnp.sum(jnp.exp(pf) * (pf - pq), axis=-1).mean())
    assert np.isfinite(kl) and kl < 0.5  # random weights: loose bound


def test_a8_forward_close_to_a16(quant_params, monkeypatch):
    """QUICK_TPU_A8=1 (per-row int8 activations in every quantized linear)
    must stay distribution-close to the W4A16 forward on a prefill-shaped
    batch."""
    toks = jax.random.randint(jax.random.PRNGKey(2), (2, 16), 0, 256)
    la, _ = model_forward(quant_params, TINY, toks)
    monkeypatch.setenv("QUICK_TPU_A8", "1")
    jax.clear_caches()  # the flag is read at trace time
    l8, _ = model_forward(quant_params, TINY, toks)
    monkeypatch.delenv("QUICK_TPU_A8")
    jax.clear_caches()
    pa = jax.nn.log_softmax(la[:, -1].astype(jnp.float32))
    p8 = jax.nn.log_softmax(l8[:, -1].astype(jnp.float32))
    kl = float(jnp.sum(jnp.exp(pa) * (pa - p8), axis=-1).mean())
    assert np.isfinite(kl) and kl < 0.1


def test_dense_decode_kernel_matches_einsum(float_params, monkeypatch):
    """Dense-cache decode through the paged Pallas kernel (identity block
    table over the head-major layer, interpret mode on CPU) must match the
    XLA fused-heads einsum path."""
    toks = jax.random.randint(jax.random.PRNGKey(7), (2, 9), 0, 256)

    def run():
        cache = make_cache(TINY, 2, 16)
        _, cache = prefill(float_params, TINY, toks[:, :6], cache)
        outs = []
        for t in range(6, 9):
            logits, cache = model_forward(
                float_params, TINY, toks[:, t : t + 1], cache
            )
            outs.append(logits[:, 0])
        return np.asarray(jnp.stack(outs, axis=1))

    monkeypatch.setenv("QUICK_TPU_DENSE_KERNEL", "0")
    ref = run()
    monkeypatch.setenv("QUICK_TPU_DENSE_KERNEL", "1")
    out = run()
    np.testing.assert_allclose(out, ref, atol=0.03, rtol=0.03)


def test_cache_incremental_matches_full(float_params):
    """Prefill+decode over a cache must equal the full-sequence forward —
    the core KV-cache correctness property."""
    toks = jax.random.randint(jax.random.PRNGKey(2), (1, 10), 0, 256)
    full_logits, _ = model_forward(float_params, TINY, toks)
    cache = make_cache(TINY, 1, 16)
    _, cache = prefill(float_params, TINY, toks[:, :6], cache)
    outs = []
    for t in range(6, 10):
        logits, cache = model_forward(float_params, TINY, toks[:, t : t + 1], cache)
        outs.append(logits[:, 0])
    inc = jnp.stack(outs, axis=1)
    np.testing.assert_allclose(
        np.asarray(inc), np.asarray(full_logits[:, 6:]), atol=0.05, rtol=0.05
    )


def test_generate_greedy_deterministic(quant_params):
    prompt = jnp.ones((2, 4), jnp.int32)
    a = generate(quant_params, TINY, prompt, max_new_tokens=6)
    b = generate(quant_params, TINY, prompt, max_new_tokens=6)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert a.shape == (2, 10)


def test_generate_greedy_matches_stepwise(float_params):
    """decode_loop (scan) must equal explicit step-by-step decoding."""
    prompt = jnp.full((1, 3), 7, jnp.int32)
    out = generate(float_params, TINY, prompt, max_new_tokens=5)
    cache = make_cache(TINY, 1, 8)
    logits, cache = prefill(float_params, TINY, prompt, cache)
    cur = jnp.argmax(logits, -1).astype(jnp.int32)
    toks = [cur]
    for _ in range(4):
        logits, cache = model_forward(float_params, TINY, cur[:, None], cache)
        cur = jnp.argmax(logits[:, -1], -1).astype(jnp.int32)
        toks.append(cur)
    np.testing.assert_array_equal(
        np.asarray(out[:, 3:]), np.asarray(jnp.stack(toks, axis=1))
    )


def test_sampling_modes_run(quant_params):
    prompt = jnp.ones((1, 2), jnp.int32)
    for sp in [
        SamplingParams(temperature=1.0),
        SamplingParams(temperature=0.7, top_k=10),
        SamplingParams(temperature=0.7, top_p=0.9),
    ]:
        out = generate(quant_params, TINY, prompt, max_new_tokens=4, sampling=sp)
        assert out.shape == (1, 6)
        assert int(out.max()) < 256


def test_eos_masking(float_params):
    prompt = jnp.ones((1, 2), jnp.int32)
    out = generate(float_params, TINY, prompt, max_new_tokens=6, eos_token_id=5)
    gen = np.asarray(out)[0, 2:]
    if (gen == 5).any():
        first = int(np.argmax(gen == 5))
        assert (gen[first:] == 5).all()


def test_gqa_vs_mha_consistency():
    """MQA (kv=1) and MHA (kv=heads) paths both run and give finite logits."""
    for kv in (1, 4):
        cfg = ModelConfig(
            vocab_size=64, hidden_size=64, intermediate_size=128,
            num_hidden_layers=1, num_attention_heads=4, num_key_value_heads=kv,
            max_position_embeddings=32,
        )
        p = init_float_params(cfg, jax.random.PRNGKey(3))
        logits, _ = model_forward(p, cfg, jnp.zeros((1, 4), jnp.int32))
        assert bool(jnp.isfinite(logits).all())


def test_moe_forward():
    cfg = ModelConfig(
        vocab_size=64, hidden_size=64, intermediate_size=128,
        num_hidden_layers=1, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=32, num_local_experts=4, num_experts_per_tok=2,
        model_type="mixtral",
    )
    p = init_float_params(cfg, jax.random.PRNGKey(4))
    logits, _ = model_forward(p, cfg, jnp.zeros((1, 4), jnp.int32))
    assert bool(jnp.isfinite(logits).all())
    qp = quantize_params(p, cfg, group_size=32)
    ql, _ = model_forward(qp, cfg, jnp.zeros((1, 4), jnp.int32))
    assert bool(jnp.isfinite(ql).all())


def test_rolling_window_cache(float_params):
    """Window roll keeps decoding alive past max_seq (reference
    WindowedCache.roll_kv_n_steps parity)."""
    cache = make_cache(TINY, 1, 8)
    _, cache = prefill(float_params, TINY, jnp.ones((1, 6), jnp.int32), cache)
    cache = cache.roll(4)
    assert int(cache.length) == 2
    logits, cache = model_forward(
        float_params, TINY, jnp.ones((1, 1), jnp.int32), cache
    )
    assert bool(jnp.isfinite(logits).all())


def test_modules_to_not_convert(float_params):
    """Excluded linears stay float (reference exclude_layers_to_not_quantize,
    utils/module.py:44-54); both our names and HF names match."""
    from quick_tpu.modules.linear import Linear, QuantLinear

    qp = quantize_params(
        float_params, TINY, modules_to_not_convert=["down_proj"]
    )
    for blk in qp.blocks:
        assert isinstance(blk.mlp.down_proj, Linear)
        assert isinstance(blk.mlp.gate_up_proj, QuantLinear)
        assert isinstance(blk.attn.qkv_proj, QuantLinear)
    logits, _ = model_forward(qp, TINY, jnp.zeros((1, 4), jnp.int32))
    assert bool(jnp.isfinite(logits).all())


def test_modules_to_not_convert_awq():
    from quick_tpu.config import QuantConfig
    from quick_tpu.modules.linear import Linear, QuantLinear
    from quick_tpu.quantize.awq import awq_quantize_model

    params = init_float_params(TINY, jax.random.PRNGKey(0))
    calib = jax.random.randint(jax.random.PRNGKey(1), (1, 32), 0, 256)
    qcfg = QuantConfig(q_group_size=32, modules_to_not_convert=["o_proj"])
    qp = awq_quantize_model(params, TINY, calib, qcfg, verbose=False)
    for blk in qp.blocks:
        assert isinstance(blk.attn.o_proj, Linear)
        assert isinstance(blk.attn.qkv_proj, QuantLinear)


def test_moe_sparse_dispatch_matches_dense():
    """The cond-gated small-batch MoE path must equal the dense-einsum path
    (and skip experts with no routed tokens)."""
    import dataclasses as dc

    from quick_tpu.modules.blocks import moe_forward

    cfg = ModelConfig(
        vocab_size=128, hidden_size=64, intermediate_size=96,
        num_hidden_layers=1, num_attention_heads=4, num_key_value_heads=4,
        max_position_embeddings=32, num_local_experts=4,
        num_experts_per_tok=2, model_type="mixtral",
    )
    params = init_float_params(cfg, jax.random.PRNGKey(0))
    moe = params.blocks[0].mlp
    # small batch -> sparse cond path
    x_small = jax.random.normal(jax.random.PRNGKey(1), (1, 2, 64), jnp.float32)
    y_small = moe_forward(moe, cfg, x_small)
    # same tokens replicated into a big batch -> dense path; rows must agree
    x_big = jnp.tile(x_small, (17, 1, 1))  # 34 tokens > threshold
    y_big = moe_forward(moe, cfg, x_big)
    np.testing.assert_allclose(
        np.asarray(y_small[0]), np.asarray(y_big[0]), atol=2e-3, rtol=2e-3
    )


def test_quantize_lm_head(float_params):
    from quick_tpu.modules.linear import QuantLinear

    qp = quantize_params(float_params, TINY, quantize_lm_head=True)
    assert isinstance(qp.lm_head, QuantLinear)
    toks = jax.random.randint(jax.random.PRNGKey(4), (1, 8), 0, 256)
    lf, _ = model_forward(quantize_params(float_params, TINY), TINY, toks)
    lq, _ = model_forward(qp, TINY, toks)
    pf = jax.nn.log_softmax(lf[:, -1])
    pq = jax.nn.log_softmax(lq[:, -1])
    kl = float(jnp.sum(jnp.exp(pf) * (pf - pq), axis=-1).mean())
    assert np.isfinite(kl) and kl < 0.2
