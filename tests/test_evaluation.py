"""Evaluation harness tests: PPL protocol + KL regression between models."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quick_tpu import ModelConfig
from quick_tpu.evaluation import eval_kl_divergence, evaluate_perplexity
from quick_tpu.models import init_float_params, quantize_params

CFG = ModelConfig(
    vocab_size=128, hidden_size=64, intermediate_size=128,
    num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
    max_position_embeddings=64,
)


@pytest.fixture(scope="module")
def fparams():
    return init_float_params(CFG, jax.random.PRNGKey(0))


def test_ppl_uniform_model_bound(fparams):
    """A random-init model on random tokens must score near-uniform PPL
    (<= vocab size, and well above 1)."""
    toks = np.random.default_rng(0).integers(0, 128, 4 * 64)
    ppl = evaluate_perplexity(fparams, CFG, toks, seqlen=64)
    assert 10 < ppl < 400  # vocab=128; uniform would be 128


def test_ppl_memorized_sequence():
    """A model that always predicts token 7 gives PPL ~1 on constant-7 text."""
    cfg = CFG
    p = init_float_params(cfg, jax.random.PRNGKey(1))
    # bias the lm_head output heavily toward token 7 via its bias
    import dataclasses

    from quick_tpu.modules.linear import Linear

    bias = jnp.full((cfg.vocab_size,), -30.0).at[7].set(30.0)
    p = dataclasses.replace(p, lm_head=Linear(p.lm_head.weight * 0, bias))
    toks = np.full(3 * 64, 7)
    ppl = evaluate_perplexity(p, cfg, toks, seqlen=64)
    assert ppl < 1.01


def test_kl_self_is_zero(fparams):
    toks = np.random.default_rng(1).integers(0, 128, 128)
    rep = eval_kl_divergence(fparams, CFG, fparams, CFG, toks, seqlen=64)
    assert rep.mean_kl < 1e-5
    assert rep.top1_agreement == 1.0


def test_kl_quant_vs_float_sane(fparams):
    toks = np.random.default_rng(2).integers(0, 128, 256)
    qp = quantize_params(fparams, CFG, group_size=32)
    rep = eval_kl_divergence(fparams, CFG, qp, CFG, toks, seqlen=64)
    assert np.isfinite(rep.mean_kl) and rep.mean_kl < 1.0
    assert rep.topk_agreement >= rep.top1_agreement
    assert rep.kl_ci95[0] <= rep.mean_kl <= rep.kl_ci95[1]


def test_quant_ppl_close_to_float(fparams):
    """End-to-end numerics acceptance: W4 PPL within a sane delta of float
    on the same stream (the reference's PPL-parity criterion,
    README.md:122)."""
    toks = np.random.default_rng(3).integers(0, 128, 4 * 64)
    ppl_f = evaluate_perplexity(fparams, CFG, toks, seqlen=64)
    qp = quantize_params(fparams, CFG, group_size=32)
    ppl_q = evaluate_perplexity(qp, CFG, toks, seqlen=64)
    # random weights quantize poorly; just require same ballpark
    assert abs(np.log(ppl_q) - np.log(ppl_f)) < 0.5


def test_ppl_batched_matches_unbatched():
    import jax

    from quick_tpu import ModelConfig
    from quick_tpu.evaluation import evaluate_perplexity
    from quick_tpu.models import init_float_params

    cfg = ModelConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=1, num_attention_heads=2, num_key_value_heads=2,
        max_position_embeddings=64,
    )
    params = init_float_params(cfg, jax.random.PRNGKey(0))
    toks = np.random.default_rng(0).integers(0, 128, 64 * 5)
    a = evaluate_perplexity(params, cfg, toks, seqlen=64)
    b = evaluate_perplexity(params, cfg, toks, seqlen=64, batch=2)
    np.testing.assert_allclose(a, b, rtol=1e-4)


# ---- softcap + sliding-window accuracy proxy (VERDICT r4 item 7) -----------

GEMMA2_CFG = ModelConfig(
    vocab_size=128, hidden_size=64, intermediate_size=128,
    num_hidden_layers=6, num_attention_heads=4, num_key_value_heads=2,
    max_position_embeddings=64, model_type="gemma2",
    sliding_window=10, sliding_window_pattern=2,
    attn_logit_softcap=30.0, final_logit_softcap=20.0,
    use_post_norms=True, act_fn="gelu", embed_scale=True,
)


@pytest.fixture(scope="module")
def gemma2_params():
    return init_float_params(GEMMA2_CFG, jax.random.PRNGKey(3))


def test_kl_quant_gemma2_class(gemma2_params):
    """The quantization-cost KL proxy on a 6-layer softcap + alternating
    sliding-window + sandwich-norm model: the round-4/5 kernel additions
    (softcap in every attention path, window masks) are covered by the
    accuracy harness, not only by equivalence tests."""
    toks = np.random.default_rng(4).integers(0, 128, 256)
    qp = quantize_params(gemma2_params, GEMMA2_CFG, group_size=32)
    rep = eval_kl_divergence(
        gemma2_params, GEMMA2_CFG, qp, GEMMA2_CFG, toks, seqlen=64
    )
    assert np.isfinite(rep.mean_kl) and rep.mean_kl < 1.0
    assert rep.topk_agreement >= rep.top1_agreement
    rep_self = eval_kl_divergence(
        gemma2_params, GEMMA2_CFG, gemma2_params, GEMMA2_CFG, toks,
        seqlen=64,
    )
    assert rep_self.mean_kl < 1e-5  # softcap path is self-consistent


def test_gemma2_class_decode_matches_prefill(gemma2_params):
    """Greedy decode (S=1 kernels: fused step / dense decode with softcap
    and window) must emit the tokens the chunked prefill path predicts."""
    from quick_tpu.models.model import model_forward
    from quick_tpu.runtime.generate import SamplingParams, generate

    qp = quantize_params(gemma2_params, GEMMA2_CFG, group_size=32)
    prompt = jnp.asarray(
        np.random.default_rng(5).integers(0, 128, (1, 16)), jnp.int32
    )
    out = generate(
        qp, GEMMA2_CFG, prompt, max_new_tokens=8,
        sampling=SamplingParams(temperature=0.0),
    )
    # re-score the full sequence with the prefill path: each emitted token
    # must be the argmax after its prefix
    logits, _ = model_forward(qp, GEMMA2_CFG, out)
    pred = np.asarray(jnp.argmax(logits, -1))[0]
    got = np.asarray(out)[0]
    for i in range(16, out.shape[1] - 1):
        assert pred[i] == got[i + 1], (i, pred[i], got[i + 1])
