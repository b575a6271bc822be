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
