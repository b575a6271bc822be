"""Prompt-lookup speculative decoding: exactness vs greedy generate
(runtime/speculative.py) and the n-gram proposer."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quick_tpu import ModelConfig
from quick_tpu.models import init_float_params
from quick_tpu.runtime import SamplingParams, generate, speculative_generate
from quick_tpu.runtime.speculative import ngram_propose

TINY = ModelConfig(
    vocab_size=128, hidden_size=64, intermediate_size=128,
    num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
    max_position_embeddings=256,
)


def test_ngram_propose_finds_most_recent():
    # ... 7 8 9 | 1 2 3 4 5 | 7 8 9 | 1 2 3 [tail: 7 8 9] -> continuation
    # after the MOST RECENT earlier "7 8 9" is "1 2 3"
    row = jnp.asarray(
        [7, 8, 9, 1, 2, 3, 4, 5, 7, 8, 9, 1, 2, 3, 7, 8, 9, 0, 0, 0],
        jnp.int32,
    )
    p0 = jnp.int32(16)  # last valid token: the trailing 9
    drafts = ngram_propose(row, p0, ngram=3, draft_len=3)
    assert np.asarray(drafts).tolist() == [1, 2, 3]


def test_ngram_propose_no_match_falls_back():
    row = jnp.asarray([1, 2, 3, 4, 5, 6, 0, 0], jnp.int32)
    drafts = ngram_propose(row, jnp.int32(5), ngram=3, draft_len=4)
    assert np.asarray(drafts).tolist() == [6, 6, 6, 6]  # repeat-last


@pytest.mark.parametrize("draft_len,ngram", [(4, 3), (2, 2), (6, 4)])
def test_speculative_matches_greedy(draft_len, ngram):
    """Token-exact vs generate(temperature=0) — acceptance only ever
    emits verified argmax tokens."""
    params = init_float_params(TINY, jax.random.PRNGKey(0))
    pat = [5, 9, 13, 21, 5, 9, 13, 21, 5, 9]
    prompt = jnp.asarray([list(range(30, 40)) + pat], jnp.int32)
    ref = generate(params, TINY, prompt, max_new_tokens=24,
                   sampling=SamplingParams(temperature=0.0))
    out = speculative_generate(
        params, TINY, prompt, max_new_tokens=24,
        draft_len=draft_len, ngram=ngram,
    )
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_speculative_matches_greedy_no_repetition():
    """A prompt with no repeated n-grams: drafts mostly miss, output must
    still be exact (pure-verification degenerates to normal decode)."""
    params = init_float_params(TINY, jax.random.PRNGKey(1))
    prompt = jnp.asarray([list(range(3, 23))], jnp.int32)
    ref = generate(params, TINY, prompt, max_new_tokens=12,
                   sampling=SamplingParams(temperature=0.0))
    out, stats = speculative_generate(
        params, TINY, prompt, max_new_tokens=12, return_stats=True,
    )
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
    assert int(stats["model_steps"]) <= 12


def test_speculative_accepts_on_repetitive_stream():
    """The greedy stream of this (model, prompt) loops; prompt lookup must
    exploit it: fewer model steps than emitted tokens."""
    params = init_float_params(TINY, jax.random.PRNGKey(0))
    pat = [5, 9, 13, 21, 5, 9, 13, 21, 5, 9]
    prompt = jnp.asarray([list(range(30, 40)) + pat], jnp.int32)
    out, stats = speculative_generate(
        params, TINY, prompt, max_new_tokens=24, return_stats=True,
    )
    assert int(stats["model_steps"]) < int(stats["emitted"])


def test_speculative_sliding_window_model():
    """Mistral-class config (sliding window binding at these lengths):
    the K+1-token chunk rides the windowed attention path exactly."""
    import dataclasses

    cfg = dataclasses.replace(TINY, sliding_window=9)
    params = init_float_params(cfg, jax.random.PRNGKey(2))
    pat = [5, 9, 13, 21, 5, 9, 13, 21]
    prompt = jnp.asarray([list(range(30, 40)) + pat], jnp.int32)
    # max_seq > window so the mask binds
    ref = generate(params, cfg, prompt, max_new_tokens=16,
                   sampling=SamplingParams(temperature=0.0))
    out = speculative_generate(params, cfg, prompt, max_new_tokens=16)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_speculative_eos_masking():
    """EOS handling matches generate(): tokens after the first EOS are
    masked to the EOS id."""
    params = init_float_params(TINY, jax.random.PRNGKey(0))
    prompt = jnp.asarray([list(range(3, 17))], jnp.int32)
    ref = generate(params, TINY, prompt, max_new_tokens=10,
                   sampling=SamplingParams(temperature=0.0))
    eos = int(np.asarray(ref)[0, prompt.shape[1] + 2])  # force an early hit
    ref_eos = generate(params, TINY, prompt, max_new_tokens=10,
                       sampling=SamplingParams(temperature=0.0),
                       eos_token_id=eos)
    out = speculative_generate(
        params, TINY, prompt, max_new_tokens=10, eos_token_id=eos,
    )
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref_eos))


def test_speculative_quantized_params():
    """W4A16 params (the deployment config) through the spec loop."""
    from quick_tpu.models import quantize_params

    params = quantize_params(
        init_float_params(TINY, jax.random.PRNGKey(0)), TINY, group_size=32
    )
    pat = [5, 9, 13, 21, 5, 9, 13, 21]
    prompt = jnp.asarray([list(range(30, 40)) + pat], jnp.int32)
    ref = generate(params, TINY, prompt, max_new_tokens=12,
                   sampling=SamplingParams(temperature=0.0))
    out = speculative_generate(params, TINY, prompt, max_new_tokens=12)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_verify_drafts_first_token_distribution():
    """Rejection verification is distribution-exact: the first emitted
    token's marginal equals the target distribution p_0 (accept draft
    w.p. p(d), else sample the renormalized residual)."""
    from quick_tpu.runtime.speculative import verify_drafts

    V, K, n = 12, 3, 30000
    rng = np.random.default_rng(0)
    probs = rng.dirichlet(np.ones(V), size=K + 1).astype(np.float32)
    probs_j = jnp.asarray(probs)
    drafts = jnp.asarray([3, 7, 1], jnp.int32)

    first = jax.jit(jax.vmap(
        lambda k: verify_drafts(probs_j, drafts, k)[0][0]
    ))(jax.random.split(jax.random.PRNGKey(1), n))
    emp = np.bincount(np.asarray(first), minlength=V) / n
    np.testing.assert_allclose(emp, probs[0], atol=0.02)


def test_verify_drafts_all_accept_bonus():
    """Target distributions that put ~all mass on the drafts accept all K
    and emit a bonus token from the last row."""
    from quick_tpu.runtime.speculative import verify_drafts

    V, K = 8, 3
    drafts = jnp.asarray([2, 5, 1], jnp.int32)
    probs = np.full((K + 1, V), 1e-9, np.float32)
    for i, d in enumerate([2, 5, 1]):
        probs[i, d] = 1.0
    probs[K, 6] = 1.0
    probs /= probs.sum(-1, keepdims=True)
    gvec, m = verify_drafts(
        jnp.asarray(probs), drafts, jax.random.PRNGKey(0)
    )
    assert int(m) == K
    assert np.asarray(gvec).tolist() == [2, 5, 1, 6]


def test_speculative_sampled_greedy_limit():
    """temperature -> 0 limit of the rejection path reproduces the greedy
    stream exactly (softmax saturates, accept prob of the argmax draft is
    1.0, the replacement is the residual argmax)."""
    params = init_float_params(TINY, jax.random.PRNGKey(0))
    pat = [5, 9, 13, 21, 5, 9, 13, 21, 5, 9]
    prompt = jnp.asarray([list(range(30, 40)) + pat], jnp.int32)
    ref = generate(params, TINY, prompt, max_new_tokens=16,
                   sampling=SamplingParams(temperature=0.0))
    out = speculative_generate(
        params, TINY, prompt, max_new_tokens=16,
        sampling=SamplingParams(temperature=1e-6),
    )
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_speculative_rejects_penalties():
    params = init_float_params(TINY, jax.random.PRNGKey(0))
    prompt = jnp.zeros((1, 8), jnp.int32)
    with pytest.raises(ValueError):
        speculative_generate(
            params, TINY, prompt, max_new_tokens=4,
            sampling=SamplingParams(temperature=1.0, repetition_penalty=1.3),
        )


def test_speculative_rejects_batch():
    params = init_float_params(TINY, jax.random.PRNGKey(0))
    prompt = jnp.zeros((2, 8), jnp.int32)
    with pytest.raises(ValueError):
        speculative_generate(params, TINY, prompt, max_new_tokens=4)


def test_speculative_rejects_short_max_seq():
    """max_seq without overshoot room would let the K+1-row cache write
    clamp and overwrite valid KV rows — must be rejected up front."""
    params = init_float_params(TINY, jax.random.PRNGKey(0))
    prompt = jnp.zeros((1, 8), jnp.int32)
    with pytest.raises(ValueError, match="overshoot"):
        speculative_generate(
            params, TINY, prompt, max_new_tokens=4, draft_len=4, max_seq=12
        )


def test_speculative_emitted_clamped_to_budget():
    """A full acceptance on the final iteration must not overstate
    emitted/tokens_per_step past max_new_tokens."""
    params = init_float_params(TINY, jax.random.PRNGKey(0))
    pat = [5, 9, 13, 21] * 4
    prompt = jnp.asarray([pat], jnp.int32)
    _, stats = speculative_generate(
        params, TINY, prompt, max_new_tokens=6, draft_len=4,
        return_stats=True,
    )
    assert int(stats["emitted"]) <= 6
