"""Sampling math: min_p + history penalties (runtime/generate.py).

The reference delegates sampling to HF generate (quick/awq/models/base.py);
these are the TPU build's in-program equivalents of the HF/vLLM sampling
knobs, validated against straight-line numpy references.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from quick_tpu import ModelConfig
from quick_tpu.models import init_float_params
from quick_tpu.runtime import SamplingParams, generate
from quick_tpu.runtime.generate import (
    apply_penalties,
    sample_token,
    sample_token_rows,
)

TINY = ModelConfig(
    vocab_size=256, hidden_size=128, intermediate_size=256,
    num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
    max_position_embeddings=128,
)


@pytest.fixture(scope="module")
def float_params():
    return init_float_params(TINY, jax.random.PRNGKey(0))


def test_apply_penalties_matches_numpy(rng):
    B, V = 5, 64
    logits = rng.standard_normal((B, V)).astype(np.float32) * 3
    counts = rng.integers(0, 4, (B, V)).astype(np.int32)
    pseen = (rng.random((B, V)) < 0.2).astype(np.int8)
    rep = np.asarray([1.0, 1.3, 2.0, 0.9, 1.0], np.float32)
    freq = np.asarray([0.0, 0.5, 0.0, 1.2, 0.0], np.float32)
    pres = np.asarray([0.0, 0.0, 0.7, 0.3, 0.0], np.float32)

    got = np.asarray(apply_penalties(
        jnp.asarray(logits), jnp.asarray(counts), jnp.asarray(pseen),
        jnp.asarray(rep), jnp.asarray(freq), jnp.asarray(pres),
    ))

    ref = logits.copy()
    seen = (counts > 0) | (pseen > 0)
    scaled = np.where(ref > 0, ref / rep[:, None], ref * rep[:, None])
    ref = np.where(seen, scaled, ref)
    ref = ref - counts * freq[:, None]
    ref = ref - (counts > 0) * pres[:, None]
    np.testing.assert_allclose(got, ref, rtol=1e-6)


def test_min_p_collapses_to_greedy(rng):
    """min_p -> 1 keeps only the argmax token, so even at high temperature
    sampling must return greedy, in both the scalar and the per-row API."""
    logits = jnp.asarray(rng.standard_normal((4, 128)) * 2, jnp.float32)
    key = jax.random.PRNGKey(1)
    greedy = np.asarray(jnp.argmax(logits, -1))
    got = np.asarray(sample_token(
        logits, SamplingParams(temperature=3.0, min_p=0.999), key
    ))
    np.testing.assert_array_equal(got, greedy)

    B = logits.shape[0]
    got_rows = np.asarray(sample_token_rows(
        logits,
        jnp.full((B,), 3.0), jnp.zeros((B,), jnp.int32), jnp.ones((B,)),
        key, min_ps=jnp.full((B,), 0.999),
    ))
    np.testing.assert_array_equal(got_rows, greedy)


def test_min_p_rows_mix(rng):
    """min_p rows coexist with unconstrained rows: the constrained row is
    pinned to greedy while a min_p=0 row still samples from the full
    distribution (statistically: 64 draws of a flat 128-way dist are not
    all identical)."""
    # row 0 needs a PEAKED distribution (min_p filters relative to the max
    # prob — it keeps everything on a flat one)
    logits = jnp.asarray(rng.standard_normal((2, 128)) * 4, jnp.float32)
    greedy = np.asarray(jnp.argmax(logits, -1))
    draws = []
    for i in range(64):
        got = np.asarray(sample_token_rows(
            logits, jnp.full((2,), 2.0), jnp.zeros((2,), jnp.int32),
            jnp.ones((2,)), jax.random.PRNGKey(i),
            min_ps=jnp.asarray([0.999, 0.0]),
        ))
        assert got[0] == greedy[0]
        draws.append(int(got[1]))
    assert len(set(draws)) > 1


def test_frequency_penalty_forces_distinct(float_params):
    """A huge frequency penalty under (penalized) greedy decoding makes
    every generated token distinct — each sampled token's logit is pushed
    to -inf for the rest of the generation."""
    prompt = jnp.asarray([[3, 4, 5, 6]], jnp.int32)
    out = generate(
        float_params, TINY, prompt, max_new_tokens=24,
        sampling=SamplingParams(temperature=0.0, frequency_penalty=1e4),
    )
    gen = list(np.asarray(out)[0, 4:])
    assert len(set(gen)) == len(gen)


def test_presence_penalty_forces_distinct(float_params):
    prompt = jnp.asarray([[3, 4, 5, 6]], jnp.int32)
    out = generate(
        float_params, TINY, prompt, max_new_tokens=24,
        sampling=SamplingParams(temperature=0.0, presence_penalty=1e4),
    )
    gen = list(np.asarray(out)[0, 4:])
    assert len(set(gen)) == len(gen)


def test_repetition_penalty_changes_greedy(float_params):
    """Unpenalized greedy on a tiny random model repeats quickly; a strong
    repetition penalty must produce a different (and less repetitive)
    continuation, and penalty=1.0 must be a no-op."""
    prompt = jnp.asarray([[7, 8, 9]], jnp.int32)
    base = list(np.asarray(generate(
        float_params, TINY, prompt, max_new_tokens=60,
        sampling=SamplingParams(temperature=0.0),
    ))[0, 3:])
    noop = list(np.asarray(generate(
        float_params, TINY, prompt, max_new_tokens=60,
        sampling=SamplingParams(temperature=0.0, repetition_penalty=1.0),
    ))[0, 3:])
    assert noop == base
    pen = list(np.asarray(generate(
        float_params, TINY, prompt, max_new_tokens=60,
        sampling=SamplingParams(temperature=0.0, repetition_penalty=50.0),
    ))[0, 3:])
    # the greedy walk of this tiny model first re-emits a seen token at
    # some index i: the penalty must leave tokens [0:i) untouched (none
    # were repeats) and divert exactly at i
    i = next(
        j for j, t in enumerate(base) if t in {7, 8, 9} or t in base[:j]
    )
    assert pen[:i] == base[:i]
    assert pen[i] != base[i]
    assert len(set(pen)) > len(set(base))


# ---------------------------------------------------------------------------
# beam search
# ---------------------------------------------------------------------------

def test_beam1_equals_greedy(float_params):
    from quick_tpu.runtime import beam_generate

    prompt = jnp.asarray([[3, 4, 5, 6], [9, 8, 7, 6]], jnp.int32)
    ref = generate(float_params, TINY, prompt, max_new_tokens=8)
    out, _ = beam_generate(float_params, TINY, prompt, max_new_tokens=8,
                           num_beams=1)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_beam_score_consistency_and_improvement(float_params):
    """The returned score must equal the teacher-forced logprob of the
    returned continuation, and beam-4 must find a path at least as good
    as greedy on this (deterministic) model."""
    from quick_tpu.models.model import model_forward
    from quick_tpu.runtime import beam_generate, make_cache

    prompt = jnp.asarray([[7, 8, 9]], jnp.int32)
    T = 6

    def forced_score(seq):  # summed log-prob of seq continuation
        cache = make_cache(TINY, 1, 32, dtype=jnp.float32)
        logits, cache = model_forward(float_params, TINY, prompt, cache)
        total, row = 0.0, logits[0, -1]
        for t in seq:
            lsm = jax.nn.log_softmax(row.astype(jnp.float32))
            total += float(lsm[int(t)])
            logits, cache = model_forward(
                float_params, TINY, jnp.asarray([[int(t)]], jnp.int32), cache
            )
            row = logits[0, -1]
        return total

    out4, sc4 = beam_generate(float_params, TINY, prompt, max_new_tokens=T,
                              num_beams=4)
    seq4 = list(np.asarray(out4)[0, 3:])
    assert abs(forced_score(seq4) - float(sc4[0])) < 5e-3
    greedy = list(np.asarray(
        generate(float_params, TINY, prompt, max_new_tokens=T)
    )[0, 3:])
    assert forced_score(seq4) >= forced_score(greedy) - 1e-4


def test_beam_eos_freeze(float_params):
    """A beam that emits EOS keeps emitting EOS at zero cost: force EOS
    to be the unconditional argmax by... instead verify structurally —
    wherever EOS appears in the winning beam, everything after is EOS."""
    from quick_tpu.runtime import beam_generate

    prompt = jnp.asarray([[5, 6, 7]], jnp.int32)
    # greedy first token as the "eos": the top beam hits it immediately
    first = int(np.asarray(
        generate(float_params, TINY, prompt, max_new_tokens=1)
    )[0, 3])
    out, _ = beam_generate(float_params, TINY, prompt, max_new_tokens=6,
                           num_beams=3, eos_token_id=first)
    gen = list(np.asarray(out)[0, 3:])
    if first in gen:
        i = gen.index(first)
        assert all(t == first for t in gen[i:])
