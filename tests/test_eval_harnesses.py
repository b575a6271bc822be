"""HumanEval sandbox / pass@k, MMLU scorer, and WER metric tests."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quick_tpu import ModelConfig
from quick_tpu.evaluation.humaneval import (
    check_correctness,
    estimate_pass_at_k,
    eval_humaneval,
)
from quick_tpu.evaluation.mmlu import build_prompt, eval_mmlu, score_choices
from quick_tpu.evaluation.wer import word_error_rate
from quick_tpu.models import init_float_params

TINY = ModelConfig(
    vocab_size=256, hidden_size=64, intermediate_size=128,
    num_hidden_layers=1, num_attention_heads=2, num_key_value_heads=2,
    max_position_embeddings=128,
)

PROBLEM = {
    "task_id": "demo/0",
    "prompt": "def add(a, b):\n",
    "test": (
        "def check(candidate):\n"
        "    assert candidate(1, 2) == 3\n"
        "    assert candidate(-1, 1) == 0\n"
    ),
    "entry_point": "add",
}


# ---------------------------------------------------------------------------
# HumanEval
# ---------------------------------------------------------------------------

def test_check_correctness_pass():
    r = check_correctness(
        PROBLEM["prompt"], "    return a + b\n", PROBLEM["test"], "add"
    )
    assert r["passed"], r


def test_check_correctness_fail():
    r = check_correctness(
        PROBLEM["prompt"], "    return a - b\n", PROBLEM["test"], "add"
    )
    assert not r["passed"]
    assert "failed" in r["result"]


def test_check_correctness_timeout():
    r = check_correctness(
        PROBLEM["prompt"],
        "    while True: pass\n",
        PROBLEM["test"],
        "add",
        timeout=2.0,
    )
    assert not r["passed"]
    assert "timed out" in r["result"]


def test_check_correctness_isolated():
    """Candidate crash (even interpreter-level) must not kill the harness."""
    r = check_correctness(
        PROBLEM["prompt"],
        "    import sys; sys.stderr.close(); raise SystemExit(1)\n",
        PROBLEM["test"],
        "add",
    )
    assert not r["passed"]


def test_pass_at_k_values():
    # n=5, c=2, k=1 -> 2/5
    np.testing.assert_allclose(estimate_pass_at_k(5, [2], 1), [0.4])
    # c=0 -> 0 ; c=n -> 1
    np.testing.assert_allclose(estimate_pass_at_k(5, [0], 3), [0.0])
    np.testing.assert_allclose(estimate_pass_at_k(5, [5], 3), [1.0])
    # n=4, c=2, k=2: 1 - C(2,2)/C(4,2) = 1 - 1/6
    np.testing.assert_allclose(
        estimate_pass_at_k(4, [2], 2), [1 - 1 / 6], rtol=1e-12
    )


def test_eval_humaneval_end_to_end():
    completions = {
        0: ["    return a + b\n", "    return a - b\n"],
    }
    counter = iter([0])

    def gen(prompt):
        return completions[next(counter)]

    scores = eval_humaneval(gen, [PROBLEM], ks=(1, 2))
    np.testing.assert_allclose(scores["pass@1"], 0.5)
    np.testing.assert_allclose(scores["pass@2"], 1.0)


# ---------------------------------------------------------------------------
# MMLU
# ---------------------------------------------------------------------------

ROW = {
    "question": "What is 2 + 2?",
    "choices": ["3", "4", "5", "22"],
    "answer": 1,
}


def _byte_tokenize(s):
    return [b % 256 for b in s.encode()]


def test_build_prompt_format():
    p = build_prompt(ROW, subject="elementary_mathematics")
    assert "A. 3" in p and "D. 22" in p
    assert p.endswith("Answer:")
    assert "elementary mathematics" in p


def test_score_choices_shapes():
    params = init_float_params(TINY, jax.random.PRNGKey(0))
    s = score_choices(
        params, TINY, _byte_tokenize, "Q: pick.\nAnswer:", ["aa", "bb", "c"]
    )
    assert s.shape == (3,)
    assert np.isfinite(s).all()
    # loglikelihoods must be negative sums
    assert (s < 0).all()


def test_eval_mmlu_runs():
    params = init_float_params(TINY, jax.random.PRNGKey(0))
    out = eval_mmlu(params, TINY, _byte_tokenize, [ROW, ROW])
    assert out["n"] == 2
    assert 0.0 <= out["accuracy"] <= 1.0


def test_mmlu_prefers_forced_choice():
    """A rigged scorer sanity check: identical prompt+choice tokens except one
    choice equal to the prompt tail should score higher under a model with a
    strong repetition bias — here we just check determinism/ordering is
    stable across calls."""
    params = init_float_params(TINY, jax.random.PRNGKey(0))
    s1 = score_choices(params, TINY, _byte_tokenize, "xy", ["a", "b"])
    s2 = score_choices(params, TINY, _byte_tokenize, "xy", ["a", "b"])
    np.testing.assert_allclose(s1, s2, rtol=1e-6)


# ---------------------------------------------------------------------------
# WER
# ---------------------------------------------------------------------------

def test_wer_exact_match():
    out = word_error_rate(["hello world"], ["Hello, world!"])
    assert out["wer"] == 0.0


def test_wer_substitution_insertion_deletion():
    # ref 4 words; hyp: 1 sub + 1 del => 2/4
    out = word_error_rate(["the cat sat down"], ["the dog sat"])
    np.testing.assert_allclose(out["wer"], 0.5)


def test_wer_corpus_pooling():
    out = word_error_rate(
        ["a b", "c d e"],            # 5 ref words
        ["a b", "c x e"],            # 1 error
    )
    np.testing.assert_allclose(out["wer"], 0.2)
