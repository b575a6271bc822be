"""MMLU harness via length-normalized multiple-choice loglikelihood.

The reference shells out to lm_eval (quick/awq/evaluation/eval_utils.py:
115-155, vLLM backend when installed). This framework is zero-egress and
lm_eval-free, so the harness is native: each (question, choice) pair is
scored by the sum of next-token logprobs of the choice continuation given
the few-shot context, and the argmax choice is compared with the answer —
the same scoring rule lm_eval's `hendrycksTest` tasks use.

Tokenization is caller-provided (a callable str -> list[int]) so the harness
stays tokenizer-agnostic; rows are plain dicts so any local MMLU copy (or a
hand-built subset) plugs in.
"""
from __future__ import annotations

import functools
from typing import Callable, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from quick_tpu.config import ModelConfig
from quick_tpu.models.model import ModelParams, model_forward

CHOICE_LETTERS = ("A", "B", "C", "D")


def format_example(row: Dict, include_answer: bool = True) -> str:
    """hendrycksTest prompt format."""
    s = row["question"].strip()
    for letter, choice in zip(CHOICE_LETTERS, row["choices"]):
        s += f"\n{letter}. {choice}"
    s += "\nAnswer:"
    if include_answer:
        s += f" {CHOICE_LETTERS[int(row['answer'])]}\n\n"
    return s


def build_prompt(row: Dict, shots: Sequence[Dict] = (),
                 subject: Optional[str] = None) -> str:
    head = ""
    if subject:
        head = (
            "The following are multiple choice questions (with answers) "
            f"about {subject.replace('_', ' ')}.\n\n"
        )
    return head + "".join(format_example(s) for s in shots) + format_example(
        row, include_answer=False
    )


@functools.partial(jax.jit, static_argnames=("cfg",))
def _continuation_logprob(
    params: ModelParams,
    cfg: ModelConfig,
    tokens: jax.Array,       # [1, S_padded]
    cont_start: jax.Array,   # first continuation index
    total_len: jax.Array,    # true (unpadded) token count
) -> jax.Array:
    """Sum logprob of tokens[cont_start:total_len] given the prefix."""
    logits, _ = model_forward(params, cfg, tokens)
    logp = jax.nn.log_softmax(logits[0, :-1].astype(jnp.float32), axis=-1)
    tgt = tokens[0, 1:]
    per_tok = jnp.take_along_axis(logp, tgt[:, None], axis=-1)[:, 0]
    idx = jnp.arange(per_tok.shape[0])
    keep = jnp.logical_and(idx >= cont_start - 1, idx < total_len - 1)
    return jnp.where(keep, per_tok, 0.0).sum()


def _bucket(n: int, quantum: int = 64) -> int:
    return -(-n // quantum) * quantum


def score_choices(
    params: ModelParams,
    cfg: ModelConfig,
    tokenize: Callable[[str], List[int]],
    prompt: str,
    choices: Sequence[str],
    max_len: int = 2048,
) -> np.ndarray:
    """Loglikelihood of each choice continuation given the prompt.

    Token arrays are right-padded to 64-token buckets so the jitted scorer
    compiles once per bucket, not once per (prompt, choice) length — the
    20-40s-per-shape compile cost on the TPU tunnel makes raw shapes
    unusable (see CLAUDE.md)."""
    scores = []
    ptoks = tokenize(prompt)
    for choice in choices:
        cont = tokenize(" " + choice.strip())
        full = (ptoks + cont)[-max_len:]
        cont_start = len(full) - len(cont)
        padded = full + [0] * (_bucket(len(full)) - len(full))
        toks = jnp.asarray([padded], jnp.int32)
        lp = float(
            _continuation_logprob(
                params, cfg, toks,
                jnp.asarray(max(cont_start, 1)),
                jnp.asarray(len(full)),
            )
        )
        # length-normalize (mean per-token logprob): summed logprobs over
        # variable-length choice texts systematically favor SHORT choices
        # (lm_eval's acc_norm / byte-normalized convention)
        scores.append(lp / max(len(full) - max(cont_start, 1), 1))
    return np.asarray(scores)


def eval_mmlu(
    params: ModelParams,
    cfg: ModelConfig,
    tokenize: Callable[[str], List[int]],
    rows: List[Dict],
    n_shot: int = 0,
    dev_rows: Optional[List[Dict]] = None,
    subject: Optional[str] = None,
    verbose: bool = False,
) -> Dict[str, float]:
    """Accuracy over rows = [{question, choices: [4], answer: 0..3}, ...].

    (Reference eval_mmlu, eval_utils.py:115-155 — same task, native scorer.)
    """
    shots = (dev_rows or [])[:n_shot]
    correct = 0
    for i, row in enumerate(rows):
        prompt = build_prompt(row, shots, subject)
        scores = score_choices(
            params, cfg, tokenize, prompt, row["choices"]
        )
        if int(scores.argmax()) == int(row["answer"]):
            correct += 1
        if verbose and (i + 1) % 25 == 0:
            print(f"[mmlu] {i + 1}/{len(rows)} acc={correct / (i + 1):.4f}")
    return {"accuracy": correct / max(len(rows), 1), "n": len(rows)}


def load_mmlu_rows(subject: str, split: str = "test") -> List[Dict]:
    """Load a local copy of cais/mmlu (zero-egress gate)."""
    try:
        from datasets import load_dataset

        ds = load_dataset("cais/mmlu", subject, split=split)
        return [dict(r) for r in ds]
    except Exception as e:  # pragma: no cover - environment dependent
        raise RuntimeError(
            f"cais/mmlu not available locally; pass `rows` explicitly ({e})"
        )
