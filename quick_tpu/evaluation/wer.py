"""Word error rate (WER) — LibriSpeech/Whisper harness utilities.

Analog of eval_librispeech (quick/awq/evaluation/eval_utils.py:63-113),
which transcribes LibriSpeech with a quantized Whisper and scores WER via
jiwer. This framework's model zoo is decoder-only, and the environment is
zero-egress, so the harness splits in two: a self-contained WER metric
(edit-distance over words, jiwer-compatible normalization hooks) usable on
any (reference, hypothesis) pairs, and a gated dataset/ASR driver.
"""
from __future__ import annotations

from typing import Callable, Dict, List, Optional, Sequence

import numpy as np


def _edit_distance(a: List[str], b: List[str]) -> int:
    """Levenshtein distance over token lists (two-row DP)."""
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, wa in enumerate(a, 1):
        cur = [i]
        for j, wb in enumerate(b, 1):
            cur.append(
                min(
                    prev[j] + 1,          # deletion
                    cur[j - 1] + 1,       # insertion
                    prev[j - 1] + (wa != wb),  # substitution
                )
            )
        prev = cur
    return prev[-1]


def default_normalize(text: str) -> List[str]:
    """Lowercase, strip punctuation, split on whitespace."""
    keep = [c.lower() if c.isalnum() or c.isspace() else " " for c in text]
    return "".join(keep).split()


def word_error_rate(
    references: Sequence[str],
    hypotheses: Sequence[str],
    normalize: Callable[[str], List[str]] = default_normalize,
) -> Dict[str, float]:
    """Corpus WER = total edit distance / total reference words."""
    if len(references) != len(hypotheses):
        raise ValueError("references and hypotheses must align")
    errors, words = 0, 0
    for ref, hyp in zip(references, hypotheses):
        r, h = normalize(ref), normalize(hyp)
        errors += _edit_distance(r, h)
        words += len(r)
    return {
        "wer": errors / max(words, 1),
        "errors": float(errors),
        "words": float(words),
    }


def eval_librispeech(
    transcribe_fn: Callable[[np.ndarray, int], str],
    dataset_rows: Optional[List[Dict]] = None,
    max_samples: Optional[int] = None,
    verbose: bool = False,
) -> Dict[str, float]:
    """Score an ASR callable on LibriSpeech rows
    ({"audio": {"array", "sampling_rate"}, "text": ...}).

    transcribe_fn(waveform, sampling_rate) -> text. Rows default to a local
    copy of librispeech_asr (zero-egress gate)."""
    if dataset_rows is None:
        try:
            from datasets import load_dataset

            ds = load_dataset(
                "librispeech_asr", "clean", split="test"
            )
            dataset_rows = list(ds)
        except Exception as e:  # pragma: no cover - environment dependent
            raise RuntimeError(
                f"librispeech_asr not available locally; pass rows ({e})"
            )
    if max_samples is not None:
        dataset_rows = dataset_rows[:max_samples]
    refs, hyps = [], []
    for i, row in enumerate(dataset_rows):
        refs.append(row["text"])
        hyps.append(
            transcribe_fn(
                row["audio"]["array"], row["audio"]["sampling_rate"]
            )
        )
        if verbose and (i + 1) % 50 == 0:
            print(f"[librispeech] {i + 1}/{len(dataset_rows)}")
    return word_error_rate(refs, hyps)
