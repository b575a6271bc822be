"""Perplexity evaluation (analog of quick/awq/evaluation/eval_utils.py:21-61).

The reference evaluates wikitext-2-raw with 2048-token windows and stacked
NLLs. Same protocol here, over any pre-tokenized stream (this environment is
zero-egress; pass tokens directly or via a local dataset path)."""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from quick_tpu.config import ModelConfig
from quick_tpu.models.model import ModelParams, model_forward


@functools.partial(jax.jit, static_argnames=("cfg",))
def _window_nll(
    params: ModelParams, cfg: ModelConfig, tokens: jax.Array,
    skip_rows: jax.Array = 0,  # leading rows already scored (tail overlap)
):
    """Sum of next-token NLLs and count for one [B, S] window chunk."""
    logits, _ = model_forward(params, cfg, tokens)
    logp = jax.nn.log_softmax(logits[:, :-1].astype(jnp.float32), axis=-1)
    tgt = tokens[:, 1:]
    nll = -jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
    live = (
        jnp.arange(nll.shape[0]) >= jnp.asarray(skip_rows)
    ).astype(nll.dtype)[:, None]
    return (nll * live).sum(), (live * jnp.ones_like(nll)).sum()


def evaluate_perplexity(
    params: ModelParams,
    cfg: ModelConfig,
    tokens: np.ndarray,            # flat token stream [N] or [B, S]
    seqlen: int = 2048,
    max_windows: Optional[int] = None,
    verbose: bool = False,
    batch: int = 1,                # windows scored per forward
) -> float:
    """exp(mean NLL) over non-overlapping seqlen windows
    (reference eval_utils.py:38-57 protocol). ``batch`` > 1 scores several
    windows per forward (same numbers, fewer dispatches)."""
    flat = np.asarray(tokens, np.int32).reshape(-1)
    n_win = len(flat) // seqlen
    if max_windows is not None:
        n_win = min(n_win, max_windows)
    if n_win == 0:
        raise ValueError(f"need at least {seqlen} tokens, got {len(flat)}")
    total, count = 0.0, 0
    for i in range(0, n_win, batch):
        nb = min(batch, n_win - i)
        lo = i
        if nb < batch and n_win >= batch:
            # keep ONE compiled [batch, seqlen] shape: slide the final
            # chunk back to cover the tail (a partial [nb, seqlen] chunk
            # costs a fresh 20-40s compile through the TPU tunnel for a
            # handful of windows); the overlapping windows' losses are
            # masked out below
            lo = n_win - batch
            nb = batch
        w = jnp.asarray(
            flat[lo * seqlen : (lo + nb) * seqlen].reshape(nb, seqlen)
        )
        s, c = _window_nll(params, cfg, w, skip_rows=max(i - lo, 0))
        total += float(s)
        count += int(c)
        if verbose:
            done = min(lo + nb, n_win)
            print(f"[ppl] window {done}/{n_win}: {np.exp(total / count):.4f}",
                  flush=True)
    return float(np.exp(total / count))
