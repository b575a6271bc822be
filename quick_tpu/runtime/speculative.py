"""Prompt-lookup (n-gram) speculative decoding — greedy, token-exact.

Beyond the reference's fixed-batch HF generate loop
(quick/awq/models/base.py:87-89): single-stream decode on TPU is
weight-bandwidth-bound, so a forward over K+1 tokens costs nearly the same
HBM time as one token — verifying K drafted tokens per step is almost
free, and every accepted draft is a decode step that never pays the
weight stream. Drafts come from the sequence itself (vLLM-style
"prompt lookup"): the most recent earlier occurrence of the trailing
n-gram proposes its continuation, which is strong on the repetitive
segments (code, quotes, structured output) where greedy decoding spends
most of its tokens.

TPU-shaped: the whole accept/propose loop runs inside ONE jitted
``lax.while_loop`` — no host round-trips (80 ms/dispatch through the
tunnel), static shapes throughout (the token buffer is padded to
S + max_new + K and stale tail slots are overwritten as acceptance
advances). Greedy acceptance makes the output token-exact vs
``generate(temperature=0)``: an emitted token is always the argmax under
a verified-correct context, by induction over the accepted prefix.
(Token-exact up to kernel-path numerics: the K+1-token verify forward
runs the chunk/flash attention kernels while generate()'s S=1 step runs
the fused decode kernel, so a near-tie argmax can in principle diverge
between the two paths; outputs are bit-identical when the paths match,
as in the CPU tests.)

Scope: B=1, dense KVCache (the cache's shared scalar length IS the
rollback mechanism: after a chunk forward writes K+1 rows,
``with_length`` rewinds past the rejected tail and the next chunk
overwrites it). Greedy verification is bit-exact vs generate();
temperature > 0 uses exact rejection verification (``verify_drafts``) so
samples are distributed exactly as sequential sampling — the point-mass
draft distribution makes the Leviathan accept rule collapse to
``accept d w.p. p(d)`` with the residual = p minus d's mass.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from quick_tpu.config import ModelConfig
from quick_tpu.models.model import ModelParams, model_forward
from quick_tpu.runtime.generate import (
    SamplingParams,
    filter_logits,
    make_cache,
    prefill,
    sample_token,
)


def ngram_propose(
    row: jax.Array,   # [L] int32 token buffer (valid through index p0)
    p0: jax.Array,    # scalar int32: index of the last valid token
    ngram: int,
    draft_len: int,
) -> jax.Array:
    """Propose ``draft_len`` tokens continuing ``row[:p0+1]``: find the
    most recent j < p0-(ngram-1) with row[j:j+ngram] == row[p0-ngram+1:p0+1]
    and return the tokens following it. Falls back to repeating the last
    token when no earlier occurrence exists (the drafts then simply fail
    verification — correctness never depends on draft quality)."""
    L = row.shape[0]
    N, K = ngram, draft_len
    lastn = jax.lax.dynamic_slice(row, (jnp.maximum(p0 - (N - 1), 0),), (N,))
    match = jnp.ones((L - N + 1,), jnp.bool_)
    for i in range(N):
        match = jnp.logical_and(match, row[i : L - N + 1 + i] == lastn[i])
    idx = jnp.arange(L - N + 1, dtype=jnp.int32)
    # strictly-earlier windows only (the trailing window always matches
    # itself); continuations starting past p0 read unwritten slots, which
    # is safe (they get rejected) but pointless to prefer
    cand = jnp.where(jnp.logical_and(match, idx < p0 - (N - 1)), idx, -1)
    j = jnp.max(cand)
    start = jnp.clip(j + N, 0, L - K)
    drafts = jax.lax.dynamic_slice(row, (start,), (K,))
    return jnp.where(j >= 0, drafts, jnp.full((K,), row[p0]))


def verify_drafts(
    probs: jax.Array,   # [K+1, V] target distributions: row i is the
    # sampling distribution after consuming drafts[:i]
    drafts: jax.Array,  # [K] int32 proposed tokens
    key: jax.Array,
):
    """Exact rejection verification of POINT-MASS drafts (the
    prompt-lookup proposer is deterministic, so q = delta(d) and the
    Leviathan accept rule min(1, p/q) reduces to: accept draft d with
    probability p(d); on the first rejection, sample the replacement from
    p with d's mass removed and renormalized — the residual norm(p - q)+.
    The emitted sequence is distributed EXACTLY as sequential sampling
    from p (tests/test_speculative.py's statistical test). All K accepted
    => one bonus token from the last row. Returns (gvec [K+1] — valid
    through index m —, m accepted drafts)."""
    K = drafts.shape[0]
    keys = jax.random.split(key, K + 1)
    u = jax.vmap(jax.random.uniform)(keys[:K])
    pd = probs[jnp.arange(K), drafts]
    acc = u < pd
    m = jnp.sum(jnp.cumprod(acc.astype(jnp.int32)))  # accepted prefix
    pm = probs[m]                   # dist at the first unverified slot
    drop = drafts[jnp.minimum(m, K - 1)]
    resid = pm.at[drop].set(0.0)
    dist = jnp.where(m < K, resid, pm)  # m == K: bonus, no residual
    dist = dist / jnp.maximum(jnp.sum(dist), 1e-30)
    r = jax.random.categorical(
        keys[K], jnp.log(jnp.maximum(dist, 1e-30))
    ).astype(jnp.int32)
    gvec = jnp.concatenate([drafts, jnp.zeros((1,), jnp.int32)])
    return gvec.at[m].set(r), m


@functools.partial(
    jax.jit,
    static_argnames=(
        "cfg", "max_new_tokens", "draft_len", "ngram", "max_seq", "sampling",
    ),
)
def _spec_loop(
    params: ModelParams,
    cfg: ModelConfig,
    prompt_tokens: jax.Array,  # [1, S]
    max_new_tokens: int,
    draft_len: int,
    ngram: int,
    max_seq: int,
    sampling: SamplingParams = SamplingParams(),
    key: Optional[jax.Array] = None,
):
    S = prompt_tokens.shape[1]
    K = draft_len
    greedy = sampling.temperature == 0.0
    L = S + max_new_tokens + K + 1  # overshoot room: a full acceptance at
    # the last needed token still has somewhere to write
    if key is None:
        key = jax.random.PRNGKey(0)
    cache = make_cache(cfg, 1, max_seq)
    logits, cache = prefill(params, cfg, prompt_tokens, cache)
    key, sub = jax.random.split(key)
    first = sample_token(logits, sampling, sub)[0]

    buf = jnp.zeros((L,), jnp.int32)
    buf = jax.lax.dynamic_update_slice(buf, prompt_tokens[0], (0,))
    buf = buf.at[S].set(first)

    def cond(state):
        _, cnt, _, iters, _ = state
        # one emitted token per iteration is guaranteed (the chunk's first
        # output is always a valid next token), so max_new iterations
        # suffice; the explicit iteration bound is belt-and-braces for XLA
        return jnp.logical_and(cnt < max_new_tokens, iters < max_new_tokens)

    def body(state):
        buf, cnt, cache, iters, key = state
        p0 = S + cnt - 1                       # position of the last token
        t0 = buf[p0]
        drafts = ngram_propose(buf, p0, ngram, K)
        chunk = jnp.concatenate([t0[None], drafts])[None, :]  # [1, K+1]
        # cache.length == p0 here: the forward writes rows p0..p0+K and
        # advances length by K+1; acceptance rewinds it below
        logits, cache = model_forward(params, cfg, chunk, cache)
        if greedy:
            g = jnp.argmax(logits[0], axis=-1).astype(jnp.int32)  # [K+1]
            ok = drafts == g[:K]               # draft i verified by g[i-1]
            m = jnp.sum(jnp.cumprod(ok.astype(jnp.int32)))
        else:
            key, sub = jax.random.split(key)
            probs = jax.nn.softmax(
                filter_logits(logits[0].astype(jnp.float32), sampling),
                axis=-1,
            )
            g, m = verify_drafts(probs, drafts, sub)
        # emit g[0..m] (m+1 tokens — verified drafts + the replacement/
        # bonus); write the whole candidate row — slots past the accepted
        # prefix are stale and get overwritten by later iterations
        buf = jax.lax.dynamic_update_slice(buf, g, (p0 + 1,))
        cache = cache.with_length(p0 + m + 1)  # rewind rejected KV rows
        # clamp to the budget: a full acceptance on the final iteration
        # would otherwise overshoot and overstate emitted/tokens_per_step
        cnt = jnp.minimum(cnt + m + 1, max_new_tokens)
        return buf, cnt, cache, iters + 1, key

    buf, cnt, _, iters, _ = jax.lax.while_loop(
        cond, body, (buf, jnp.int32(1), cache, jnp.int32(0), key)
    )
    return buf[: S + max_new_tokens], cnt, iters


def speculative_generate(
    params: ModelParams,
    cfg: ModelConfig,
    prompt_tokens: jax.Array,  # [1, S] (B=1 only)
    max_new_tokens: int,
    draft_len: int = 4,
    ngram: int = 3,
    max_seq: Optional[int] = None,
    eos_token_id: Optional[int] = None,
    sampling: SamplingParams = SamplingParams(),
    key: Optional[jax.Array] = None,
    return_stats: bool = False,
):
    """Generation with prompt-lookup speculation. Greedy (temperature 0,
    the default) is token-exact vs
    ``generate(..., sampling=SamplingParams(temperature=0.0))`` up to
    kernel-path numerics (bit-identical when the verify forward and the
    plain decode step take the same kernel path — see module docstring);
    temperature > 0 uses exact rejection verification (``verify_drafts``)
    so the output is distributed exactly as sequential sampling from the
    filtered distribution. Returns [1, S + max_new_tokens] tokens; with
    ``return_stats`` also a dict with the model-step count (steps <
    max_new_tokens means speculation paid)."""
    B, S = prompt_tokens.shape
    if B != 1:
        raise ValueError("speculative_generate is single-stream (B=1)")
    if ngram < 1 or draft_len < 1:
        raise ValueError("ngram and draft_len must be >= 1")
    if sampling.has_penalties:
        raise ValueError(
            "history penalties are not supported under speculation "
            "(use generate())"
        )
    need = S + max_new_tokens + draft_len + 1
    if max_seq is None:
        max_seq = need
    elif max_seq < need:
        # the loop always needs overshoot room for a full-acceptance
        # chunk; a shorter cache would make the K+1-row write clamp its
        # start index and silently overwrite valid KV rows
        raise ValueError(
            f"max_seq={max_seq} < S + max_new_tokens + draft_len + 1 "
            f"= {need}; speculation needs overshoot room"
        )
    buf, cnt, iters = _spec_loop(
        params, cfg, prompt_tokens, max_new_tokens, draft_len, ngram,
        max_seq, sampling, key,
    )
    out = buf[None, :]
    if eos_token_id is not None:
        gen = out[:, S:]
        seen = jnp.cumsum((gen == eos_token_id).astype(jnp.int32), axis=1)
        hit = seen - (gen == eos_token_id).astype(jnp.int32) > 0
        gen = jnp.where(hit, eos_token_id, gen)
        out = jnp.concatenate([out[:, :S], gen], axis=1)
    if return_stats:
        return out, {
            "model_steps": iters,
            "emitted": cnt,
            "tokens_per_step": cnt / jnp.maximum(iters, 1),
        }
    return out
