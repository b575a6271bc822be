"""Generation runtime: jitted prefill + decode loop with sampling.

Replaces the reference's HF ``GenerationMixin`` Python loop
(quick/awq/models/base.py:87-89): here the whole decode loop runs inside ONE
jit program via ``lax.scan`` (kernel-launch-free decoding — the TPU answer
to per-token Python dispatch overhead, which on this platform costs ~80ms
per call).
"""
from __future__ import annotations

import functools
import math
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from quick_tpu.config import ModelConfig
from quick_tpu.models.model import ModelParams, model_forward
from quick_tpu.modules.cache import KVCache


class SamplingParams(NamedTuple):
    temperature: float = 0.0  # 0 => greedy
    top_k: int = 0            # 0 => disabled
    top_p: float = 1.0
    min_p: float = 0.0        # keep tokens with prob >= min_p * max_prob
    # history-dependent penalties (vLLM/OpenAI semantics): repetition
    # multiplies seen-token logits (HF repetition_penalty — counts prompt
    # AND output), frequency subtracts count * penalty, presence subtracts
    # penalty once per distinct generated token (both over OUTPUT only)
    repetition_penalty: float = 1.0
    frequency_penalty: float = 0.0
    presence_penalty: float = 0.0

    @property
    def has_penalties(self) -> bool:
        return (
            self.repetition_penalty != 1.0
            or self.frequency_penalty != 0.0
            or self.presence_penalty != 0.0
        )


def apply_penalties(
    logits: jax.Array,       # [B, V] raw logits
    out_counts: jax.Array,   # [B, V] i32 generated-token counts
    prompt_seen: jax.Array,  # [B, V] bool-ish, token appeared in the prompt
    rep: jax.Array,          # [B] or scalar, 1.0 => off
    freq: jax.Array,         # [B] or scalar, 0.0 => off
    pres: jax.Array,         # [B] or scalar, 0.0 => off
) -> jax.Array:
    """vLLM-semantics penalty application (all shapes broadcast on B)."""
    rep = jnp.asarray(rep, jnp.float32).reshape(-1, 1)
    freq = jnp.asarray(freq, jnp.float32).reshape(-1, 1)
    pres = jnp.asarray(pres, jnp.float32).reshape(-1, 1)
    logits = logits.astype(jnp.float32)
    seen = (out_counts > 0) | (prompt_seen > 0)
    scaled = jnp.where(logits > 0, logits / rep, logits * rep)
    logits = jnp.where(seen, scaled, logits)
    logits = logits - out_counts.astype(jnp.float32) * freq
    logits = logits - (out_counts > 0).astype(jnp.float32) * pres
    return logits


def filter_logits(logits: jax.Array, params: SamplingParams) -> jax.Array:
    """Temperature/top-k/top-p/min-p-filtered logits (softmax of the
    result IS the sampling distribution). Batched over leading dims;
    requires params.temperature > 0."""
    logits = logits / params.temperature
    if params.top_k > 0:
        kth = jax.lax.top_k(logits, params.top_k)[0][..., -1:]
        logits = jnp.where(logits < kth, -1e9, logits)
    if params.top_p < 1.0:
        sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
        probs = jax.nn.softmax(sorted_logits, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        # keep tokens until cumulative prob exceeds top_p (always keep top-1)
        cutoff_idx = jnp.sum(cum < params.top_p, axis=-1, keepdims=True)
        cutoff = jnp.take_along_axis(sorted_logits, cutoff_idx, axis=-1)
        logits = jnp.where(logits < cutoff, -1e9, logits)
    if params.min_p > 0.0:
        # prob >= min_p * max_prob  <=>  logit >= max_logit + log(min_p)
        thresh = jnp.max(logits, axis=-1, keepdims=True) + math.log(
            params.min_p
        )
        logits = jnp.where(logits < thresh, -1e9, logits)
    return logits


def sample_token(
    logits: jax.Array,  # [B, V]
    params: SamplingParams,
    key: jax.Array,
) -> jax.Array:
    """Greedy / temperature / top-k / top-p / min-p sampling. Returns [B]
    int32. (History penalties need token counts — see decode_loop.)"""
    if params.temperature == 0.0:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    return jax.random.categorical(
        key, filter_logits(logits, params)
    ).astype(jnp.int32)


def sample_token_rows(
    logits: jax.Array,   # [B, V]
    temps: jax.Array,    # [B] f32; 0 => greedy for that row
    top_ks: jax.Array,   # [B] i32; 0 => disabled
    top_ps: jax.Array,   # [B] f32; 1.0 => disabled
    key: jax.Array,
    min_ps: Optional[jax.Array] = None,  # [B] f32; 0 => disabled
) -> jax.Array:
    """Per-ROW sampling for continuous batching: every slot carries its own
    (temperature, top_k, top_p) — vLLM-style heterogeneous sampling, which
    the reference's fixed-batch ``model.generate`` cannot express. Fully
    vectorized: one descending sort per row serves both the top-k threshold
    (k-th largest value) and the top-p threshold (value at the nucleus
    cutoff); rows mix greedy and sampled freely. When EVERY row is greedy
    the sort never executes (lax.cond fast path) — the serving engine's
    default stays argmax-only. Returns [B] int32."""
    greedy = jnp.argmax(logits, axis=-1).astype(jnp.int32)

    def _sampled(_):
        V = logits.shape[-1]
        t = jnp.where(temps > 0, temps, 1.0)[:, None]
        scaled = logits.astype(jnp.float32) / t
        sl = jnp.sort(scaled, axis=-1)[:, ::-1]  # descending
        k = jnp.clip(top_ks, 0, V)
        kth = jnp.take_along_axis(sl, jnp.maximum(k - 1, 0)[:, None], axis=-1)
        kth = jnp.where((k > 0)[:, None], kth, -jnp.inf)
        probs = jax.nn.softmax(sl, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        # smallest prefix whose mass reaches top_p (top-1 always kept)
        cut = jnp.sum(cum < top_ps[:, None], axis=-1, keepdims=True)
        pth = jnp.take_along_axis(sl, jnp.minimum(cut, V - 1), axis=-1)
        thresh = jnp.maximum(kth, pth)
        if min_ps is not None:
            # prob >= min_p * max_prob on the temperature-scaled dist
            mth = sl[:, :1] + jnp.log(
                jnp.where(min_ps > 0, min_ps, 1.0)[:, None]
            )
            mth = jnp.where((min_ps > 0)[:, None], mth, -jnp.inf)
            thresh = jnp.maximum(thresh, mth)
        masked = jnp.where(scaled < thresh, -1e9, scaled)
        drawn = jax.random.categorical(key, masked).astype(jnp.int32)
        return jnp.where(temps == 0, greedy, drawn)

    return jax.lax.cond(jnp.any(temps > 0), _sampled, lambda _: greedy, None)


def make_cache(cfg: ModelConfig, batch: int, max_seq: int, dtype=jnp.bfloat16) -> KVCache:
    if cfg.is_mla:
        # deepseek MLA: the cache holds only the compressed latent
        from quick_tpu.modules.mla import make_mla_cache

        return make_mla_cache(cfg, batch, max_seq, dtype)
    return KVCache.create(
        cfg.num_hidden_layers, batch, max_seq,
        cfg.num_key_value_heads, cfg.head_dim, dtype,
    )


@functools.partial(jax.jit, static_argnames=("cfg",))
def prefill(
    params: ModelParams, cfg: ModelConfig, tokens: jax.Array, cache: KVCache,
    inputs_embeds=None,
) -> Tuple[jax.Array, KVCache]:
    """Process the prompt; returns (last-position logits [B, V], cache).

    ``inputs_embeds`` overrides the embedding lookup (multimodal prompts,
    modules/vision.py)."""
    logits, cache = model_forward(
        params, cfg, tokens, cache, last_token_only=True,
        inputs_embeds=inputs_embeds,
    )
    return logits[:, -1], cache


@functools.partial(jax.jit, static_argnames=("cfg",))
def decode_step(
    params: ModelParams, cfg: ModelConfig, token: jax.Array, cache: KVCache
) -> Tuple[jax.Array, KVCache]:
    """One decode step: token [B] -> logits [B, V]."""
    logits, cache = model_forward(params, cfg, token[:, None], cache)
    return logits[:, -1], cache


@functools.partial(
    jax.jit, static_argnames=("cfg", "n_tokens", "sampling")
)
def decode_loop(
    params: ModelParams,
    cfg: ModelConfig,
    first_token: jax.Array,  # [B]
    cache: KVCache,
    n_tokens: int,
    sampling: SamplingParams = SamplingParams(),
    key: Optional[jax.Array] = None,
    prompt_seen: Optional[jax.Array] = None,  # [B, V] repetition-penalty mask
) -> Tuple[jax.Array, KVCache]:
    """Generate n_tokens autoregressively inside one XLA program.

    With history penalties active (sampling.has_penalties), a [B, V]
    generated-token count is carried through the scan (``first_token``
    counts as generated) and ``prompt_seen`` [B, V] marks prompt tokens
    for the repetition penalty.

    Returns (tokens [B, n_tokens], cache)."""
    if key is None:
        key = jax.random.PRNGKey(0)
    pen = sampling.has_penalties
    B = first_token.shape[0]
    if pen:
        counts0 = jnp.zeros((B, cfg.vocab_size), jnp.int32).at[
            jnp.arange(B), first_token
        ].add(1)
        if prompt_seen is None:
            prompt_seen = jnp.zeros((B, cfg.vocab_size), jnp.bool_)
    else:
        counts0 = jnp.zeros((B, 1), jnp.int32)  # untouched placeholder

    def step(carry, _):
        token, cache, key, counts = carry
        key, sub = jax.random.split(key)
        logits, cache = model_forward(params, cfg, token[:, None], cache)
        row = logits[:, -1]
        if pen:
            row = apply_penalties(
                row, counts, prompt_seen,
                sampling.repetition_penalty,
                sampling.frequency_penalty,
                sampling.presence_penalty,
            )
        nxt = sample_token(row, sampling, sub)
        if pen:
            counts = counts.at[jnp.arange(B), nxt].add(1)
        return (nxt, cache, key, counts), nxt

    (last, cache, _, _), toks = jax.lax.scan(
        step, (first_token, cache, key, counts0), length=n_tokens
    )
    return toks.T, cache  # [B, n_tokens]


def beam_generate(
    params: ModelParams,
    cfg: ModelConfig,
    prompt_tokens: jax.Array,  # [B, S]
    max_new_tokens: int,
    num_beams: int = 4,
    length_penalty: float = 1.0,
    eos_token_id: Optional[int] = None,
    max_seq: Optional[int] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Beam search decode (the HF ``generate(num_beams=...)`` analog the
    reference inherits via model.generate, quick/awq/models/base.py:87-89)
    — TPU-shaped: the whole search runs inside one ``lax.scan`` over a
    [B*num_beams]-row cache; beam reordering is a batch-axis gather of the
    cache pytree each step (static shapes, no host control flow).

    Returns (tokens [B, S + max_new_tokens], scores [B]) — the best beam
    per batch row by summed logprob / length**length_penalty. A beam that
    emits ``eos_token_id`` freezes: it keeps emitting EOS at zero cost and
    competes with its frozen score."""
    B, S = prompt_tokens.shape
    nb = num_beams
    V = cfg.vocab_size
    if max_seq is None:
        max_seq = S + max_new_tokens
    NEG = jnp.float32(-1e9)

    # tile prompts to [B*nb] rows; all beams share the prompt KV (recomputed
    # per row — one extra prefill per beam, simple and fully static)
    toks0 = jnp.repeat(prompt_tokens, nb, axis=0)
    cache = make_cache(cfg, B * nb, max_seq)
    logits, cache = prefill(params, cfg, toks0, cache)
    logp0 = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    # only beam 0 is live initially, so the first top-k picks nb DISTINCT
    # tokens from one distribution instead of nb copies of the argmax
    init_bias = jnp.where(
        jnp.arange(nb) == 0, 0.0, NEG
    )[None, :].repeat(B, 0).reshape(B * nb)

    @functools.partial(jax.jit, static_argnames=("n",))
    def search(params, cache, logp, scores, n):
        def step(carry, _):
            cache, logp, scores, hist, lens, t = carry
            # combine: [B, nb*V] cumulative candidate scores
            cand = (scores[:, None] + logp.reshape(B * nb, V).astype(
                jnp.float32
            )).reshape(B, nb * V)
            top, idx = jax.lax.top_k(cand, nb)          # [B, nb]
            beam = idx // V                             # source beam
            tok = (idx % V).astype(jnp.int32)
            src = (jnp.arange(B)[:, None] * nb + beam).reshape(-1)
            # reorder beam state: batch-axis gather over the cache pytree,
            # history, and lengths
            cache = jax.tree_util.tree_map(
                lambda a: a.take(src, axis=1)
                if a.ndim >= 2 and a.shape[1] == B * nb else a,
                cache,
            )
            hist = hist[src]
            lens = lens[src]
            scores = top.reshape(-1)
            tok = tok.reshape(-1)
            hist = jax.lax.dynamic_update_slice(
                hist, tok[:, None], (0, t)
            )
            logits, cache = model_forward(
                params, cfg, tok[:, None], cache
            )
            lp = jax.nn.log_softmax(
                logits[:, -1].astype(jnp.float32), axis=-1
            )
            if eos_token_id is not None:
                # frozen beams (emitted EOS) only extend with EOS at cost 0
                frozen = tok == eos_token_id
                eos_row = jnp.full((V,), NEG).at[eos_token_id].set(0.0)
                lp = jnp.where(frozen[:, None], eos_row[None, :], lp)
                lens = lens + (~frozen).astype(jnp.int32)
            else:
                lens = lens + 1
            return (cache, lp, scores, hist, lens, t + 1), None

        hist0 = jnp.zeros((B * nb, n), jnp.int32)
        lens0 = jnp.zeros((B * nb,), jnp.int32)
        carry = (cache, logp, scores, hist0, lens0, jnp.int32(0))
        (cache, logp, scores, hist, lens, _), _ = jax.lax.scan(
            step, carry, length=n
        )
        return scores, hist, lens

    scores, hist, lens = search(
        params, cache, logp0, init_bias, n=max_new_tokens
    )
    # rank by length-normalized score (HF length_penalty semantics)
    lens = jnp.maximum(lens, 1).astype(jnp.float32)
    ranked = scores / (lens ** jnp.float32(length_penalty))
    ranked = ranked.reshape(B, nb)
    best = jnp.argmax(ranked, axis=1)                    # [B]
    rows = jnp.arange(B) * nb + best
    out = jnp.concatenate([prompt_tokens, hist[rows]], axis=1)
    return out, scores.reshape(B, nb)[jnp.arange(B), best]


def generate(
    params: ModelParams,
    cfg: ModelConfig,
    prompt_tokens: jax.Array,  # [B, S]
    max_new_tokens: int,
    sampling: SamplingParams = SamplingParams(),
    max_seq: Optional[int] = None,
    key: Optional[jax.Array] = None,
    eos_token_id: Optional[int] = None,
    inputs_embeds: Optional[jax.Array] = None,
) -> jax.Array:
    """End-to-end generation (prefill + jitted decode loop).

    Returns [B, S + max_new_tokens] tokens (prompt included). EOS handling
    masks tokens after the first EOS with the EOS id (generation itself runs
    the full static length — XLA-friendly). ``inputs_embeds`` feeds a
    multimodal prompt (image features already spliced)."""
    B, S = prompt_tokens.shape
    if max_seq is None:
        max_seq = S + max_new_tokens
    cache = make_cache(cfg, B, max_seq)
    if key is None:
        key = jax.random.PRNGKey(0)
    logits, cache = prefill(
        params, cfg, prompt_tokens, cache, inputs_embeds=inputs_embeds
    )
    key, sub = jax.random.split(key)
    prompt_seen = None
    if sampling.has_penalties:
        prompt_seen = jnp.zeros(
            (B, cfg.vocab_size), jnp.bool_
        ).at[jnp.arange(B)[:, None], prompt_tokens].set(True)
        logits = apply_penalties(
            logits, jnp.zeros_like(prompt_seen, jnp.int32), prompt_seen,
            sampling.repetition_penalty, sampling.frequency_penalty,
            sampling.presence_penalty,
        )
    first = sample_token(logits, sampling, sub)
    rest, cache = decode_loop(
        params, cfg, first, cache, max_new_tokens - 1, sampling, key,
        prompt_seen=prompt_seen,
    )
    out = jnp.concatenate([prompt_tokens, first[:, None], rest], axis=1)
    if eos_token_id is not None:
        gen = out[:, S:]
        seen = jnp.cumsum((gen == eos_token_id).astype(jnp.int32), axis=1)
        hit = seen - (gen == eos_token_id).astype(jnp.int32) > 0
        gen = jnp.where(hit, eos_token_id, gen)
        out = jnp.concatenate([out[:, :S], gen], axis=1)
    return out
