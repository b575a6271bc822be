"""Attention ops: prefill (causal, GQA-aware) and single-step decode.

Replaces the reference's two attention paths — torch sdpa for prefill
(quick/awq/modules/fused/attn.py:197-209) and FasterTransformer's
``single_query_attention`` for decode (attn.py:211-230). Both are expressed
so XLA maps them onto the MXU with GQA handled by head-group reshapes
instead of the reference's ``repeat_interleave`` materialization
(attn.py:194-195).
"""
from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp

NEG_INF = -1e9


def _use_flash(S: int, T: int, D: int) -> bool:
    """Dispatch to the Pallas flash kernel when the score matrix is big
    enough to matter and shapes are TPU-tileable. QUICK_TPU_FLASH=0 forces
    the einsum path; =1 forces flash (used by equivalence tests)."""
    env = os.environ.get("QUICK_TPU_FLASH", "")
    if env == "0":
        return False
    if env == "1":
        return True
    if jax.default_backend() == "cpu":
        return False
    return S >= 64 and T >= 128 and D % 8 == 0


def _group_query(q: jax.Array, n_kv: int) -> jax.Array:
    """[B, S, Hq, D] -> [B, S, n_kv, Hq//n_kv, D]."""
    B, S, Hq, D = q.shape
    return q.reshape(B, S, n_kv, Hq // n_kv, D)


def causal_attention(
    q: jax.Array,  # [B, S, Hq, D]
    k: jax.Array,  # [B, T, Hkv, D] — or [B, Hkv, T, D] if kv_heads_major
    v: jax.Array,  # same layout as k
    q_offset: jax.Array | int = 0,  # absolute position of q[0] within kv
    kv_len: Optional[jax.Array] = None,  # valid kv prefix length [B] or scalar
    scale: Optional[float] = None,
    alibi_slopes: Optional[jax.Array] = None,  # [Hq] per-head slopes
    kv_heads_major: bool = False,
    window: Optional[int] = None,  # sliding-window width (mistral/gemma2);
    # key t visible to query s iff s - window < t <= s
    logit_softcap: Optional[float] = None,  # gemma2: cap*tanh(scores/cap)
) -> jax.Array:
    """Causal GQA attention, f32 softmax. Returns [B, S, Hq, D].

    Works for prefill (S == T, q_offset = 0), chunked prefill and decode
    (S == 1, kv from cache). ``kv_heads_major=True`` consumes K/V in the
    dense cache's native [B, Hkv, T, D] layout — the attention dot's batch
    dims are (batch, head), so this avoids re-transposing the whole cache
    every decode step (see modules/cache.py docstring).
    """
    B, S, Hq, D = q.shape
    T = k.shape[2] if kv_heads_major else k.shape[1]
    n_kv = k.shape[1] if kv_heads_major else k.shape[2]
    if scale is None:
        scale = D ** -0.5
    if _use_flash(S, T, D):
        from quick_tpu.ops.flash_attention import flash_attention

        return flash_attention(
            q, k, v, q_offset=q_offset, kv_len=kv_len, scale=scale,
            alibi_slopes=alibi_slopes, kv_heads_major=kv_heads_major,
            window=window, logit_softcap=logit_softcap,
            interpret=jax.default_backend() == "cpu",
        )
    # keep operands in their storage dtype (bf16 on TPU): the MXU consumes
    # bf16 directly with exact f32 accumulation, while an up-front f32 cast
    # forces XLA to materialize f32 copies of the KV cache every step and
    # run 8x-slower f32 MXU passes (measured ~170us/layer extra at
    # bs=64/7B decode, tools/decode_breakdown.py)
    qg = _group_query(q, n_kv)  # [B,S,kv,G,D]
    # scores: [B, kv, G, S, T]
    kv_sub = "bKtd" if kv_heads_major else "btKd"
    scores = jnp.einsum(
        f"bsKgd,{kv_sub}->bKgst", qg, k, preferred_element_type=jnp.float32
    ) * scale
    if logit_softcap is not None:
        # gemma2: cap the raw scaled scores (before any bias/mask)
        scores = logit_softcap * jnp.tanh(scores / logit_softcap)
    # mask broadcast shape [B, 1, 1, S, T]
    off = jnp.asarray(q_offset)
    off = off.reshape(-1, 1, 1, 1, 1) if off.ndim > 0 else off
    q_pos = jnp.arange(S).reshape(1, 1, 1, S, 1) + off
    k_pos = jnp.arange(T).reshape(1, 1, 1, 1, T)
    mask = k_pos <= q_pos  # causal
    if window is not None:
        mask = jnp.logical_and(mask, k_pos > q_pos - window)
    if alibi_slopes is not None:
        # bias[h, s, t] = m_h * (t - s): 0 on the diagonal, increasingly
        # negative with distance (ALiBi paper; reference fused/attn.py:89-98)
        sl = jnp.asarray(alibi_slopes, jnp.float32).reshape(1, n_kv, Hq // n_kv, 1, 1)
        scores = scores + sl * (k_pos - q_pos).astype(jnp.float32)
    if kv_len is not None:
        kl = jnp.asarray(kv_len)
        kl = kl.reshape(-1, 1, 1, 1, 1) if kl.ndim > 0 else kl
        mask = jnp.logical_and(mask, k_pos < kl)
    scores = jnp.where(mask, scores, NEG_INF)
    probs = jax.nn.softmax(scores, axis=-1)
    # probs stay f32 (this einsum path is the golden/reference numerics —
    # the flash kernel rounds p to bf16 like every flash implementation);
    # XLA fuses the v upcast into the dot, and at decode this PV dot is tiny
    out = jnp.einsum(
        f"bKgst,{kv_sub}->bsKgd", probs, v.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )
    # v's head dim can differ from q/k's (deepseek MLA expanded prefill)
    return out.reshape(B, S, Hq, v.shape[-1]).astype(q.dtype)


def _decode_heads_fused(
    q: jax.Array,  # [B, 1, Hq, D]
    k: jax.Array,  # [B, Hkv, T, D] head-major cache layer
    v: jax.Array,
    kv_len,        # scalar or [B] valid prefix (incl. current token)
    scale: float,
    alibi_slopes: Optional[jax.Array],
) -> jax.Array:
    """Single-step decode attention, ONE dot per sequence (block-diagonal
    head mask, the paged-kernel formulation applied in XLA).

    NOT the default: measured ~4% slower per layer than the GQA-grouped
    batched einsum at 7B bs=64 decode on v5e (the [B, Hq, Hkv*T] f32 score
    tensor it materializes outweighs the batched-dot dispatch it saves).
    Kept as the reference implementation for the masked-dot formulation and
    for future shapes where Hkv*T is small.
    """
    B, _, Hq, D = q.shape
    Hkv, T = k.shape[1], k.shape[2]
    gq = Hq // Hkv
    q2 = q[:, 0]  # [B, Hq, D]
    kf = k.reshape(B, Hkv * T, D)
    s = jnp.einsum(
        "bhd,bmd->bhm", q2, kf, preferred_element_type=jnp.float32
    ) * scale  # [B, Hq, Hkv*T]
    head_k = (jnp.arange(Hkv * T, dtype=jnp.int32) // T).reshape(1, 1, -1)
    pos_k = (jnp.arange(Hkv * T, dtype=jnp.int32) % T).reshape(1, 1, -1)
    head_q = (jnp.arange(Hq, dtype=jnp.int32) // gq).reshape(1, Hq, 1)
    kl = jnp.asarray(kv_len)
    klb = kl.reshape(-1, 1, 1) if kl.ndim > 0 else kl
    mask = jnp.logical_and(head_k == head_q, pos_k < klb)
    if alibi_slopes is not None:
        sl = jnp.asarray(alibi_slopes, jnp.float32).reshape(1, Hq, 1)
        s = s + sl * (pos_k - (klb - 1)).astype(jnp.float32)
    s = jnp.where(mask, s, NEG_INF)
    probs = jax.nn.softmax(s, axis=-1)  # masked entries -> 0
    out = jnp.einsum(
        "bhm,bmd->bhd", probs,
        v.reshape(B, Hkv * T, D).astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )
    return out[:, None].astype(q.dtype)  # [B, 1, Hq, D]


def decode_attention(
    q: jax.Array,  # [B, 1, Hq, D]
    k_cache: jax.Array,  # [B, T, Hkv, D] (or [B, Hkv, T, D] if heads-major)
    v_cache: jax.Array,
    cache_len: jax.Array,  # scalar or [B]: number of valid entries (incl. current)
    scale: Optional[float] = None,
    alibi_slopes: Optional[jax.Array] = None,
    kv_heads_major: bool = False,
) -> jax.Array:
    """Single-token decode attention over a (padded) KV cache."""
    return causal_attention(
        q, k_cache, v_cache,
        q_offset=jnp.asarray(cache_len) - 1,
        kv_len=cache_len,
        scale=scale,
        alibi_slopes=alibi_slopes,
        kv_heads_major=kv_heads_major,
    )
