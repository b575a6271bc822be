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
    k: jax.Array,  # [B, T, Hkv, D]
    v: jax.Array,  # [B, T, Hkv, D]
    q_offset: jax.Array | int = 0,  # absolute position of q[0] within kv
    kv_len: Optional[jax.Array] = None,  # valid kv prefix length [B] or scalar
    scale: Optional[float] = None,
    alibi_slopes: Optional[jax.Array] = None,  # [Hq] per-head slopes
) -> jax.Array:
    """Causal GQA attention, f32 softmax. Returns [B, S, Hq, D].

    Works for prefill (S == T, q_offset = 0), chunked prefill and decode
    (S == 1, kv from cache).
    """
    B, S, Hq, D = q.shape
    T = k.shape[1]
    n_kv = k.shape[2]
    if scale is None:
        scale = D ** -0.5
    if _use_flash(S, T, D):
        from quick_tpu.ops.flash_attention import flash_attention

        return flash_attention(
            q, k, v, q_offset=q_offset, kv_len=kv_len, scale=scale,
            alibi_slopes=alibi_slopes,
            interpret=jax.default_backend() == "cpu",
        )
    qg = _group_query(q, n_kv).astype(jnp.float32)  # [B,S,kv,G,D]
    kf = k.astype(jnp.float32)
    vf = v.astype(jnp.float32)
    # scores: [B, kv, G, S, T]
    scores = jnp.einsum("bsKgd,btKd->bKgst", qg, kf) * scale
    # mask broadcast shape [B, 1, 1, S, T]
    off = jnp.asarray(q_offset)
    off = off.reshape(-1, 1, 1, 1, 1) if off.ndim > 0 else off
    q_pos = jnp.arange(S).reshape(1, 1, 1, S, 1) + off
    k_pos = jnp.arange(T).reshape(1, 1, 1, 1, T)
    mask = k_pos <= q_pos  # causal
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
    out = jnp.einsum("bKgst,btKd->bsKgd", probs, vf)
    return out.reshape(B, S, Hq, D).astype(q.dtype)


def decode_attention(
    q: jax.Array,  # [B, 1, Hq, D]
    k_cache: jax.Array,  # [B, T, Hkv, D]
    v_cache: jax.Array,  # [B, T, Hkv, D]
    cache_len: jax.Array,  # scalar or [B]: number of valid entries (incl. current)
    scale: Optional[float] = None,
    alibi_slopes: Optional[jax.Array] = None,
) -> jax.Array:
    """Single-token decode attention over a (padded) KV cache."""
    return causal_attention(
        q, k_cache, v_cache,
        q_offset=jnp.asarray(cache_len) - 1,
        kv_len=cache_len,
        scale=scale,
        alibi_slopes=alibi_slopes,
    )
