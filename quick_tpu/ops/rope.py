"""Rotary position embeddings (HF rotate-half convention).

The reference applies RoPE two ways: a complex-multiply module for prefill
(quick/awq/modules/fused/attn.py:25-65) and in-kernel rotation for decode
(attn.py:211-230). Here one functional implementation serves both paths —
under jit it fuses into the surrounding computation. We use the HF/GPT-NeoX
rotate-half convention so HF Llama-family checkpoints load unchanged.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def rope_table(
    max_seq_len: int, head_dim: int, theta: float = 10000.0
) -> tuple[jax.Array, jax.Array]:
    """Precompute (cos, sin) tables of shape [max_seq_len, head_dim//2]."""
    inv_freq = 1.0 / (
        theta ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim)
    )
    t = jnp.arange(max_seq_len, dtype=jnp.float32)
    freqs = jnp.outer(t, inv_freq)  # [S, D/2]
    return jnp.cos(freqs), jnp.sin(freqs)


def apply_rope(
    x: jax.Array,  # [B, S, H, D]
    positions: jax.Array,  # [B, S] absolute positions
    cos: jax.Array,  # [max_seq, Dr/2] — Dr = 2*cos.shape[-1] <= D rotated dims
    sin: jax.Array,
) -> jax.Array:
    """Rotate-half RoPE: out = x*cos + rotate_half(x)*sin.

    Partial rotary (gpt-neox rotary_pct / gptj rotary_dim): when the table
    covers fewer dims than head_dim, only the first ``2*cos.shape[-1]`` dims
    rotate; the rest pass through. (GPT-J's interleaved convention is
    converted to rotate-half by an import-time channel permutation —
    see utils/checkpoint.py — so one runtime convention serves all.)"""
    D = x.shape[-1]
    Dr = 2 * cos.shape[-1]
    xr, xp = (x, None) if Dr == D else (x[..., :Dr], x[..., Dr:])
    c = cos[positions][:, :, None, :]  # [B, S, 1, Dr/2]
    s = sin[positions][:, :, None, :]
    x1 = xr[..., : Dr // 2].astype(jnp.float32)
    x2 = xr[..., Dr // 2 :].astype(jnp.float32)
    o1 = x1 * c - x2 * s
    o2 = x2 * c + x1 * s
    out = jnp.concatenate([o1, o2], axis=-1).astype(x.dtype)
    if xp is not None:
        out = jnp.concatenate([out, xp], axis=-1)
    return out
