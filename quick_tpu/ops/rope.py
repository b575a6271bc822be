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
    max_seq_len: int, head_dim: int, theta: float = 10000.0, scaling=None
) -> tuple[jax.Array, jax.Array]:
    """Precompute (cos, sin) tables of shape [max_seq_len, head_dim//2].

    ``scaling`` is an HF ``rope_scaling`` config (dict, or the hashable
    tuple-of-pairs form ModelConfig stores): supported ``rope_type``s are
    ``linear`` (position interpolation), ``dynamic`` (NTK-aware theta
    rescale, applied statically at the table's full length), ``yarn``
    (ramp-blended interpolation/extrapolation with the mscale attention
    factor folded into the tables, HF convention), and ``llama3``
    (frequency-piecewise scaling: high-frequency dims keep full
    resolution, low-frequency dims interpolate). The reference inherits
    whatever ``transformers`` did at trace time; here the scaled table IS
    the single runtime convention (see apply_rope)."""
    import math

    half = jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim
    inv_freq = 1.0 / theta ** half
    attn_factor = 1.0
    d = dict(scaling) if scaling else {}
    rtype = d.get("rope_type", d.get("type", "default"))
    factor = float(d.get("factor", 1.0))
    if rtype == "linear":
        inv_freq = inv_freq / factor
    elif rtype == "dynamic":
        L0 = int(d.get("original_max_position_embeddings", max_seq_len))
        if max_seq_len > L0:
            theta2 = theta * (
                factor * max_seq_len / L0 - (factor - 1)
            ) ** (head_dim / (head_dim - 2))
            inv_freq = 1.0 / theta2 ** half
    elif rtype == "llama3":
        low = float(d.get("low_freq_factor", 1.0))
        high = float(d.get("high_freq_factor", 4.0))
        L0 = int(d.get("original_max_position_embeddings", 8192))
        wavelen = 2.0 * jnp.pi / inv_freq
        smooth = jnp.clip((L0 / wavelen - low) / (high - low), 0.0, 1.0)
        blended = (1.0 - smooth) * inv_freq / factor + smooth * inv_freq
        inv_freq = jnp.where(
            wavelen > L0 / low, inv_freq / factor,
            jnp.where(wavelen < L0 / high, inv_freq, blended),
        )
    elif rtype == "yarn":
        L0 = int(d.get("original_max_position_embeddings", max_seq_len))
        beta_fast = float(d.get("beta_fast", 32.0))
        beta_slow = float(d.get("beta_slow", 1.0))

        def corr_dim(n_rot):
            return (head_dim * math.log(L0 / (n_rot * 2 * math.pi))
                    ) / (2 * math.log(theta))

        lo = max(math.floor(corr_dim(beta_fast)), 0)
        hi = min(math.ceil(corr_dim(beta_slow)), head_dim - 1)
        ramp = jnp.clip(
            (jnp.arange(head_dim // 2, dtype=jnp.float32) - lo)
            / max(hi - lo, 1e-3), 0.0, 1.0,
        )
        extrap_w = 1.0 - ramp  # 1 for high-freq dims: keep extrapolation
        inv_freq = (inv_freq / factor) * (1.0 - extrap_w) + inv_freq * extrap_w
        af = d.get("attention_factor")
        ms, msad = d.get("mscale"), d.get("mscale_all_dim")
        if af is not None:
            attn_factor = float(af)
        elif ms is not None and msad:
            # deepseek-v2/v3 yarn: the table factor is the RATIO of the two
            # mscales (modeling_deepseek DeepseekV2YarnRotaryEmbedding);
            # the remaining mscale(factor, mscale_all_dim)^2 enters the MLA
            # softmax scale (see modules/mla.py)
            def _mscale(m):
                return 0.1 * m * math.log(factor) + 1.0 if factor > 1 else 1.0

            attn_factor = _mscale(float(ms)) / _mscale(float(msad))
        else:
            attn_factor = (
                0.1 * math.log(factor) + 1.0 if factor > 1.0 else 1.0
            )
    elif rtype in ("longrope", "su"):
        # phi3/phi3.5/phi4 LongRoPE (HF modeling_phi3 rotary): per-dim
        # frequency rescale factors — ``long_factor`` beyond the original
        # training length, ``short_factor`` within it. A serving table is
        # built ONCE for the deployment's full max_seq_len, so the regime
        # is pinned by table length (dynamically re-deriving the whole
        # table mid-request, as HF does, is incompatible with a persistent
        # paged cache; vLLM pins per cache the same way).
        L0 = int(d.get("original_max_position_embeddings", max_seq_len))
        which = "long_factor" if max_seq_len > L0 else "short_factor"
        fac = d.get(which)
        if fac is not None:
            inv_freq = inv_freq / jnp.asarray(
                [float(v) for v in fac], jnp.float32
            )
        af = d.get("attention_factor")
        scale = max_seq_len / L0
        if af is not None:
            attn_factor = float(af)
        elif scale > 1.0:
            attn_factor = math.sqrt(1.0 + math.log(scale) / math.log(L0))
    elif rtype not in ("default", None):
        raise NotImplementedError(f"rope_scaling type {rtype!r}")
    t = jnp.arange(max_seq_len, dtype=jnp.float32)
    freqs = jnp.outer(t, inv_freq)  # [S, D/2]
    return jnp.cos(freqs) * attn_factor, jnp.sin(freqs) * attn_factor


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


def local_rope_tables(cfg):
    """(cos, sin) tables for gemma3's sliding-window layers —
    cfg.rope_local_theta with NO position scaling (HF applies rope_scaling
    only to the global-attention rope) — or (None, None) when the config
    has a single rope."""
    if getattr(cfg, "rope_local_theta", None) is None:
        return None, None
    return rope_table(
        cfg.max_position_embeddings,
        cfg.rotary_dim or cfg.head_dim,
        cfg.rope_local_theta,
        None,
    )
