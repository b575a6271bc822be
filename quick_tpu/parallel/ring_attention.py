"""Ring (blockwise) causal attention over a sequence-parallel mesh axis.

The long-context scaling step beyond parallel/context_parallel.py's K/V
all-gather: there, every device materializes the FULL [B, S, Hkv, D] K/V per
layer, so context length is still bounded by one chip's memory — the same
asymptote as the reference's rolling window that simply discards old context
(quick/awq/modules/fused/cache.py:32-45, SURVEY.md section 5). Here K/V
blocks stay sharded: each device keeps its S/n token block and the blocks
ROTATE around the ring via ``ppermute`` (one neighbor hop per round — rides
ICI), with online-softmax accumulation folding each visiting block into the
local queries' partial attention. Per-device K/V footprint is S/n for the
whole pass; adding chips extends context linearly.

Exactness: standard flash-attention style (m, l, acc) streaming — bitwise
independent of block order up to f32 reassociation. Causality is enforced
with position masks per visiting block; all devices run all n rounds (the
round count is static, the device index is not, so SPMD cannot skip the
fully-masked future blocks — a zigzag block order would halve the redundant
work; left as a perf follow-up, correctness is unaffected).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def ring_causal_attention(
    q: jax.Array,  # [B, S_local, Hq, D] — this device's query block
    k: jax.Array,  # [B, S_local, Hkv, D]
    v: jax.Array,  # [B, S_local, Hkv, D]
    axis_name: str,
    axis_size: int,  # static ring size (mesh axis length)
    scale: Optional[float] = None,
) -> jax.Array:
    """Exact causal attention with sequence-sharded K/V. Returns
    [B, S_local, Hq, D] — this device's output block."""
    B, Sl, Hq, D = q.shape
    Hkv = k.shape[2]
    g = Hq // Hkv
    scale = D ** -0.5 if scale is None else scale
    n = axis_size
    my = jax.lax.axis_index(axis_name)

    qf = (q.astype(jnp.float32) * scale).transpose(0, 2, 1, 3)  # [B,Hq,Sl,D]
    q_pos = my * Sl + jnp.arange(Sl)  # global positions of local queries

    # running max / denominator / numerator (flash-attention state)
    m = jnp.full((B, Hq, Sl), -jnp.inf, jnp.float32)
    l = jnp.zeros((B, Hq, Sl), jnp.float32)
    acc = jnp.zeros((B, Hq, Sl, D), jnp.float32)

    perm = [(i, (i + 1) % n) for i in range(n)]

    def round_step(r, carry):
        m, l, acc, kr, vr = carry
        # at round r this device holds block (my - r) mod n
        blk = (my - r) % n
        k_pos = blk * Sl + jnp.arange(Sl)
        keep = q_pos[:, None] >= k_pos[None, :]  # [Sl, Sl] causal

        kf = kr.astype(jnp.float32).transpose(0, 2, 1, 3)  # [B,Hkv,Sl,D]
        vf = vr.astype(jnp.float32).transpose(0, 2, 1, 3)
        if g > 1:  # GQA: kv heads broadcast over their query-head group
            kf = jnp.repeat(kf, g, axis=1)
            vf = jnp.repeat(vf, g, axis=1)
        s = jnp.einsum("bhqd,bhkd->bhqk", qf, kf)
        s = jnp.where(keep[None, None], s, -jnp.inf)

        blk_max = jnp.max(s, axis=-1)  # [B,Hq,Sl]; -inf when fully masked
        m_new = jnp.maximum(m, blk_max)
        # fully-masked-so-far rows keep m=-inf; exp(-inf - -inf) guards
        safe_m = jnp.where(jnp.isfinite(m_new), m_new, 0.0)
        p = jnp.exp(s - safe_m[..., None])
        p = jnp.where(keep[None, None], p, 0.0)
        corr = jnp.where(jnp.isfinite(m), jnp.exp(m - safe_m), 0.0)
        l = l * corr + jnp.sum(p, axis=-1)
        acc = acc * corr[..., None] + jnp.einsum("bhqk,bhkd->bhqd", p, vf)

        # rotate K/V one neighbor around the ring (skipping the last,
        # useless hop would make the carry shape round-dependent — one
        # extra S/n-sized ICI hop is noise)
        kr = jax.lax.ppermute(kr, axis_name, perm)
        vr = jax.lax.ppermute(vr, axis_name, perm)
        return m_new, l, acc, kr, vr

    m, l, acc, _, _ = jax.lax.fori_loop(
        0, n, round_step, (m, l, acc, k, v)
    )
    out = acc / jnp.maximum(l, 1e-30)[..., None]
    return out.transpose(0, 2, 1, 3).astype(q.dtype)
