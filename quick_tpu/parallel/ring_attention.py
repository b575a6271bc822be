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
with position masks per visiting block.

Two variants:
- ``ring_causal_attention`` — contiguous S/n chunks. Every device runs all
  n rounds including its fully-masked future blocks (the wasted half of a
  causal triangle).
- ``zigzag_ring_causal_attention`` — each device owns the chunk PAIR
  (d, 2n-1-d) of 2n chunks (the llama-3-style zigzag): per device the
  causally-useful work is the constant 2n+1 chunk-pairs, and the fully
  masked pairs are SKIPPED with ``lax.cond`` (a real branch per device —
  legal under shard_map's manual SPMD), so wall-clock compute is ~half the
  plain ring's. parallel/context_parallel.py permutes the sequence into
  this layout and back.
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
    window: Optional[int] = None,  # sliding window (mistral): key visible
    # iff q_pos - window < k_pos <= q_pos — composes with the causal mask
    # via the same per-block position grids
    alibi_slopes: Optional[jax.Array] = None,  # [Hq] per-head slopes;
    # bias m_h*(k_pos - q_pos) is per-(q,k)-pair local (positions are
    # global), so ALiBi rides the ring exactly — no gather fallback
    logit_softcap: Optional[float] = None,  # gemma2 cap*tanh(s/cap):
    # elementwise on each chunk's scaled scores BEFORE bias/mask, the
    # same order as ops/attention.py:87-102
) -> jax.Array:
    """Exact causal attention with sequence-sharded K/V. Returns
    [B, S_local, Hq, D] — this device's output block."""
    B, Sl, Hq, D = q.shape
    Hkv = k.shape[2]
    g = Hq // Hkv
    scale = D ** -0.5 if scale is None else scale
    n = axis_size
    my = jax.lax.axis_index(axis_name)

    qf = q.transpose(0, 2, 1, 3)  # [B,Hq,Sl,D] storage dtype: bf16
    # operands + f32 accumulation (the flash/causal_attention numerics
    # contract) — an f32 upcast would run the MXU at ~1/8 rate
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
        if window is not None:
            keep = jnp.logical_and(
                keep, k_pos[None, :] > q_pos[:, None] - window
            )

        kf = kr.transpose(0, 2, 1, 3)  # [B,Hkv,Sl,D] storage dtype
        vf = vr.transpose(0, 2, 1, 3)
        if g > 1:  # GQA: kv heads broadcast over their query-head group
            kf = jnp.repeat(kf, g, axis=1)
            vf = jnp.repeat(vf, g, axis=1)
        s = jnp.einsum(
            "bhqd,bhkd->bhqk", qf, kf,
            preferred_element_type=jnp.float32,
        ) * scale
        if logit_softcap is not None:
            s = logit_softcap * jnp.tanh(s / logit_softcap)
        if alibi_slopes is not None:
            sl = jnp.asarray(alibi_slopes, jnp.float32).reshape(1, Hq, 1, 1)
            s = s + sl * (
                k_pos[None, :] - q_pos[:, None]
            ).astype(jnp.float32)[None, None]
        s = jnp.where(keep[None, None], s, -jnp.inf)

        blk_max = jnp.max(s, axis=-1)  # [B,Hq,Sl]; -inf when fully masked
        m_new = jnp.maximum(m, blk_max)
        # fully-masked-so-far rows keep m=-inf; exp(-inf - -inf) guards
        safe_m = jnp.where(jnp.isfinite(m_new), m_new, 0.0)
        p = jnp.exp(s - safe_m[..., None])
        p = jnp.where(keep[None, None], p, 0.0)
        corr = jnp.where(jnp.isfinite(m), jnp.exp(m - safe_m), 0.0)
        l = l * corr + jnp.sum(p, axis=-1)
        acc = acc * corr[..., None] + jnp.einsum(
            "bhqk,bhkd->bhqd", p.astype(vf.dtype), vf,
            preferred_element_type=jnp.float32,
        )

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


def zigzag_order(S: int, n: int) -> "jax.Array":
    """Permutation putting global token order into zigzag-sharded order:
    device d's contiguous shard = chunks (d, 2n-1-d) of the 2n chunks.
    Apply as x[:, zigzag_order(S, n)]; invert with argsort."""
    C = S // (2 * n)
    idx = []
    for d in range(n):
        idx.extend(range(d * C, (d + 1) * C))
        idx.extend(range((2 * n - 1 - d) * C, (2 * n - d) * C))
    import numpy as _np

    return jnp.asarray(_np.asarray(idx, _np.int32))


def zigzag_ring_causal_attention(
    q: jax.Array,  # [B, 2C, Hq, D] — this device's chunk pair (d, 2n-1-d)
    k: jax.Array,  # [B, 2C, Hkv, D]
    v: jax.Array,
    axis_name: str,
    axis_size: int,
    scale: Optional[float] = None,
    window: Optional[int] = None,  # sliding window: key visible iff
    # q_pos - window < k_pos <= q_pos. The per-pair masks are built from
    # GLOBAL chunk positions, so the window composes with the zigzag
    # layout; chunk pairs fully below the window skip compute via the
    # same lax.cond that skips fully-future pairs (mistral-class models
    # keep sharded KV under CP — VERDICT r3 item 9)
    alibi_slopes: Optional[jax.Array] = None,  # [Hq]; bias from the same
    # global position grids the masks use — exact under the zigzag layout
    logit_softcap: Optional[float] = None,  # cap*tanh(s/cap) before
    # bias/mask, matching ops/attention.py's order
) -> jax.Array:
    """Exact causal attention over zigzag-sharded K/V. Returns
    [B, 2C, Hq, D] in the device's local (zigzag) order."""
    B, S2, Hq, D = q.shape
    C = S2 // 2
    Hkv = k.shape[2]
    g = Hq // Hkv
    scale = D ** -0.5 if scale is None else scale
    n = axis_size
    my = jax.lax.axis_index(axis_name)
    q_ids = jnp.stack([my, 2 * n - 1 - my])  # global chunk ids of q halves

    qf = q.transpose(0, 2, 1, 3)  # [B,Hq,2C,D] storage dtype (see
    # ring_causal_attention: bf16 operands, f32 accumulation)

    def expand(t):  # [B,2C,Hkv,D] -> [B,Hq,2C,D] storage dtype
        t = t.transpose(0, 2, 1, 3)
        return jnp.repeat(t, g, axis=1) if g > 1 else t

    m0 = jnp.full((2, B, Hq, C), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((2, B, Hq, C), jnp.float32)
    a0 = jnp.zeros((2, B, Hq, C, D), jnp.float32)
    tri = jnp.arange(C)[:, None] >= jnp.arange(C)[None, :]  # [C, C]
    perm = [(i, (i + 1) % n) for i in range(n)]

    def interact(state, qh, kh, vh, qid, kid):
        """Fold kv chunk `kid` into q chunk `qid`'s (m, l, acc) — skipped
        entirely (lax.cond) when the chunk is fully in the future, or
        (window) fully below every query row's window."""
        m, l, acc = state

        def compute(_):
            s = jnp.einsum(
                "bhqd,bhkd->bhqk", qh, kh,
                preferred_element_type=jnp.float32,
            ) * scale
            # global positions: window/alibi bounds compose with the
            # causal bound on the same [C, C] position grid
            q_pos = qid * C + jnp.arange(C)
            k_pos = kid * C + jnp.arange(C)
            if window is None:
                keep = jnp.where(qid == kid, tri, qid > kid)  # [C,C]/scalar
                keep = jnp.broadcast_to(keep, s.shape[-2:])
            else:
                keep = jnp.logical_and(
                    k_pos[None, :] <= q_pos[:, None],
                    k_pos[None, :] > q_pos[:, None] - window,
                )
            if logit_softcap is not None:
                s = logit_softcap * jnp.tanh(s / logit_softcap)
            if alibi_slopes is not None:
                sl = jnp.asarray(alibi_slopes, jnp.float32)
                s = s + sl.reshape(1, -1, 1, 1) * (
                    k_pos[None, :] - q_pos[:, None]
                ).astype(jnp.float32)[None, None]
            s = jnp.where(keep[None, None], s, -jnp.inf)
            blk_max = jnp.max(s, axis=-1)
            m_new = jnp.maximum(m, blk_max)
            safe = jnp.where(jnp.isfinite(m_new), m_new, 0.0)
            p = jnp.exp(s - safe[..., None])
            p = jnp.where(keep[None, None], p, 0.0)
            corr = jnp.where(jnp.isfinite(m), jnp.exp(m - safe), 0.0)
            return (
                m_new,
                l * corr + jnp.sum(p, axis=-1),
                acc * corr[..., None] + jnp.einsum(
                    "bhqk,bhkd->bhqd", p.astype(vh.dtype), vh,
                    preferred_element_type=jnp.float32,
                ),
            )

        visible = kid <= qid
        if window is not None:
            # any (q, k) pair visible <=> the chunk's last key reaches past
            # the first query's window start: k_max > q_min - window
            visible = jnp.logical_and(
                visible, (kid + 1) * C - 1 > qid * C - window
            )
        return jax.lax.cond(visible, compute, lambda _: (m, l, acc), None)

    def round_step(r, carry):
        m, l, acc, kr, vr = carry
        src = (my - r) % n
        k_ids = jnp.stack([src, 2 * n - 1 - src])
        kf, vf = expand(kr), expand(vr)
        for qi in range(2):
            for ki in range(2):
                st = interact(
                    (m[qi], l[qi], acc[qi]),
                    qf[:, :, qi * C : (qi + 1) * C],
                    kf[:, :, ki * C : (ki + 1) * C],
                    vf[:, :, ki * C : (ki + 1) * C],
                    q_ids[qi], k_ids[ki],
                )
                m = m.at[qi].set(st[0])
                l = l.at[qi].set(st[1])
                acc = acc.at[qi].set(st[2])
        kr = jax.lax.ppermute(kr, axis_name, perm)
        vr = jax.lax.ppermute(vr, axis_name, perm)
        return m, l, acc, kr, vr

    m, l, acc, _, _ = jax.lax.fori_loop(0, n, round_step, (m0, l0, a0, k, v))
    out = acc / jnp.maximum(l, 1e-30)[..., None]  # [2, B, Hq, C, D]
    out = jnp.concatenate([out[0], out[1]], axis=2)  # [B, Hq, 2C, D]
    return out.transpose(0, 2, 1, 3).astype(q.dtype)
