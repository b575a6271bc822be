"""Blocked (flash) causal attention — Pallas TPU kernel.

Replaces the reference's prefill attention (torch sdpa,
quick/awq/modules/fused/attn.py:197-209) with an online-softmax kernel that
never materializes the [S, T] score matrix: scores are computed one
[bq, bk] tile at a time in VMEM with running max/sum rescaling, so HBM
traffic is O(S*D + T*D) instead of O(S*T).

Features beyond the reference (needed by this framework's serving runtime):
- GQA/MQA: query heads map onto kv heads by integer division — no
  repeat_interleave materialization (reference attn.py:194-195).
- Per-batch query offset and kv length (scalar-prefetched from SMEM), so the
  same kernel serves full prefill, chunked prefill and paged decode views.
- Optional ALiBi bias (slope per head, SMEM).
- Sliding-window masking (mistral/gemma2) and tanh logit softcap (gemma2),
  both static kernel parameters.
- Causal block skipping: kv tiles entirely above the diagonal (or past the
  kv length, or — with a sliding window — entirely below every query row's
  window) are skipped per grid step — BOTH their compute (@pl.when) and
  their DMA: the kv BlockSpec index maps clamp the tile index using the
  scalar-prefetched offsets/lengths, and Mosaic elides the re-fetch when
  consecutive steps reference the same block. Causal prefill halves K/V
  bandwidth; chunked serving prefill over a padded cache view streams only
  the valid prefix.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _flash_kernel(
    qoff_ref, klen_ref, slope_ref,  # SMEM (whole arrays): [B], [B], [Hq]
    tri_ref,                        # VMEM [bq, bk] bf16 static causal(/band)
    q_ref, k_ref, v_ref,            # additive bias for ALIGNED diag tiles
    o_ref,                          # VMEM: [1,1,bq,D]
    m_scr, l_scr, acc_scr,          # VMEM scratch: [bq,1], [bq,1], [bq,D]
    *, scale: float, bq: int, bk: int, use_alibi: bool,
    window: Optional[int], softcap: Optional[float],
):
    b = pl.program_id(0)
    h = pl.program_id(1)
    iq = pl.program_id(2)
    ik = pl.program_id(3)
    qoff = qoff_ref[b]
    klen = klen_ref[b]

    @pl.when(ik == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    # causal block skip: this kv tile's first key position vs the q tile's
    # last absolute query position, and the valid kv length
    q_last = qoff + iq * bq + bq - 1
    live = jnp.logical_and(ik * bk <= q_last, ik * bk < klen)
    if window is not None:
        # sliding window: also skip kv tiles entirely BELOW the window of
        # every query row in this q tile (q_first - window)
        q_first = qoff + iq * bq
        live = jnp.logical_and(live, ik * bk + bk - 1 > q_first - window)

    # boundary detection: the triangular/length/window mask only BINDS on
    # tiles that straddle the diagonal, the kv-length edge, or the window
    # edge. Interior tiles skip the whole iota/compare/where chain — the
    # kernel is VPU-softmax-bound (per live 512x512 step the two MXU dots
    # cost ~0.9 us but the masking+softmax passes ~3-4 us), so this is
    # where prefill throughput lives. ALiBi needs positions everywhere.
    q_first = qoff + iq * bq
    boundary = jnp.logical_or(
        ik * bk + bk - 1 > q_first,            # straddles the diagonal
        ik * bk + bk > klen,                   # straddles the kv length
    )
    if use_alibi:
        boundary = True
    if window is not None:
        boundary = jnp.logical_or(
            boundary, ik * bk <= q_last - window  # straddles the window
        )

    def _scores():
        # operands stay in their storage dtype (bf16): MXU bf16 passes with
        # exact f32 accumulation — an up-front f32 cast would force ~8x
        # slower f32 MXU passes for identical products
        q = q_ref[0, 0]                              # [bq, D]
        k = k_ref[0, 0]                              # [bk, D]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale                                    # [bq, bk] f32
        if softcap is not None:
            # gemma2: cap the raw scaled scores (before any bias/mask)
            s = softcap * jnp.tanh(s / softcap)
        return s

    def _accumulate(s, p_mask):
        m_prev = m_scr[:]                            # [bq, 1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        # guard fully-masked rows: exp(NEG_INF - NEG_INF) would be 1
        p = jnp.exp(s - m_new)
        if p_mask is not None:
            p = jnp.where(p_mask, p, 0.0)
        alpha = jnp.exp(m_prev - m_new)
        l_scr[:] = l_scr[:] * alpha + jnp.sum(p, axis=-1, keepdims=True)
        v = v_ref[0, 0]                              # [bk, D] storage dtype
        acc_scr[:] = acc_scr[:] * alpha + jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        m_scr[:] = m_new

    # aligned diagonal tiles: the causal(/band) mask depends only on i-j,
    # so it rides in as a STATIC additive-bias table (one DMA, constant
    # index map) — no per-step iota/compare/where chain. exp(-1e30 - m)
    # underflows to exactly 0, so no p re-mask is needed either.
    diag = jnp.logical_and(
        qoff + iq * bq == ik * bk, ik * bk + bk <= klen
    )
    if use_alibi:
        diag = False

    @pl.when(jnp.logical_and(live, jnp.logical_and(boundary, diag)))
    def _compute_diag():
        s = _scores() + tri_ref[...].astype(jnp.float32)
        _accumulate(s, None)

    @pl.when(jnp.logical_and(
        live, jnp.logical_and(boundary, jnp.logical_not(diag))
    ))
    def _compute_boundary():
        s = _scores()
        q_pos = qoff + iq * bq + jax.lax.broadcasted_iota(
            jnp.int32, (bq, bk), 0
        )
        k_pos = ik * bk + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1)
        if use_alibi:
            s = s + slope_ref[h] * (k_pos - q_pos).astype(jnp.float32)
        mask = jnp.logical_and(k_pos <= q_pos, k_pos < klen)
        if window is not None:
            mask = jnp.logical_and(mask, k_pos > q_pos - window)
        s = jnp.where(mask, s, NEG_INF)
        _accumulate(s, mask)

    if not use_alibi:
        @pl.when(jnp.logical_and(live, jnp.logical_not(boundary)))
        def _compute_interior():
            _accumulate(_scores(), None)

    @pl.when(ik == pl.num_programs(3) - 1)
    def _finish():
        l = l_scr[:]
        out = acc_scr[:] / jnp.where(l == 0.0, 1.0, l)
        o_ref[0, 0] = out.astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("scale", "bq", "bk", "interpret", "window", "softcap"),
)
def _flash_bhsd(
    q: jax.Array,        # [B, Hq, Sp, D]
    k: jax.Array,        # [B, Hkv, Tp, D]
    v: jax.Array,
    qoff: jax.Array,     # [B] int32
    klen: jax.Array,     # [B] int32
    slopes: jax.Array,   # [Hq] f32 (zeros disable ALiBi — but the static
                         # use_alibi flag comes from callers via nonzero check
                         # at trace time, see flash_attention)
    scale: float,
    bq: int,
    bk: int,
    interpret: bool,
    window: Optional[int] = None,
    softcap: Optional[float] = None,
) -> jax.Array:
    B, Hq, Sp, D = q.shape
    Hkv, Tp = k.shape[1], k.shape[2]
    Dv = v.shape[-1]  # deepseek MLA expanded prefill: v_head_dim (128)
    # differs from the q/k width (qk_nope+qk_rope = 192)
    group = Hq // Hkv
    use_alibi = bool(slopes.shape[0] > 0)
    slopes_in = slopes if use_alibi else jnp.zeros((Hq,), jnp.float32)

    def kv_index(b, h, i, j, qoff_s, klen_s, sl_s):
        # clamp skipped tiles (above the causal diagonal, past klen, or —
        # with a sliding window — below the q tile's window) onto a NEEDED
        # tile: repeated block index -> Mosaic skips the DMA
        q_last = qoff_s[b] + i * bq + bq - 1
        last = jnp.maximum(jnp.minimum(q_last, klen_s[b] - 1), 0) // bk
        j = jnp.minimum(j, last)
        if window is not None:
            q_first = qoff_s[b] + i * bq
            first = jnp.clip(q_first - window + 1, 0, None) // bk
            j = jnp.maximum(j, jnp.minimum(first, last))
        return (b, h // group, j, 0)

    kernel = functools.partial(
        _flash_kernel, scale=scale, bq=bq, bk=bk, use_alibi=use_alibi,
        window=window, softcap=softcap,
    )
    # static additive bias for aligned diagonal tiles: causal j <= i plus
    # the sliding-window band when configured (both depend only on i - j)
    ii = np.arange(bq)[:, None]
    jj = np.arange(bk)[None, :]
    keep = jj <= ii
    if window is not None:
        keep &= jj > ii - window
    tri = jnp.asarray(np.where(keep, 0.0, NEG_INF), jnp.bfloat16)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(B, Hq, Sp // bq, Tp // bk),
        in_specs=[
            pl.BlockSpec((bq, bk), lambda b, h, i, j, *_: (0, 0)),
            pl.BlockSpec((1, 1, bq, D), lambda b, h, i, j, *_: (b, h, i, 0)),
            pl.BlockSpec((1, 1, bk, D), kv_index),
            pl.BlockSpec((1, 1, bk, Dv), kv_index),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, bq, Dv), lambda b, h, i, j, *_: (b, h, i, 0)
        ),
        scratch_shapes=[
            pltpu.VMEM((bq, 1), jnp.float32),
            pltpu.VMEM((bq, 1), jnp.float32),
            pltpu.VMEM((bq, Dv), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, Hq, Sp, Dv), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary")
        ),
        interpret=interpret,
    )(qoff, klen, slopes_in, tri, q, k, v)
    return out


def flash_attention(
    q: jax.Array,  # [B, S, Hq, D]
    k: jax.Array,  # [B, T, Hkv, D] — or [B, Hkv, T, D] if kv_heads_major
    v: jax.Array,  # same layout as k
    q_offset: jax.Array | int = 0,
    kv_len: Optional[jax.Array] = None,
    scale: Optional[float] = None,
    alibi_slopes: Optional[jax.Array] = None,
    bq: int = 1024,
    bk: int = 1024,
    kv_heads_major: bool = False,
    interpret: bool = False,
    window: Optional[int] = None,
    logit_softcap: Optional[float] = None,
) -> jax.Array:
    """Flash attention with the same contract as ops.attention.causal_attention.

    Default tiles are 1024x1024 (v5e round-5 sweep, 7B shapes, with the
    interior/diagonal fast paths): S=2048 419 us = 82 TFLOPS causal-adj,
    S=4096 105 TF, S=8192 119 TF — vs 64 TF at the old 512x512 default;
    2048-wide tiles fail to compile (VMEM), 128x128 is 5x slower. The
    unmasked interior path alone sustains 130 TF (81% MXU) at 1024x1024.

    ``kv_heads_major=True`` consumes the dense cache's native [B, Hkv, T, D]
    layout directly — the kernel wants that order anyway, so cache reads
    skip the per-step whole-cache transpose."""
    B, S, Hq, D = q.shape
    if kv_heads_major:
        Hkv, T = k.shape[1], k.shape[2]
    else:
        T, Hkv = k.shape[1], k.shape[2]
    if scale is None:
        scale = D ** -0.5
    bq = min(bq, _round_up(S, 8))
    bk = min(bk, _round_up(T, 128))
    Sp, Tp = _round_up(S, bq), _round_up(T, bk)

    qt = jnp.moveaxis(q, 2, 1)  # [B, Hq, S, D]
    kt = k if kv_heads_major else jnp.moveaxis(k, 2, 1)
    vt = v if kv_heads_major else jnp.moveaxis(v, 2, 1)
    if Sp != S:
        qt = jnp.pad(qt, ((0, 0), (0, 0), (0, Sp - S), (0, 0)))
    if Tp != T:
        kt = jnp.pad(kt, ((0, 0), (0, 0), (0, Tp - T), (0, 0)))
        vt = jnp.pad(vt, ((0, 0), (0, 0), (0, Tp - T), (0, 0)))

    qoff = jnp.broadcast_to(jnp.asarray(q_offset, jnp.int32), (B,))
    klen = (
        jnp.broadcast_to(jnp.asarray(kv_len, jnp.int32), (B,))
        if kv_len is not None
        else jnp.full((B,), T, jnp.int32)
    )
    klen = jnp.minimum(klen, T)
    slopes = (
        jnp.asarray(alibi_slopes, jnp.float32)
        if alibi_slopes is not None
        else jnp.zeros((0,), jnp.float32)
    )
    out = _flash_bhsd(
        qt, kt, vt, qoff, klen, slopes,
        scale=float(scale), bq=bq, bk=bk, interpret=interpret,
        window=window,
        softcap=None if logit_softcap is None else float(logit_softcap),
    )
    out = jnp.moveaxis(out, 1, 2)  # [B, Sp, Hq, D]
    return out[:, :S]


def _round_up(v: int, m: int) -> int:
    return (v + m - 1) // m * m
