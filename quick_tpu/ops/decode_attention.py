"""Chunked dense-cache decode attention — Pallas TPU kernel.

Single-token decode over the dense head-major KV cache
(modules/cache.py: [B, Hkv, T, D] per layer). TPU-native replacement for
the same role FasterTransformer's ``single_query_attention`` plays in the
reference (quick/awq/modules/fused/attn.py:211-230) when the cache is the
dense (non-paged) one.

Why a third attention kernel exists (vs flash_attention and
paged_attention):

- The XLA einsum path (ops/attention.py) reads the WHOLE padded cache
  every step and round-trips f32 score/prob tensors through HBM —
  measured ~156 us/layer at 7B bs=64 against an 82 us KV-read roofline
  (tools/decode_breakdown.py).
- Riding the paged kernel with an identity block table processes ONE
  sequence per grid step (page = max_seq): the per-step softmax over an
  [Hq, Hkv*max_seq] tile serializes, measured ~1.5x slower than the
  einsum at bs=64.

This kernel fixes both: the grid is (B//nb, T//c) and each step DMAs the
K and V chunks of ``nb`` sequences at once — fat, pipelined DMAs — while
online softmax (flash-style m/l/acc scratch) accumulates across the chunk
axis. Chunks entirely past a batch-group's longest valid length clamp
their BlockSpec index to the last needed chunk, so Mosaic elides the DMA
and HBM traffic is proportional to valid tokens (rounded up to c), not to
the allocated max_seq.

Per sequence the score dot is the fused-heads/block-diagonal formulation
proven in the paged kernel: one [Hq, D] x [D, Hkv*c] MXU dot for all kv
heads, cross-head products masked out.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _kernel(
    len_ref, gmax_ref,        # SMEM: [B], [B//nb] (group max lengths)
    q_ref, slope_ref,         # VMEM: [nb, Hq, D], [Hq, 1]
    hm_ref, pr_ref,           # VMEM: [Hq, Hkv*c] int8 static block-diagonal
                              # head mask; [8, Hkv*c] int32 in-chunk
                              # position row (row 0 real) — constants
                              # hoisted out of the per-step iota/mod work
    k_ref, v_ref,             # VMEM: [1, nb, Hkv, c, D]
    o_ref,                    # VMEM: [nb, Hq, D]
    m_scr, l_scr, acc_scr,    # VMEM: [nb, Hq, 1], [nb, Hq, 1], [nb, Hq, D]
    *, c: int, gq: int, hkv: int, nb: int, scale: float, use_alibi: bool,
    softcap: float,
):
    g = pl.program_id(0)
    i = pl.program_id(1)
    base = i * c
    hq = hkv * gq
    T = hkv * c

    @pl.when(i == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    for b in range(nb):
        length = len_ref[g * nb + b]

        @pl.when(base < length)
        def _compute(b=b, length=length):
            # storage-dtype (bf16) operands: the MXU accumulates bf16
            # products exactly in f32; an up-front f32 cast would force
            # ~8x slower f32 MXU passes (see flash_attention.py)
            q = q_ref[b]                      # [Hq, D]
            k = k_ref[0, b].reshape(T, -1)    # [Hkv*c, D] (free: c % 8 == 0)
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale                         # [Hq, Hkv*c]
            if softcap:
                # gemma2 logit cap on the scaled scores, BEFORE bias/mask
                # (ops/attention.py:87-89's order) — one VPU tanh pass
                s = softcap * jnp.tanh(s * (1.0 / softcap))
            pos_k = base + pr_ref[0:1, :]              # [1, T]
            mask = jnp.logical_and(hm_ref[...] != 0, pos_k < length)
            if use_alibi:
                s = s + slope_ref[:] * (pos_k - (length - 1)).astype(
                    jnp.float32
                )
            s = jnp.where(mask, s, NEG_INF)
            m_prev = m_scr[b]                 # [Hq, 1]
            m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
            p = jnp.where(mask, jnp.exp(s - m_new), 0.0)
            alpha = jnp.exp(m_prev - m_new)
            l_scr[b] = l_scr[b] * alpha + jnp.sum(p, axis=-1, keepdims=True)
            v = v_ref[0, b].reshape(T, -1)    # [Hkv*c, D]
            acc_scr[b] = acc_scr[b] * alpha + jax.lax.dot_general(
                p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            m_scr[b] = m_new

    @pl.when(i == pl.num_programs(1) - 1)
    def _finish():
        l = l_scr[:]
        o_ref[:] = (acc_scr[:] / jnp.where(l == 0.0, 1.0, l)).astype(
            o_ref.dtype
        )


@functools.partial(
    jax.jit,
    static_argnames=(
        "layer", "use_alibi", "scale", "nb", "c", "interpret", "softcap"
    ),
)
def _dense_decode(
    q: jax.Array,        # [B, Hq, D]
    k: jax.Array,        # [L, B, Hkv, T, D] — the WHOLE cache stack
    v: jax.Array,
    lengths: jax.Array,  # [B] int32
    slopes: jax.Array,   # [Hq, 1] f32 (zeros when ALiBi disabled)
    layer: int,
    use_alibi: bool,
    scale: float,
    nb: int,
    c: int,
    interpret: bool,
    softcap: float = 0.0,
) -> jax.Array:
    B, Hq, D = q.shape
    Hkv, T = k.shape[2], k.shape[3]
    gq = Hq // Hkv
    lengths = lengths.astype(jnp.int32)
    gmax = jnp.max(lengths.reshape(B // nb, nb), axis=-1)

    # the kernel consumes the FULL [L, ...] cache and picks the layer in the
    # index map: handing XLA a sliced operand (k[layer]) makes it materialize
    # a 33MB copy of the slice per layer per step (custom-call operands
    # can't fuse the slice) — measured +240us/layer at 7B bs=64
    def kv_index(g, i, len_s, gmax_s):
        # clamp steps past the group's last valid chunk onto that chunk:
        # repeated block index -> Mosaic skips the DMA re-issue
        last = jnp.maximum(gmax_s[g] - 1, 0) // c
        return (layer, g, 0, jnp.minimum(i, last), 0)

    # static mask constants (see ops/paged_attention.py): the
    # block-diagonal head mask and in-chunk position row replace the
    # kernel's per-(b, chunk) [Hq, Hkv*c] iota + mod/div passes
    import numpy as _np

    Tc = Hkv * c
    hm = jnp.asarray(
        (_np.arange(Hq)[:, None] // gq) == (_np.arange(Tc)[None, :] // c),
        jnp.int8,
    )
    pr = jnp.asarray(
        _np.broadcast_to(_np.arange(Tc) % c, (8, Tc)).astype(_np.int32)
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B // nb, T // c),
        in_specs=[
            pl.BlockSpec((nb, Hq, D), lambda g, i, *_: (g, 0, 0)),
            pl.BlockSpec((Hq, 1), lambda g, i, *_: (0, 0)),
            pl.BlockSpec((Hq, Tc), lambda g, i, *_: (0, 0)),
            pl.BlockSpec((8, Tc), lambda g, i, *_: (0, 0)),
            pl.BlockSpec((1, nb, Hkv, c, D), kv_index),
            pl.BlockSpec((1, nb, Hkv, c, D), kv_index),
        ],
        out_specs=pl.BlockSpec((nb, Hq, D), lambda g, i, *_: (g, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((nb, Hq, 1), jnp.float32),
            pltpu.VMEM((nb, Hq, 1), jnp.float32),
            pltpu.VMEM((nb, Hq, D), jnp.float32),
        ],
    )
    return pl.pallas_call(
        functools.partial(
            _kernel, c=c, gq=gq, hkv=Hkv, nb=nb, scale=float(scale),
            use_alibi=use_alibi, softcap=softcap,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, Hq, D), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")
        ),
        interpret=interpret,
    )(lengths, gmax, q, slopes, hm, pr, k, v)


def _pick_tiles(
    B: int, Hkv: int, T: int, D: int, itemsize: int = 2
) -> Optional[tuple]:
    """Choose (nb sequences/step, c tokens/chunk) for the grid.

    Sweet spot (tools/dense_decode_bench.py, 7B shapes on v5e): ~2MB of
    K+V per grid step — enough to amortize per-step overhead, small enough
    that double-buffering stays comfortable in VMEM (4MB/step steps, i.e.
    nb=8 c=128 at 7B shapes, measured 36% SLOWER than 2MB steps). Within
    that, prefer c <= 128 so short-context tails still skip DMA. Returns
    None if no layout fits (caller falls back to the einsum path)."""
    # max nb*c tokens for ~2MB of K+V per step at the CACHE dtype
    budget = (2 << 20) // (Hkv * D * 2 * itemsize)
    if budget < 8:
        return None
    c = None
    # prefer 128-token chunks over 256: same bytes/step once nb doubles,
    # but finer tail-skip granularity for short contexts
    for cand in (128, 256, 64, 32, 16, 8):
        if cand <= T and T % cand == 0 and cand <= budget:
            c = cand
            break
    if c is None:
        return None
    nb = 1
    while (
        nb * 2 <= B and B % (nb * 2) == 0 and nb * 2 * c <= budget
        and nb < 8
    ):
        nb *= 2
    return nb, c


def dense_decode_attention(
    q: jax.Array,        # [B, 1, Hq, D] or [B, Hq, D]
    k: jax.Array,        # [L, B, Hkv, T, D] cache stack, or [B, Hkv, T, D]
    v: jax.Array,        # (a single head-major layer — wrapped as L=1)
    lengths: jax.Array,  # [B] or scalar: valid tokens (incl. current)
    layer: int = 0,
    scale: Optional[float] = None,
    alibi_slopes: Optional[jax.Array] = None,
    logit_softcap: Optional[float] = None,  # gemma2 cap*tanh(s/cap)
    nb: Optional[int] = None,
    c: Optional[int] = None,
    interpret: bool = False,
) -> jax.Array:
    """Returns attention output in the same rank as ``q``.

    Pass the whole cache stack plus ``layer`` (NOT a pre-sliced layer) when
    calling from a model step — see the slice-copy note in _dense_decode.
    The current step's K/V must already be written into the cache (the
    cache updates before attention, as in modules/blocks.py)."""
    squeeze = q.ndim == 4
    if squeeze:
        q = q[:, 0]
    if k.ndim == 4:
        k, v = k[None], v[None]
        layer = 0
    B, Hq, D = q.shape
    Hkv, T = k.shape[2], k.shape[3]
    if scale is None:
        scale = D ** -0.5
    if nb is None or c is None:
        tiles = _pick_tiles(B, Hkv, T, D, itemsize=k.dtype.itemsize)
        assert tiles is not None, "no tileable layout; use supports()"
        # honor an explicitly fixed tile; auto-pick only the missing one
        nb = tiles[0] if nb is None else nb
        c = tiles[1] if c is None else c
    use_alibi = alibi_slopes is not None
    slopes = (
        jnp.asarray(alibi_slopes, jnp.float32).reshape(Hq, 1)
        if use_alibi else jnp.zeros((Hq, 1), jnp.float32)
    )
    ln = jnp.broadcast_to(jnp.reshape(lengths, (-1,)), (B,))
    out = _dense_decode(
        q, k, v, ln, slopes, int(layer), use_alibi, float(scale), nb, c,
        interpret, float(logit_softcap) if logit_softcap else 0.0,
    )
    return out[:, None] if squeeze else out


def supports(B: int, Hq: int, Hkv: int, T: int, D: int) -> bool:
    """Whether the kernel handles these shapes (else: einsum path)."""
    if Hq % Hkv != 0 or T % 8 != 0 or D % 8 != 0:
        return False
    return _pick_tiles(B, Hkv, T, D) is not None
