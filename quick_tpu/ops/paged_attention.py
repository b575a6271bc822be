"""Paged decode attention — Pallas TPU kernel with scalar-prefetched
block tables.

The serving engine's baseline reads the paged KV cache through an XLA
gather that materializes a dense [B, max_seq, H, D] view per layer
(quick_tpu/modules/paged_cache.py:layer). This kernel is the production
path: the block table and per-slot lengths are scalar-prefetched into SMEM
and drive the BlockSpec index maps directly, so each grid step DMAs ONE
physical page — all kv heads at once, [Hkv, page, D] — for one slot.
Steps past a slot's length clamp their index map to the slot's last valid
page: Mosaic elides the DMA when consecutive steps reference the same
block, so HBM traffic is proportional to tokens actually attended, and the
compute is skipped with @pl.when.

This replaces the reference's FasterTransformer decode attention
(``awq_ft_ext.single_query_attention``, quick/awq/modules/fused/attn.py:
211-230) — which reads a dense padded cache — with a paged-native design.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _paged_kernel(
    bt_ref, len_ref,                  # SMEM: [B, n_pt], [B]
    q_ref, slope_ref,                 # VMEM: [spb,Hq,D], [Hq,1]
    hm_ref, pr_ref,                   # VMEM: [Hq, T] int8 static
                                      # block-diagonal head mask;
                                      # [8, T] int32 in-page position row
                                      # (row 0 real) — constants hoisted
                                      # out of the per-step iota/mod work
    *rest,                            # spb x ppb x (k_ref, v_ref
                                      # [1,1,Hkv,page,D]), then spb x ppb x
                                      # (sc_ref [1,1,8,Hkv*page] f32 — the
                                      # page's own shared scale tile,
                                      # row 0 = k / row 1 = v) if
                                      # quantized, then o_ref, m/l/acc
                                      # scratch ([spb*Hq, .])
    page: int, gq: int, hkv: int, scale: float, use_alibi: bool,
    quantized: bool, ppb: int, window: int, spb: int, softcap: float,
):
    kv_refs = rest[: 2 * spb * ppb]
    rest = rest[2 * spb * ppb :]
    if quantized:
        sc_refs = rest[: spb * ppb]
        sq_ref = rest[spb * ppb]          # [spb, Hq, 1] f32 per-head q scale
        rest = rest[spb * ppb + 1 :]
    else:
        sc_refs = (None,) * (spb * ppb)
        sq_ref = None
    o_ref, m_scr, l_scr, acc_scr = rest
    b = pl.program_id(0)
    i = pl.program_id(1)
    hq = hkv * gq
    T = hkv * page

    @pl.when(i == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    # spb slots x ppb pages per grid step: the kernel is STEP-OVERHEAD
    # bound at serving contexts (~2 us/step fixed cost vs ~0.3 us of DMA
    # at page blocks this size) — fatter steps amortize it along both the
    # slot and the page axis.
    # sliding window (mistral): the single decode query sits at position
    # length-1; only keys with pos > length-1-window are visible. Steps
    # whose whole page is below the window skip compute (their index maps
    # clamp to the first in-window page, so the DMA is elided too).
    for s_i in range(spb):
        length = len_ref[b * spb + s_i]
        lo = length - window if window else jnp.zeros((), jnp.int32)
        msl = slice(s_i * hq, (s_i + 1) * hq)
        for j in range(ppb):
            k_ref = kv_refs[2 * (s_i * ppb + j)]
            v_ref = kv_refs[2 * (s_i * ppb + j) + 1]
            sc_ref = sc_refs[s_i * ppb + j]
            base = (i * ppb + j) * page

            @pl.when(jnp.logical_and(base < length, base + page > lo))
            def _compute(k_ref=k_ref, v_ref=v_ref, sc_ref=sc_ref,
                         s_i=s_i, msl=msl, base=base, length=length, lo=lo):
                q = q_ref[s_i]                               # [Hq, D]
                k = k_ref[0, 0].reshape(T, -1)               # [Hkv*page, D]
                # ONE MXU-shaped dot for all heads; cross-head products are
                # removed by a static block-diagonal mask (rows
                # h*gq..(h+1)*gq attend only to columns h*page..(h+1)*page).
                # INT8 KV: q arrives pre-quantized (int8 codes + per-head
                # scale in sq_ref) and the score dot runs int8 x int8 ->
                # int32 on the MXU — converting k to bf16 in-kernel costs a
                # [T, D] VPU pass + relayout per page, which made INT8
                # SLOWER than bf16 despite half the bytes; int8 dots remove
                # both converts (the A8 GEMM kernel's approach applied to
                # attention)
                s = jax.lax.dot_general(
                    q, k, (((1,), (1,)), ((), ())),
                    preferred_element_type=(
                        jnp.int32 if quantized else jnp.float32
                    ),
                )                                            # [Hq, Hkv*page]
                if quantized:
                    # the scale block is the page's OWN shared [8, T] tile
                    # (modules/paged_cache.py): row 0 is the flat
                    # (head, token) k-scale row, row 1 the v-scale row —
                    # one DMA covers both
                    ks_row = sc_ref[0, 0, 0:1, :]            # [1, T]
                    s = s.astype(jnp.float32) * (
                        sq_ref[s_i] * scale
                    ) * ks_row
                else:
                    s = s * scale
                if softcap:
                    # gemma2 logit cap on the fully scaled scores, BEFORE
                    # bias/mask (ops/attention.py:87-89's order)
                    s = softcap * jnp.tanh(s * (1.0 / softcap))
                pos_k = base + pr_ref[0:1, :]            # [1, T]
                mask = jnp.logical_and(
                    hm_ref[...] != 0, pos_k < length
                )                                        # [Hq, T]
                if window:
                    mask = jnp.logical_and(mask, pos_k >= lo)
                if use_alibi:
                    s = s + slope_ref[:] * (
                        pos_k - (length - 1)
                    ).astype(jnp.float32)
                s = jnp.where(mask, s, NEG_INF)
                m_prev = m_scr[msl]
                m_new = jnp.maximum(
                    m_prev, jnp.max(s, axis=-1, keepdims=True)
                )
                p = jnp.where(mask, jnp.exp(s - m_new), 0.0)
                alpha = jnp.exp(m_prev - m_new)
                l_scr[msl] = l_scr[msl] * alpha + jnp.sum(
                    p, axis=-1, keepdims=True
                )
                v = v_ref[0, 0].reshape(T, -1)               # [Hkv*page, D]
                if quantized:
                    # fold v's per-row scales into the probabilities, then
                    # dynamically quantize the scaled probabilities per
                    # head row so the context dot also runs int8 x int8
                    # (adds one ~0.8%-of-rowmax rounding on attention
                    # weights — same order as the KV codes' own rounding)
                    p = p * sc_ref[0, 0, 1:2, :]
                    pmax = jnp.maximum(
                        jnp.max(jnp.abs(p), axis=-1, keepdims=True), 1e-30
                    )
                    ps = pmax / 127.0                        # [Hq, 1]
                    p8 = jnp.clip(
                        jnp.round(p / ps), -127, 127
                    ).astype(jnp.int8)
                    ctx = jax.lax.dot_general(
                        p8, v, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32,
                    ).astype(jnp.float32) * ps
                else:
                    ctx = jax.lax.dot_general(
                        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                acc_scr[msl] = acc_scr[msl] * alpha + ctx
                m_scr[msl] = m_new

    @pl.when(i == pl.num_programs(1) - 1)
    def _finish():
        l = l_scr[:]
        acc = acc_scr[:] / jnp.where(l == 0.0, 1.0, l)
        o_ref[...] = acc.reshape(spb, hq, -1).astype(o_ref.dtype)


def _paged_chunk_kernel(
    bt_ref, len_ref,                  # SMEM: [B, n_pt], [B] chunk STARTS
    q_ref, slope_ref,                 # VMEM: [1,S,Hq,D], [S*Hq,1]
    *rest,                            # ppb x (k_ref, v_ref) then ppb x
                                      # sc_ref (shared k/v scale tile) if
                                      # quantized, then o_ref, m/l/acc
                                      # scratch
    page: int, gq: int, hkv: int, S: int, scale: float, use_alibi: bool,
    quantized: bool, ppb: int, window: int, softcap: float,
):
    kv_refs = rest[: 2 * ppb]
    rest = rest[2 * ppb :]
    if quantized:
        sc_refs = rest[:ppb]
        rest = rest[ppb:]
    else:
        sc_refs = (None,) * ppb
    o_ref, m_scr, l_scr, acc_scr = rest
    b = pl.program_id(0)
    i = pl.program_id(1)
    start = len_ref[b]          # tokens cached BEFORE this chunk
    cap = start + S             # chunk tokens (junk rows incl.) are written
    hq = hkv * gq
    R = S * hq
    T = hkv * page

    @pl.when(i == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    # earliest visible key: window binds per query row (pos_k > pos_q - w);
    # the loosest row is the chunk's first query at pos start
    lo = (
        jnp.maximum(start - window + 1, 0) if window
        else jnp.zeros((), jnp.int32)
    )
    for j in range(ppb):
        k_ref, v_ref = kv_refs[2 * j], kv_refs[2 * j + 1]
        sc_ref = sc_refs[j]
        base = (i * ppb + j) * page

        @pl.when(jnp.logical_and(base < cap, base + page > lo))
        def _compute(k_ref=k_ref, v_ref=v_ref, sc_ref=sc_ref, base=base):
            q = q_ref[0].reshape(R, -1)                  # leading merge: free
            k = k_ref[0, 0].reshape(T, -1)
            if quantized:
                # one [T, D] convert per page: int8 codes are exact in
                # bf16, and unlike decode (Hq rows) the chunk dot is big
                # enough to amortize the VPU pass — no q-quantization
                # plumbing needed
                k = k.astype(jnp.bfloat16)
            s = jax.lax.dot_general(
                q.astype(k.dtype), k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale                                    # [R, T]
            if quantized:
                s = s * sc_ref[0, 0, 0:1, :]             # per-key scales
            if softcap:
                # gemma2 logit cap: after ALL score scaling, before
                # bias/mask (ops/attention.py:87-89's order)
                s = softcap * jnp.tanh(s * (1.0 / softcap))
            row = jax.lax.broadcasted_iota(jnp.int32, (R, T), 0)
            col = jax.lax.broadcasted_iota(jnp.int32, (R, T), 1)
            pos_q = start + row // hq                    # rows are c-major
            head_q = (row % hq) // gq
            head_k = col // page
            pos_k = base + col % page
            mask = jnp.logical_and(head_q == head_k, pos_k <= pos_q)
            if window:
                mask = jnp.logical_and(mask, pos_k > pos_q - window)
            if use_alibi:
                s = s + slope_ref[:] * (pos_k - pos_q).astype(jnp.float32)
            s = jnp.where(mask, s, NEG_INF)
            m_prev = m_scr[:]
            m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
            p = jnp.where(mask, jnp.exp(s - m_new), 0.0)
            alpha = jnp.exp(m_prev - m_new)
            l_scr[:] = l_scr[:] * alpha + jnp.sum(p, axis=-1, keepdims=True)
            v = v_ref[0, 0].reshape(T, -1)
            if quantized:
                # fold v's per-row scales into the probabilities (ctx =
                # (p * vs) @ v), then one bf16 context dot
                p = p * sc_ref[0, 0, 1:2, :]
                v = v.astype(jnp.bfloat16)
            ctx = jax.lax.dot_general(
                p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc_scr[:] = acc_scr[:] * alpha + ctx
            m_scr[:] = m_new

    @pl.when(i == pl.num_programs(1) - 1)
    def _finish():
        l = l_scr[:]
        acc = acc_scr[:] / jnp.where(l == 0.0, 1.0, l)
        o_ref[0] = acc.reshape(S, hq, -1).astype(o_ref.dtype)


def supports_chunk(S: int, Hq: int, Hkv: int, page: int) -> bool:
    """VMEM feasibility for paged_chunk_attention: the [S*Hq, Hkv*page]
    score/probability/mask temps (plus the f32 accumulator) must fit the
    ~16MB VMEM scope with room for double-buffered page blocks."""
    R, T = S * Hq, Hkv * page
    return R >= 8 and R * T * 4 * 6 <= 8 * 1024 * 1024


@functools.partial(
    jax.jit,
    static_argnames=("layer", "scale", "interpret", "window", "logit_softcap"),
)
def paged_chunk_attention(
    q: jax.Array,            # [B, S, Hq, D] one CHUNK of queries per slot
    k_pages: jax.Array,      # [L, P, Hkv, page, D] page stack
    v_pages: jax.Array,
    block_table: jax.Array,  # [B, n_pt] int32 physical page ids
    starts: jax.Array,       # [B] int32 tokens cached BEFORE this chunk
    layer: int = 0,
    scale: Optional[float] = None,
    alibi_slopes: Optional[jax.Array] = None,
    kv_scales: Optional[jax.Array] = None,  # [L, P, 8, Hkv*page] f32 when
    # INT8 — the shared per-page tile (row 0 = k, row 1 = v scales)
    window: Optional[int] = None,
    logit_softcap: Optional[float] = None,  # gemma2 cap*tanh(s/cap)
    interpret: bool = False,
) -> jax.Array:
    """Chunked-prefill attention directly over KV pages — [B, S, Hq, D].

    The serving engine's mixed prefill+decode step previously read context
    through the dense ``cache.layer()`` gather, which materializes (and for
    INT8 dequantizes) the ENTIRE page pool per layer — 0.5-1GB of HBM temp
    traffic per layer at 256 slots, the allocation that OOM'd 256-slot
    serving. This kernel is the decode kernel's shape generalized to S
    query rows per slot: the chunk rides as one [S*Hq, D] q block
    (c-major rows), scores for a page are one MXU dot with the causal /
    window / head-block masks built from per-row positions, and pages past
    a slot's ``start + S`` clamp their index maps so the DMA is elided.
    The chunk's own K/V must already be written into the pages (the cache
    updates before attention), junk rows past a slot's true valid count
    are causally invisible to real rows and get discarded by the engine.
    Replaces the reference's dense-cache context GEMM in chunked serving
    (no reference analog — its cache is dense fp16, quick/awq/modules/
    fused/cache.py)."""
    single_layer = k_pages.ndim == 4
    if single_layer:
        k_pages, v_pages = k_pages[None], v_pages[None]
        layer = 0
    B, S, Hq, D = q.shape
    _, P, Hkv, page, _ = k_pages.shape
    n_pt = block_table.shape[1]
    gq = Hq // Hkv
    if scale is None:
        scale = D ** -0.5
    use_alibi = alibi_slopes is not None
    quantized = kv_scales is not None
    if quantized and single_layer:
        kv_scales = kv_scales.reshape(1, P, 8, Hkv * page)
    R = S * Hq
    # per-row alibi slopes, tiled over the chunk's c-major row order
    slopes = (
        jnp.tile(
            jnp.asarray(alibi_slopes, jnp.float32).reshape(Hq, 1), (S, 1)
        )
        if use_alibi else jnp.zeros((R, 1), jnp.float32)
    )

    import os

    env_ppb = int(os.environ.get("QUICK_TPU_PPB", "0"))
    kv_step_bytes = 2 * Hkv * page * D * k_pages.dtype.itemsize
    if env_ppb > 0 and n_pt % env_ppb == 0:
        ppb = env_ppb
    else:
        ppb = 1
        for cand in (8, 4, 2):
            if n_pt % cand == 0 and cand * kv_step_bytes <= 2 * 1024 * 1024:
                ppb = cand
                break
    win = int(window) if window else 0

    def kv_index_j(j):
        def kv_index(b, i, bt, ln):
            # last written page (chunk tokens included), clamped to the
            # table edge — overflow writes land on the trash page and the
            # position mask keeps them invisible
            last = jnp.minimum((ln[b] + S - 1) // page, n_pt - 1)
            idx = jnp.minimum(i * ppb + j, last)
            if win:
                first = jnp.maximum(ln[b] - win + 1, 0) // page
                idx = jnp.maximum(idx, first)
            return (layer, bt[b, idx], 0, 0, 0)
        return kv_index

    in_specs = [
        pl.BlockSpec((1, S, Hq, D), lambda b, i, bt, ln: (b, 0, 0, 0)),
        pl.BlockSpec((R, 1), lambda b, i, bt, ln: (0, 0)),
    ]
    inputs = [q, slopes]
    for j in range(ppb):
        in_specs += [
            pl.BlockSpec((1, 1, Hkv, page, D), kv_index_j(j)),
            pl.BlockSpec((1, 1, Hkv, page, D), kv_index_j(j)),
        ]
        inputs += [k_pages, v_pages]
    T = Hkv * page
    if quantized:
        def scale_index_j(j):
            def scale_index(b, i, bt, ln):
                last = jnp.minimum((ln[b] + S - 1) // page, n_pt - 1)
                idx = jnp.minimum(i * ppb + j, last)
                if win:
                    first = jnp.maximum(ln[b] - win + 1, 0) // page
                    idx = jnp.maximum(idx, first)
                return (layer, bt[b, idx], 0, 0)
            return scale_index

        for j in range(ppb):
            in_specs += [
                pl.BlockSpec((1, 1, 8, T), scale_index_j(j)),
            ]
            inputs += [kv_scales]

    scratch_shapes = [
        pltpu.VMEM((R, 1), jnp.float32),
        pltpu.VMEM((R, 1), jnp.float32),
        pltpu.VMEM((R, D), jnp.float32),
    ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, n_pt // ppb),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, S, Hq, D), lambda b, i, bt, ln: (b, 0, 0, 0)
        ),
        scratch_shapes=scratch_shapes,
    )
    out = pl.pallas_call(
        functools.partial(
            _paged_chunk_kernel, page=page, gq=gq, hkv=Hkv, S=S,
            scale=float(scale), use_alibi=use_alibi, quantized=quantized,
            ppb=ppb, window=win,
            softcap=float(logit_softcap) if logit_softcap else 0.0,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, S, Hq, D), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")
        ),
        interpret=interpret,
    )(block_table.astype(jnp.int32), starts.astype(jnp.int32), *inputs)
    return out


@functools.partial(
    jax.jit,
    static_argnames=("layer", "scale", "interpret", "window", "logit_softcap"),
)  # quantized-ness is static via kv_scales None-ness (jit re-traces)
def paged_decode_attention(
    q: jax.Array,            # [B, Hq, D] one decode step's queries
    k_pages: jax.Array,      # [L, P, Hkv, page, D] page stack — or a single
    v_pages: jax.Array,      # layer's [P, Hkv, page, D] (wrapped as L=1)
    block_table: jax.Array,  # [B, n_pt] int32 physical page ids
    lengths: jax.Array,      # [B] int32 valid tokens per slot (incl. current)
    layer: int = 0,
    scale: Optional[float] = None,
    alibi_slopes: Optional[jax.Array] = None,
    kv_scales: Optional[jax.Array] = None,  # [L, P, 8, Hkv*page] f32 shared
    # per-page scale tile (row 0 = k, row 1 = v; see paged_cache) when INT8
    window: Optional[int] = None,  # sliding window (mistral): only keys
    # with pos > length-1-window visible; pages fully below skip DMA+compute
    logit_softcap: Optional[float] = None,  # gemma2 cap*tanh(s/cap)
    interpret: bool = False,
) -> jax.Array:
    """Returns [B, Hq, D]. The current step's K/V must already be written
    into the pages (the cache updates before attention).

    Pass the whole page/scale stacks plus ``layer`` (NOT pre-sliced layers)
    when calling from a model step: a sliced custom-call operand makes XLA
    materialize a copy of the slice per layer per step (see
    ops/decode_attention.py)."""
    single_layer = k_pages.ndim == 4
    if single_layer:
        k_pages, v_pages = k_pages[None], v_pages[None]
        layer = 0
    B, Hq, D = q.shape
    _, P, Hkv, page, _ = k_pages.shape
    n_pt = block_table.shape[1]
    gq = Hq // Hkv
    if scale is None:
        scale = D ** -0.5
    use_alibi = alibi_slopes is not None
    quantized = kv_scales is not None
    if quantized and single_layer:
        kv_scales = kv_scales.reshape(1, P, 8, Hkv * page)
    # slopes ride in VMEM as [Hq, 1] (read whole once per step, broadcast
    # along lanes) — not reassembled from SMEM scalars in the hot loop
    slopes = (
        jnp.asarray(alibi_slopes, jnp.float32).reshape(Hq, 1) if use_alibi
        else jnp.zeros((Hq, 1), jnp.float32)
    )

    # pages per grid step: fewer, fatter steps amortize the per-step
    # overhead — the kernel is step-overhead bound at serving contexts
    # (128 slots x 4 pages: 282 us/step at ppb=2 vs the 74-143 us the
    # byte count implies). Largest divisor of the table width whose
    # per-step KV block stays within ~2MB of VMEM; QUICK_TPU_PPB forces.
    import os

    env_ppb = int(os.environ.get("QUICK_TPU_PPB", "0"))
    if env_ppb > 0 and n_pt % env_ppb == 0:
        ppb = env_ppb
    else:
        # fatter steps amortize per-step overhead (bf16: 308/281/263 us at
        # ppb=1/2/4; int8 with per-page scale tiles: 320/283/273 — the old
        # flat-group scale blocks serialized fatter int8 steps, the
        # replicated per-page tiles do not)
        kv_step_bytes = 2 * Hkv * page * D * k_pages.dtype.itemsize
        ppb = 1
        for cand in (8, 4, 2):
            if n_pt % cand == 0 and cand * kv_step_bytes <= 2 * 1024 * 1024:
                ppb = cand
                break

    win = int(window) if window else 0

    # slots per grid step (QUICK_TPU_SPB, default 1): fatter steps along
    # the SLOT axis, the slot analog of ppb. MEASURED NEUTRAL at the
    # serving configs (128 slots, page 64/128: 237 us/layer at spb=1 AND
    # spb=4; spb=8 exceeds the 16MB VMEM scope) — the kernel's ~4x-over-
    # byte-floor cost is per-DMA / per-slot compute, not per-grid-step
    # fixed overhead, so amortizing steps does not help. Kept as a tuning
    # knob for other geometries.
    env_spb = int(os.environ.get("QUICK_TPU_SPB", "0"))
    spb = env_spb if env_spb > 0 and B % env_spb == 0 else 1

    def kv_index_sj(s, j):
        def kv_index(b, i, bt, ln):
            # clamp steps outside [first in-window page, last valid page]:
            # repeated block index -> Mosaic skips the DMA re-issue
            slot = b * spb + s
            last = jnp.maximum(ln[slot] - 1, 0) // page
            idx = jnp.minimum(i * ppb + j, last)
            if win:
                first = jnp.maximum(ln[slot] - win, 0) // page
                idx = jnp.maximum(idx, first)
            return (layer, bt[slot, idx], 0, 0, 0)
        return kv_index

    if quantized:
        # pre-quantize the queries per head (int8 codes + scale): the
        # in-kernel score dot then runs int8 x int8 -> int32 on the MXU
        # with no per-page [T, D] k convert (see _paged_kernel)
        qf = q.astype(jnp.float32)
        sq = jnp.maximum(
            jnp.max(jnp.abs(qf), axis=-1, keepdims=True), 1e-30
        ) / 127.0                                        # [B, Hq, 1]
        q_in = jnp.clip(jnp.round(qf / sq), -127, 127).astype(jnp.int8)
    else:
        q_in, sq = q, jnp.zeros((B, Hq, 1), jnp.float32)
    # static mask constants: the block-diagonal head mask and in-page
    # position row, built once host-side — replaces 3 per-step [Hq, T]
    # iota + mod/div passes in the kernel (the masks are the only
    # non-DMA, non-dot VPU work per page)
    import numpy as _np

    T = Hkv * page
    hm = jnp.asarray(
        (_np.arange(Hq)[:, None] // gq)
        == (_np.arange(T)[None, :] // page),
        jnp.int8,
    )
    pr = jnp.asarray(
        _np.broadcast_to(_np.arange(T) % page, (8, T)).astype(_np.int32)
    )
    in_specs = [
        pl.BlockSpec((spb, Hq, D), lambda b, i, bt, ln: (b, 0, 0)),
        pl.BlockSpec((Hq, 1), lambda b, i, bt, ln: (0, 0)),
        pl.BlockSpec((Hq, T), lambda b, i, bt, ln: (0, 0)),
        pl.BlockSpec((8, T), lambda b, i, bt, ln: (0, 0)),
    ]
    inputs = [q_in, slopes, hm, pr]
    for s in range(spb):
        for j in range(ppb):
            in_specs += [
                pl.BlockSpec((1, 1, Hkv, page, D), kv_index_sj(s, j)),
                pl.BlockSpec((1, 1, Hkv, page, D), kv_index_sj(s, j)),
            ]
            inputs += [k_pages, v_pages]
    if quantized:
        # each scale block is the page's OWN shared [8, T] tile (row 0 =
        # k scales, row 1 = v; legal Mosaic block, same index map as the
        # kv blocks) — ONE DMA covers both planes' scales for the page,
        # and the decode write RMWs the same blocks collision-free
        # (ops/paged_write.py)
        def scale_index_sj(s, j):
            def scale_index(b, i, bt, ln):
                slot = b * spb + s
                last = jnp.maximum(ln[slot] - 1, 0) // page
                idx = jnp.minimum(i * ppb + j, last)
                if win:
                    first = jnp.maximum(ln[slot] - win, 0) // page
                    idx = jnp.maximum(idx, first)
                return (layer, bt[slot, idx], 0, 0)
            return scale_index

        for s in range(spb):
            for j in range(ppb):
                in_specs += [
                    pl.BlockSpec((1, 1, 8, T), scale_index_sj(s, j)),
                ]
                inputs += [kv_scales]
        in_specs.append(
            pl.BlockSpec((spb, Hq, 1), lambda b, i, bt, ln: (b, 0, 0))
        )
        inputs.append(sq)

    scratch_shapes = [
        pltpu.VMEM((spb * Hq, 1), jnp.float32),
        pltpu.VMEM((spb * Hq, 1), jnp.float32),
        pltpu.VMEM((spb * Hq, D), jnp.float32),
    ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B // spb, n_pt // ppb),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (spb, Hq, D), lambda b, i, bt, ln: (b, 0, 0)
        ),
        scratch_shapes=scratch_shapes,
    )
    out = pl.pallas_call(
        functools.partial(
            _paged_kernel, page=page, gq=gq, hkv=Hkv, scale=float(scale),
            use_alibi=use_alibi, quantized=quantized, ppb=ppb, window=win,
            spb=spb,
            softcap=float(logit_softcap) if logit_softcap else 0.0,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, Hq, D), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")
        ),
        interpret=interpret,
    )(block_table.astype(jnp.int32), lengths.astype(jnp.int32), *inputs)
    return out
