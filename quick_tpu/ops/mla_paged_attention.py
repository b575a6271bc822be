"""Paged MLA decode attention (DeepSeek-V2/V3) — Pallas TPU kernel.

The MLA latent cache (modules/mla.py, modules/paged_cache.py with
asymmetric planes) turns decode attention into MQA over ONE shared token
stream: per head, scores are ``q_c . c + q_pe . k_pe`` (the absorbed
formulation) and the context is ``probs @ c`` — the latent IS the value.
The XLA baseline gathers the whole [B, max_seq, R] latent per layer per
step (paged_cache.layer); this kernel reads pages directly, like
ops/paged_attention.py:

- block table + per-slot lengths scalar-prefetched into SMEM drive the
  BlockSpec index maps: each grid step DMAs one physical page of BOTH
  planes — [page, R] latent + [page, dr] rope — for one slot;
- steps past a slot's length clamp to the last valid page (Mosaic elides
  the repeated DMA) and skip compute with @pl.when;
- online softmax in VMEM scratch across the page steps;
- INT8 pages: codes convert exactly to bf16, the per-token scales fold
  into score columns / probability rows AFTER the dots (same output-side
  trick as the W4A16 GEMM and the standard paged kernel).

All heads share the page, so every dot is a single MXU-shaped matmul
([Hq, R] x [R, page]) — no per-head loop, no block-diagonal masking.

No reference analog: SqueezeBits/QUICK has no DeepSeek/MLA support at all
(its decode attention is the dense-cache FasterTransformer call,
quick/awq/modules/fused/attn.py:211-230).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _mla_paged_kernel(
    bt_ref, len_ref,            # SMEM: [B, n_pt], [B]
    qc_ref, qpe_ref,            # VMEM: [1, Hq, R], [1, Hq, dr]
    *rest,                      # ppb x (kpe_ref [1,1,1,page,dr],
                                #        c_ref   [1,1,1,page,R]),
                                # then ppb x sc_ref [1,1,8,page] f32 — the
                                # page's shared scale tile (row 0 = kpe
                                # scales, row 1 = latent scales) if
                                # quantized, then o_ref, m/l/acc scratch
    page: int, scale: float, quantized: bool, ppb: int,
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
    length = len_ref[b]

    @pl.when(i == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    for j in range(ppb):
        kpe_ref, c_ref = kv_refs[2 * j], kv_refs[2 * j + 1]
        sc_ref = sc_refs[j]
        base = (i * ppb + j) * page

        @pl.when(base < length)
        def _compute(kpe_ref=kpe_ref, c_ref=c_ref, sc_ref=sc_ref,
                     j=j, base=base):
            qc = qc_ref[0]                      # [Hq, R]
            qpe = qpe_ref[0]                    # [Hq, dr]
            c = c_ref[0, 0, 0]                  # [page, R]
            kpe = kpe_ref[0, 0, 0]              # [page, dr]
            if quantized:
                c = c.astype(jnp.bfloat16)
                kpe = kpe.astype(jnp.bfloat16)
            # MQA: one MXU dot per stream for ALL heads
            s_c = jax.lax.dot_general(
                qc, c, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                                   # [Hq, page]
            s_pe = jax.lax.dot_general(
                qpe, kpe, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            if quantized:
                # per-token column scales from the page's own shared
                # [8, page] tile: row 0 = kpe, row 1 = latent
                # (modules/paged_cache.py)
                ks = sc_ref[0, 0, 0:1, :]       # [1, page]
                cs = sc_ref[0, 0, 1:2, :]
                s = (s_c * cs + s_pe * ks) * scale
            else:
                s = (s_c + s_pe) * scale
            pos = base + jax.lax.broadcasted_iota(
                jnp.int32, s.shape, 1
            ) % page
            mask = pos < length
            s = jnp.where(mask, s, NEG_INF)
            m_prev = m_scr[:]
            m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
            p = jnp.where(mask, jnp.exp(s - m_new), 0.0)
            alpha = jnp.exp(m_prev - m_new)
            l_scr[:] = l_scr[:] * alpha + jnp.sum(p, axis=-1, keepdims=True)
            if quantized:
                # context reads the latent again: fold its scales into probs
                p = p * cs
            acc_scr[:] = acc_scr[:] * alpha + jax.lax.dot_general(
                p.astype(c.dtype), c, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            m_scr[:] = m_new

    @pl.when(i == pl.num_programs(1) - 1)
    def _finish():
        l = l_scr[:]
        o_ref[0] = (acc_scr[:] / jnp.where(l == 0.0, 1.0, l)).astype(
            o_ref.dtype
        )


@functools.partial(jax.jit, static_argnames=("layer", "scale", "interpret"))
def mla_paged_decode_attention(
    q_c: jax.Array,           # [B, Hq, R] absorbed nope queries (q_nope@W_UK)
    q_pe: jax.Array,          # [B, Hq, dr] rope'd positional queries
    kpe_pages: jax.Array,     # [L, P, 1, page, dr] — cache.k_pages
    c_pages: jax.Array,       # [L, P, 1, page, R]  — cache.v_pages (latent)
    block_table: jax.Array,   # [B, n_pt] int32
    lengths: jax.Array,       # [B] int32 valid tokens (incl. current)
    layer: int,
    scale: float,             # mla_softmax_scale(cfg) — includes the
                              # deepseek-yarn mscale^2 correction
    kv_scales: Optional[jax.Array] = None,  # [L, P, 8, page] f32 shared
                              # scale tiles when INT8 (row 0 = kpe
                              # scales, row 1 = latent scales)
    interpret: bool = False,
) -> jax.Array:
    """Returns the latent-space context [B, Hq, R]; the caller re-projects
    through W_UV (modules/mla.py). Pass the WHOLE page/scale stacks plus
    ``layer`` — pre-sliced custom-call operands are materialized as copies
    per layer per step (ops/decode_attention.py)."""
    B, Hq, R = q_c.shape
    dr = q_pe.shape[-1]
    _, P, _, page, _ = kpe_pages.shape
    n_pt = block_table.shape[1]
    quantized = kv_scales is not None

    ppb = 2 if n_pt % 2 == 0 and n_pt > 1 else 1

    def kv_index_j(j):
        def kv_index(b, i, bt, ln):
            last = jnp.maximum(ln[b] - 1, 0) // page
            return (layer, bt[b, jnp.minimum(i * ppb + j, last)], 0, 0, 0)
        return kv_index

    in_specs = [
        pl.BlockSpec((1, Hq, R), lambda b, i, bt, ln: (b, 0, 0)),
        pl.BlockSpec((1, Hq, dr), lambda b, i, bt, ln: (b, 0, 0)),
    ]
    inputs = [q_c, q_pe]
    for j in range(ppb):
        in_specs += [
            pl.BlockSpec((1, 1, 1, page, dr), kv_index_j(j)),
            pl.BlockSpec((1, 1, 1, page, R), kv_index_j(j)),
        ]
        inputs += [kpe_pages, c_pages]
    if quantized:
        def scale_index_j(j):
            def scale_index(b, i, bt, ln):
                last = jnp.maximum(ln[b] - 1, 0) // page
                return (layer, bt[b, jnp.minimum(i * ppb + j, last)], 0, 0)
            return scale_index

        for j in range(ppb):
            in_specs += [
                pl.BlockSpec((1, 1, 8, page), scale_index_j(j)),
            ]
            inputs += [kv_scales]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, n_pt // ppb),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, Hq, R), lambda b, i, bt, ln: (b, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((Hq, 1), jnp.float32),
            pltpu.VMEM((Hq, 1), jnp.float32),
            pltpu.VMEM((Hq, R), jnp.float32),
        ],
    )
    return pl.pallas_call(
        functools.partial(
            _mla_paged_kernel, page=page, scale=float(scale),
            quantized=quantized, ppb=ppb,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, Hq, R), q_c.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")
        ),
        interpret=interpret,
    )(block_table.astype(jnp.int32), lengths.astype(jnp.int32), *inputs)
