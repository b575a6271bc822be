"""Grouped (ragged) W4A16 matmul — MoE expert dispatch without dense waste.

The reference runs Mixtral experts as plain per-expert HF modules on one
GPU, every routed expert over the WHOLE token batch
(reference quick/awq/models/mixtral.py:58-74, modules/fused/block.py:21-34).
This framework's original dense dispatch did the TPU analog (one big
einsum over all E experts); at engine batch (128 tokens, 60 experts
top-4) that computes ~15x the routed FLOPs — measured 62.6 ms/step on
Qwen1.5-MoE-A2.7B shapes.

TPU-native fix (megablocks-style grouped GEMM, re-derived for the QTPU
int4 layout): sort the (token, expert) pairs by expert, pad each expert's
segment to an ``bm``-row tile, and run ONE Pallas kernel whose m-tiles
each carry a scalar-prefetched expert id — the BlockSpec index map steers
the int4 weight/scale DMA to that expert's slabs. Compute and weight
traffic scale with ROUTED tokens (plus tile padding), not with E x T:

- every m-tile streams exactly one expert's packed weights;
- experts with no routed tokens get no tiles, so their weights never
  leave HBM (the bs=1 cond-gated skip generalizes for free);
- the static row budget is min(T*topk + E*(bm-1), T*topk*bm) rounded up
  to bm — at decode (T*topk small) that collapses to a handful of tiles.

Numerics are identical to ops/quantized_matmul._make_kernel: per-group
integer bf16 dot, OUTPUT-side scaling, factored zero-point rowsum, f32
accumulation over the K grid dimension.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from quick_tpu.ops.quantized_matmul import (
    PACK,
    _impl_mode,
    _pick_bn,
    _pick_gpb,
    quantize_activations,
    unpack_qtpu_jax,
)


def _make_grouped_kernel(gpb: int, slab: int, bn: int):
    """One (bm, bn) output tile of the sorted token buffer, stepping gpb
    quant groups of the tile's expert per K-step. te_ref is the
    scalar-prefetched [n_tiles] expert-id vector (it already steered the
    BlockSpecs); live_ref flags tiles past the last routed segment —
    those skip the unpack/dot work entirely (their rows are never read
    back; at the worst static budget ~25% of m-steps are dead)."""

    def kernel(te_ref, live_ref, x_ref, qw_ref, s_ref, zs_ref, o_ref, acc):
        i = pl.program_id(0)
        k = pl.program_id(2)
        live = live_ref[i] != 0

        @pl.when(live)
        def _():
            @pl.when(k == 0)
            def _():
                acc[:] = jnp.zeros_like(acc)

            part = jnp.zeros_like(acc)
            for g in range(gpb):  # static unroll over groups in this step
                qg = qw_ref[0, g * slab : (g + 1) * slab, :]  # [slab, bn]
                nib = [(qg >> (4 * j)) & 0xF for j in range(PACK)]
                wg = jnp.concatenate(nib, axis=0).astype(jnp.bfloat16)
                xg = x_ref[:, g * (slab * PACK) : (g + 1) * (slab * PACK)]
                y = jnp.dot(xg, wg, preferred_element_type=jnp.float32)
                xsum = jnp.sum(
                    xg.astype(jnp.float32), axis=1, keepdims=True
                )
                part += y * s_ref[0, g, :, :] - zs_ref[0, g, :, :] * xsum
            acc[:] += part

            @pl.when(k == pl.num_programs(2) - 1)
            def _():
                o_ref[:] = acc[:].astype(o_ref.dtype)

        @pl.when(jnp.logical_and(
            jnp.logical_not(live), k == pl.num_programs(2) - 1
        ))
        def _():
            o_ref[:] = jnp.zeros_like(o_ref)

    return kernel


def _make_grouped_kernel_a8(gpb: int, slab: int, bn: int):
    """W4A8 variant of _make_grouped_kernel: activations arrive as
    per-row INT8 codes and the per-group dot runs int8 x int8 -> int32
    on the MXU at 2x the bf16 rate — the grouped MoE step is
    MXU-pass-bound (an expert visit costs a full 128-row weight pass
    whatever the tile height), so the int8 rate halves the visit floor.
    The per-row activation scale multiplies OUTSIDE the kernel (a [Mp,1]
    scale input would pad its lane dim 128x physically — CLAUDE.md):

        out_kernel = sum_g (x8_g @ q8_g) * s_g - rowsum(x8_g) * (z_g*s_g)
        out        = sx * out_kernel   (XLA-fused epilogue)
    """

    def kernel(te_ref, live_ref, x_ref, qw_ref, s_ref, zs_ref, o_ref, acc):
        i = pl.program_id(0)
        k = pl.program_id(2)
        live = live_ref[i] != 0

        @pl.when(live)
        def _():
            @pl.when(k == 0)
            def _():
                acc[:] = jnp.zeros_like(acc)

            part = jnp.zeros_like(acc)
            for g in range(gpb):
                qg = qw_ref[0, g * slab : (g + 1) * slab, :]
                nib = [(qg >> (4 * j)) & 0xF for j in range(PACK)]
                wg = jnp.concatenate(nib, axis=0).astype(jnp.int8)
                xg = x_ref[:, g * (slab * PACK) : (g + 1) * (slab * PACK)]
                y = jnp.dot(xg, wg, preferred_element_type=jnp.int32)
                xsum = jnp.sum(
                    xg.astype(jnp.int32), axis=1, keepdims=True
                ).astype(jnp.float32)
                part += (
                    y.astype(jnp.float32) * s_ref[0, g, :, :]
                    - xsum * zs_ref[0, g, :, :]
                )
            acc[:] += part

            @pl.when(k == pl.num_programs(2) - 1)
            def _():
                o_ref[:] = acc[:].astype(o_ref.dtype)

        @pl.when(jnp.logical_and(
            jnp.logical_not(live), k == pl.num_programs(2) - 1
        ))
        def _():
            o_ref[:] = jnp.zeros_like(o_ref)

    return kernel


def _grouped_fallback(
    x: jax.Array,            # [Mp, K]
    qweight: jax.Array,      # [E, K//8, N]
    scales: jax.Array,       # [E, ng, N]
    zeros_x_scales: jax.Array,
    tile_expert: jax.Array,  # [n_tiles]
    tile_live: jax.Array,    # [n_tiles] int32 0/1
    bm: int,
    group_size: int,
    out_dtype,
    a8: bool = False,
) -> jax.Array:
    """lax.map over m-tiles with a dynamic expert gather — the XLA path
    for CPU tests and float-free correctness checks. Same numerics
    contract as the kernels (integer bf16 — or int8 with per-row
    activation scales under ``a8`` — dots, f32 accumulation, output-side
    scaling, factored zp)."""
    Mp, K = x.shape
    N = qweight.shape[-1]
    ng = K // group_size
    if a8:
        xq, sx = quantize_activations(x)
        xt = xq.reshape(Mp // bm, bm, K)
    else:
        xt = x.astype(jnp.bfloat16).reshape(Mp // bm, bm, K)

    def one_tile(args):
        xtile, e, live = args
        nib = unpack_qtpu_jax(qweight[e], group_size)
        nib = nib.reshape(ng, group_size, N)
        xg = xtile.reshape(bm, ng, group_size)
        if a8:
            y = jnp.einsum(
                "mgk,gkn->gmn", xg, nib.astype(jnp.int8),
                preferred_element_type=jnp.int32,
            ).astype(jnp.float32)
            xsum = xg.astype(jnp.int32).sum(-1).astype(jnp.float32)
        else:
            y = jnp.einsum(
                "mgk,gkn->gmn", xg, nib.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
            )
            xsum = xg.astype(jnp.float32).sum(-1)
        y = (y * scales[e][:, None, :]).sum(0)
        # dead tiles (past the last routed segment) zero out to match the
        # kernel's skip path
        return (y - jnp.dot(xsum, zeros_x_scales[e])) * live

    out = jax.lax.map(
        one_tile, (xt, tile_expert, tile_live.astype(jnp.float32))
    ).reshape(Mp, N)
    if a8:
        out = out * sx
    return out.astype(out_dtype)


@functools.partial(
    jax.jit, static_argnames=("group_size", "out_dtype", "bm", "a8")
)
def quantized_matmul_grouped(
    x: jax.Array,            # [Mp, K] expert-sorted tokens (bm-tiled)
    qweight: jax.Array,      # [E, K//8, N] QTPU-packed per expert
    scales: jax.Array,       # [E, K//G, N] f32
    zeros_x_scales: jax.Array,  # [E, K//G, N] f32
    tile_expert: jax.Array,  # [Mp//bm] int32 expert id per m-tile
    bm: int,
    group_size: int = 128,
    out_dtype=jnp.bfloat16,
    tile_live: Optional[jax.Array] = None,  # [Mp//bm] int32 0/1: tiles
    # past the last routed segment skip their unpack/dot work (their
    # rows are never gathered back). None = all live.
    a8: bool = False,  # per-row INT8 activations: int8 x int8 MXU dots
    # at 2x the bf16 rate — the grouped MoE step is MXU-pass-bound, so
    # this halves the expert-visit floor; adds ~0.4%/value activation
    # rounding. Requires bm % 32 == 0 (int8 sublane tile) and g=128.
) -> jax.Array:
    """Ragged multi-expert ``x @ dequant(qweight[e])`` -> [Mp, N] where
    rows ``i*bm:(i+1)*bm`` use expert ``tile_expert[i]``'s weights."""
    Mp, K = x.shape
    E, _, N = qweight.shape
    G = group_size
    ng = K // G
    slab = G // PACK
    n_tiles = Mp // bm
    assert Mp % bm == 0
    if tile_live is None:
        tile_live = jnp.ones((n_tiles,), jnp.int32)
    if a8 and (G != 128 or bm % 32):
        a8 = False

    if _impl_mode() == "jnp" or G != 128:
        # small-group MoE (g != 128) stays on the XLA path — the grouped
        # kernel shares the factored form that needs slab >= 8
        return _grouped_fallback(
            x, qweight, scales, zeros_x_scales, tile_expert, tile_live,
            bm, G, out_dtype, a8=a8,
        )

    bn = _pick_bn(N)
    gpb = _pick_gpb(ng, G, bn, slab, bm)
    if ng % gpb:
        gpb = 1

    if a8:
        x, sx = quantize_activations(x)
    else:
        x = x.astype(jnp.bfloat16)
    s_in = scales.reshape(E, ng, 1, N)
    zs_in = zeros_x_scales.reshape(E, ng, 1, N)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles, N // bn, ng // gpb),
        in_specs=[
            pl.BlockSpec((bm, gpb * G), lambda i, j, k, te, lv: (i, k)),
            pl.BlockSpec(
                (1, gpb * slab, bn), lambda i, j, k, te, lv: (te[i], k, j)
            ),
            pl.BlockSpec(
                (1, gpb, 1, bn), lambda i, j, k, te, lv: (te[i], k, 0, j)
            ),
            pl.BlockSpec(
                (1, gpb, 1, bn), lambda i, j, k, te, lv: (te[i], k, 0, j)
            ),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, k, te, lv: (i, j)),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
    )
    out = pl.pallas_call(
        _make_grouped_kernel_a8(gpb, slab, bn) if a8
        else _make_grouped_kernel(gpb, slab, bn),
        grid_spec=grid_spec,
        # a8 writes the UNSCALED accumulator — keep it f32 so the per-row
        # scale epilogue doesn't compound a bf16 pre-scale rounding
        out_shape=jax.ShapeDtypeStruct(
            (Mp, N), jnp.float32 if a8 else out_dtype
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "parallel", "arbitrary")
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * Mp * K * N,
            bytes_accessed=n_tiles * (K * bn * (N // bn)) // 2
            + Mp * K * 2 + Mp * N * 2,
            transcendentals=0,
        ),
        interpret=_impl_mode() == "interpret",
    )(tile_expert.astype(jnp.int32), tile_live.astype(jnp.int32),
      x, qweight, s_in, zs_in)
    if a8:
        # per-row activation scale: XLA fuses this into the epilogue
        out = (out.astype(jnp.float32) * sx).astype(out_dtype)
    return out


def pick_grouped_bm(tk: int, n_experts: int) -> int:
    """m-tile height: big enough that per-expert tile padding does not
    dominate, small enough that tail-tile waste stays bounded. avg routed
    rows/expert drives it. QUICK_TPU_MOE_BM overrides (tile sweeps)."""
    import os

    v = os.environ.get("QUICK_TPU_MOE_BM", "")
    if v:
        return int(v)
    avg = tk / max(n_experts, 1)
    # bm=32 beats 16 at the 128-slot engine shape (35.5 vs 37.4 ms/step,
    # qwen15moe): an expert visit costs a full 128-row MXU pass whatever
    # the tile height, so fewer/taller tiles win until tail-tile waste
    # (the clamped tiles past the last used row) catches up
    if avg <= 48:
        return 32
    if avg <= 96:
        return 64
    return 128


def grouped_row_budget(tk: int, n_experts: int, bm: int) -> int:
    """Static worst-case row count of the expert-sorted buffer: every
    expert's segment rounds up to bm, but at most min(tk, E) experts can
    have tokens at all."""
    worst = min(tk + n_experts * (bm - 1), tk * bm)
    return max((worst + bm - 1) // bm * bm, bm)


def build_routing(
    sel: jax.Array,      # [T, kk] int32 expert ids per token
    n_experts: int,
    bm: int,
):
    """Expert-sort the (token, expert-slot) pairs and lay them out in
    bm-tiled per-expert segments.

    Returns (tok_rows [Mp] int32 source token per sorted row,
             pos [T, kk] int32 sorted-row of each pair (for the combine
             gather), tile_expert [Mp//bm] int32,
             tile_live [Mp//bm] int32 — 0 for tiles past the last routed
             segment (the kernel skips their compute), valid [Mp] bool).
    Rows past an expert's segment are padding: they gather token 0,
    compute garbage under that tile's expert, and are never read back
    (the combine gathers only through ``pos``)."""
    T, kk = sel.shape
    TK = T * kk
    Mp = grouped_row_budget(TK, n_experts, bm)
    e_flat = sel.reshape(TK)
    t_flat = jnp.arange(TK, dtype=jnp.int32) // kk
    if TK <= n_experts:
        # decode-sized batches: the row budget is exactly TK tiles
        # (TK*bm <= TK + E*(bm-1)), so every (token, slot) pair can own
        # its own tile directly — no sort, no bincount, no searchsorted.
        # The sort-based path's small ops cost ~80 us/layer on TPU
        # (x24 layers ~= half the qwen15moe bs=1 step); this path is
        # reshapes only. Duplicate experts across pairs just stream that
        # expert's weights once per owning tile, same as a 1-row segment.
        assert Mp == TK * bm
        tok_rows = jnp.repeat(t_flat, bm)  # every row of tile i gathers
        # token t_i; only row 0 is ever read back
        pos = (jnp.arange(TK, dtype=jnp.int32) * bm).reshape(T, kk)
        valid = (jnp.arange(Mp, dtype=jnp.int32) % bm) == 0
        tile_live = jnp.ones((TK,), jnp.int32)
        return tok_rows, pos, e_flat, tile_live, valid
    # composite key = expert * TK + pair-index: unique, so the sort is
    # deterministic and stable without relying on argsort stability
    # (int32 is safe: E * TK tops out well under 2^31 at serving shapes)
    order = jnp.argsort(
        e_flat * jnp.int32(TK) + jnp.arange(TK, dtype=jnp.int32)
    )
    es = e_flat[order]
    counts = jnp.bincount(e_flat, length=n_experts)
    padc = (counts + bm - 1) // bm * bm
    base = jnp.concatenate(
        [jnp.zeros(1, padc.dtype), jnp.cumsum(padc)[:-1]]
    )
    starts = jnp.cumsum(counts) - counts
    rank = jnp.arange(TK, dtype=jnp.int32) - starts[es].astype(jnp.int32)
    dest = (base[es].astype(jnp.int32) + rank)  # [TK] rows, all < Mp
    tok_rows = jnp.zeros(Mp, jnp.int32).at[dest].set(t_flat[order])
    valid = jnp.zeros(Mp, jnp.bool_).at[dest].set(True)
    pos = jnp.zeros(TK, jnp.int32).at[order].set(dest).reshape(T, kk)
    n_tiles = Mp // bm
    cum = jnp.cumsum(padc)
    tile_starts = jnp.arange(n_tiles, dtype=padc.dtype) * bm
    tile_expert = jnp.minimum(
        jnp.searchsorted(cum, tile_starts, side="right"),
        n_experts - 1,
    ).astype(jnp.int32)
    tile_live = (tile_starts < cum[-1]).astype(jnp.int32)
    return tok_rows, pos, tile_expert, tile_live, valid
