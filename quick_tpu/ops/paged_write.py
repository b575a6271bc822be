"""Paged KV cache decode write — Pallas TPU read-modify-write kernel.

XLA lowers ``pages.at[layer, page, :, off].set(new)`` to a general scatter,
measured at ~128us per call on v5e at 7B decode shapes — x64 per decode
step (32 layers x k,v), ~8ms of a 21ms bs=64 serving step
(tools/engine_bench.py). This kernel replaces the decode (S=1) scatter
with the TPU-native pattern: OUTPUT ALIASING + scalar-prefetch-driven
block indices on the pages' NATIVE 5D layout.

Two layout facts shape the design (both found the hard way):
- Pallas TPU blocks must keep the last two dims (8,128)-divisible or equal
  to the array dims, so a [.., token_slot=1, D] block is not lowerable.
- A [P, Hkv, page, D] -> [P, Hkv, page*D] reshape is NOT free on TPU: the
  minor-dim tiling differs, so XLA physically re-shuffles the whole cache
  (cost scales with n_layers; measured ~3ms/call at 7B).

So each grid step (b,) reads the aligned [Hkv, 8, D] token-slot group that
contains the target position, replaces one row via an iota==offset select
(no dynamic stores), and writes the group back — a 16KB RMW per token
against the aliased page buffer. Only trash-page (page 0) writes can
collide between steps; their stored values are irrelevant and the grid is
"arbitrary" (serialized).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def _group_for(dtype) -> int:
    """Token-slots per RMW block: the dtype's native sublane tile (f32: 8,
    bf16: 16, int8: 32) — a sub-tile block corrupts the DMA (observed as a
    TPU worker crash with int8 at group 8)."""
    return max(8, 32 // jnp.dtype(dtype).itemsize)


def _write_kernel_quant(pg_ref, off_ref, kn_ref, vn_ref, ksn_ref, vsn_ref,
                        onehot_ref, kp_in, vp_in, sc_in,
                        ko_ref, vo_ref, sco_ref,
                        *, group: int, page: int):
    """KV write + per-page scale-tile write (INT8 KV). Each page owns ONE
    shared (8, Hkv*page) scale tile (modules/paged_cache.py: row 0 = k
    scales, row 1 = v scales) — its RMW block never collides across grid
    steps (unlike an aligned row GROUP over a flat [P, H*page] plane,
    where neighboring pages share rows). The per-head scale values expand
    to the flat (head, token) lane order with one tiny one-hot MXU dot
    ([Hkv,1]^T x [Hkv,T]) — a lane-indexed gather of a sublane vector has
    no direct Mosaic lowering."""
    _write_kernel(pg_ref, off_ref, kn_ref, vn_ref, kp_in, vp_in,
                  ko_ref, vo_ref, group=group)
    b = pl.program_id(0)
    T = onehot_ref.shape[1]
    csel = jax.lax.broadcasted_iota(
        jnp.int32, (1, 1, 1, T), 3
    ) % page == off_ref[b]
    rows = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 8, 1), 2)
    kval = jax.lax.dot_general(
        ksn_ref[...][0], onehot_ref[...], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [1, T] — ksn[h] at every column of head h's token range
    val = jax.lax.dot_general(
        vsn_ref[...][0], onehot_ref[...], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    out = jnp.where(
        jnp.logical_and(csel, rows == 0), kval[None, None], sc_in[...]
    )
    sco_ref[...] = jnp.where(
        jnp.logical_and(csel, rows == 1), val[None, None], out
    )


def _write_kernel(pg_ref, off_ref, kn_ref, vn_ref, kp_in, vp_in,
                  ko_ref, vo_ref, *, group: int):
    del pg_ref  # page index drives the BlockSpecs
    b = pl.program_id(0)
    row = off_ref[b] % group
    # [1, 1, Hkv, GROUP, D] select mask over the token-slot (sublane) dim
    sel = (
        jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, group, 1), 3) == row
    )
    kn = kn_ref[...][:, None, :, None, :]  # [1,1,Hkv,1,D]
    vn = vn_ref[...][:, None, :, None, :]
    ko_ref[...] = jnp.where(sel, kn, kp_in[...])
    vo_ref[...] = jnp.where(sel, vn, vp_in[...])


@functools.partial(jax.jit, static_argnames=("layer", "interpret"))
def paged_write_decode(
    k_pages: jax.Array,   # [L, P, Hkv, page, D]
    v_pages: jax.Array,
    k_new: jax.Array,     # [B, Hkv, D] — ONE token per slot (cast to page dtype)
    v_new: jax.Array,
    page_ids: jax.Array,  # [B] int32 physical page per token
    offs: jax.Array,      # [B] int32 in-page offset per token
    layer: int,
    kv_scales: jax.Array | None = None,  # [L, P, 8, Hkv*page] f32 shared
    # scale tiles (row 0 = k, row 1 = v; INT8 — see paged_cache)
    ks_new: jax.Array | None = None,    # [B, Hkv] f32 per-token scales
    vs_new: jax.Array | None = None,
    interpret: bool = False,
):
    """Returns (k_pages, v_pages[, kv_scales]) with the tokens
    (and, for INT8 KV, their scale entries) written into ``layer``.

    Donation-friendly: the page (and scale) arrays are aliased
    input->output, so under jit the write is in-place. PRECONDITION:
    ``page_size`` must be a multiple of the dtype's RMW group (f32 8 /
    bf16 16 / int8 32 — see _group_for), or the aligned group block spans
    past the page boundary into the NEIGHBORING page through the aliased
    buffer. Validated here because the kernel is also called directly by
    tests/benches (PagedKVCache.update has its own guard)."""
    import numpy as _np

    page_sz = k_pages.shape[3]
    grp = _group_for(k_pages.dtype)
    if page_sz % grp != 0:
        raise ValueError(
            f"page_size {page_sz} must be a multiple of the {k_pages.dtype} "
            f"RMW group ({grp}) — an aligned group block would cross into "
            f"the next page"
        )
    B, Hkv, Dk = k_new.shape
    Dv = v_new.shape[-1]  # deepseek MLA pages: k_pe/latent widths differ
    group = _group_for(k_pages.dtype)
    quant = kv_scales is not None
    T = Hkv * page_sz

    def blk_index(b, pg, off):
        return (layer, pg[b], 0, off[b] // group, 0)

    def scale_index(b, pg, off):
        return (layer, pg[b], 0, 0)

    in_specs = [
        pl.BlockSpec((1, Hkv, Dk), lambda b, pg, off: (b, 0, 0)),
        pl.BlockSpec((1, Hkv, Dv), lambda b, pg, off: (b, 0, 0)),
    ]
    inputs = [k_new.astype(k_pages.dtype), v_new.astype(v_pages.dtype)]
    if quant:
        # per-token scales as [B, Hkv, 1] (a (1, Hkv) block has no legal
        # sublane dim) + the static one-hot head-expansion matrix
        in_specs += [
            pl.BlockSpec((1, Hkv, 1), lambda b, pg, off: (b, 0, 0)),
            pl.BlockSpec((1, Hkv, 1), lambda b, pg, off: (b, 0, 0)),
            pl.BlockSpec((Hkv, T), lambda b, pg, off: (0, 0)),
        ]
        onehot = _np.repeat(_np.eye(Hkv, dtype=_np.float32), page_sz, axis=1)
        inputs += [
            ks_new.astype(jnp.float32)[..., None],
            vs_new.astype(jnp.float32)[..., None],
            jnp.asarray(onehot),
        ]
    # aliased page (and scale-tile) buffers, also read as the RMW source
    in_specs += [
        pl.BlockSpec((1, 1, Hkv, group, Dk), blk_index),
        pl.BlockSpec((1, 1, Hkv, group, Dv), blk_index),
    ]
    inputs += [k_pages, v_pages]
    out_specs = [
        pl.BlockSpec((1, 1, Hkv, group, Dk), blk_index),
        pl.BlockSpec((1, 1, Hkv, group, Dv), blk_index),
    ]
    out_shape = [
        jax.ShapeDtypeStruct(k_pages.shape, k_pages.dtype),
        jax.ShapeDtypeStruct(v_pages.shape, v_pages.dtype),
    ]
    if quant:
        in_specs += [
            pl.BlockSpec((1, 1, 8, T), scale_index),
        ]
        inputs += [kv_scales]
        out_specs += [
            pl.BlockSpec((1, 1, 8, T), scale_index),
        ]
        out_shape += [
            jax.ShapeDtypeStruct(kv_scales.shape, jnp.float32),
        ]
        # operand indices count the 2 prefetched scalars first: (pg, off,
        # kn, vn, ksn, vsn, onehot, k_pages, v_pages, kv_scales)
        aliases = {7: 0, 8: 1, 9: 2}
        kernel = functools.partial(
            _write_kernel_quant, group=group, page=page_sz
        )
    else:
        # (pg, off, kn, vn, k_pages, v_pages) -> k_pages input 4, v input 5
        aliases = {4: 0, 5: 1}
        kernel = functools.partial(_write_kernel, group=group)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B,),
        in_specs=in_specs,
        out_specs=out_specs,
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        input_output_aliases=aliases,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)
        ),
        interpret=interpret,
    )(page_ids.astype(jnp.int32), offs.astype(jnp.int32), *inputs)


def _chunk_write_kernel(pg_ref, off_ref, valid_ref, kn_ref, vn_ref,
                        kp_in, vp_in, ko_ref, vo_ref, *, page: int):
    """Chunked-prefill page write: grid step (b, m) RMWs span page m
    (0 or 1) of slot b's chunk. The chunk rows (padded to ``page``) are
    dynamically ROLLED by the in-page offset so page row r holds chunk
    token (r - off) mod page; masks keep only rows belonging to this span
    page and within the slot's valid feed."""
    b = pl.program_id(0)
    m = pl.program_id(1)
    off = off_ref[b]
    valid = valid_ref[b]
    kn = kn_ref[...][0]  # [Hkv, page, D] (chunk tokens on the sublane dim)
    vn = vn_ref[...][0]
    Hkv = kn.shape[0]
    # dynamic token rotation as a batched one-hot permutation DOT (MXU):
    # tpu.dynamic_rotate only supports 32-bit data, so pltpu.roll cannot
    # rotate bf16/int8 pages. R[r, t] = (t == (r - off) mod page); exact
    # for integer-valued bf16 operands (int8 codes are <= 127).
    rr = jax.lax.broadcasted_iota(jnp.int32, (page, page), 0)
    tt = jax.lax.broadcasted_iota(jnp.int32, (page, page), 1)
    # operand dtype follows the pages: f32 pages must permute exactly (a
    # bf16 dot would round them); bf16/int8 values are exact in bf16
    rot_dt = (
        jnp.float32 if kp_in.dtype == jnp.float32 else jnp.bfloat16
    )
    R = ((rr - off) % page == tt).astype(rot_dt)
    R3 = jnp.broadcast_to(R[None], (Hkv, page, page))

    def rot(x):
        y = jax.lax.dot_general(
            R3, x.astype(rot_dt),
            (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # [Hkv, page, D]
        return y

    kr = rot(kn).astype(kp_in.dtype)
    vr = rot(vn).astype(vp_in.dtype)
    r = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, page, 1), 3)
    i = (r - off) % page  # chunk index this page row maps to
    # (a where over BOOLEAN vectors does not legalize in Mosaic)
    is0 = m == 0
    in_span = jnp.logical_or(
        jnp.logical_and(is0, r >= off),
        jnp.logical_and(jnp.logical_not(is0), r < off),
    )
    sel = jnp.logical_and(in_span, i < valid)
    ko_ref[...] = jnp.where(sel, kr[None, None], kp_in[...])
    vo_ref[...] = jnp.where(sel, vr[None, None], vp_in[...])


def _chunk_write_kernel_quant(pg_ref, off_ref, valid_ref, kn_ref, vn_ref,
                              ksn_ref, vsn_ref, onehot_ref,
                              kp_in, vp_in, sc_in,
                              ko_ref, vo_ref, sco_ref, *, page: int):
    """INT8 variant: also RMWs the page's shared (8, Hkv*page) scale tile
    (row 0 = k, row 1 = v). Chunk scales [page(padded), Hkv] expand to
    per-token lane rows with ONE one-hot MXU dot ([C,Hkv] @ [Hkv,T] ->
    [C,T]), then a [C,T] select-sum scatters each token's row into its
    in-page lane column."""
    _chunk_write_kernel(pg_ref, off_ref, valid_ref, kn_ref, vn_ref,
                        kp_in, vp_in, ko_ref, vo_ref, page=page)
    b = pl.program_id(0)
    m = pl.program_id(1)
    off = off_ref[b]
    valid = valid_ref[b]
    T = onehot_ref.shape[1]

    def tile_row(sn_ref, prev_row):
        rows = jax.lax.dot_general(
            sn_ref[...][0], onehot_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [C(page), T]: token i's scale at every lane of its head
        ic = jax.lax.broadcasted_iota(jnp.int32, (page, T), 0)
        it = jax.lax.broadcasted_iota(jnp.int32, (page, T), 1)
        r_i = (off + ic) % page
        pg_i = (off + ic) // page
        sel = jnp.logical_and(
            it % page == r_i,
            jnp.logical_and(pg_i == m, ic < valid),
        )  # [C, T]
        contrib = jnp.sum(jnp.where(sel, rows, 0.0), axis=0, keepdims=True)
        hit = jnp.sum(sel.astype(jnp.float32), axis=0, keepdims=True) > 0
        return jnp.where(hit, contrib, prev_row)  # [1, T]

    krow = tile_row(ksn_ref, sc_in[...][0, 0, 0:1, :])
    vrow = tile_row(vsn_ref, sc_in[...][0, 0, 1:2, :])
    rows8 = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 8, 1), 2)
    out = jnp.where(rows8 == 0, krow[None, None], sc_in[...])
    sco_ref[...] = jnp.where(rows8 == 1, vrow[None, None], out)


@functools.partial(jax.jit, static_argnames=("layer", "interpret"))
def paged_write_chunk(
    k_pages: jax.Array,   # [L, P, Hkv, page, D]
    v_pages: jax.Array,
    k_new: jax.Array,     # [B, S, Hkv, D], S <= page (cast to page dtype)
    v_new: jax.Array,
    page_ids: jax.Array,  # [B, 2] int32: the chunk's (first, second) page
    offs: jax.Array,      # [B] int32 in-page offset of the chunk's start
    valid: jax.Array,     # [B] int32 tokens of the chunk actually fed
    layer: int,
    kv_scales: jax.Array | None = None,  # [L, P, 8, Hkv*page] shared tiles
    # (row 0 = k, row 1 = v; INT8)
    ks_new: jax.Array | None = None,    # [B, S, Hkv] f32 per-token scales
    vs_new: jax.Array | None = None,
    interpret: bool = False,
):
    """Chunked-prefill RMW page write (S <= page spans at most 2 pages per
    slot). Replaces the XLA scatter whose cache-sized ping-pong copies
    held ~2x the cache in temporaries per step program (measured 10.4GB
    temp on a 4.3GB cache at 64x512 7B) — the aliased RMW chain keeps ONE
    cache buffer end to end."""
    import numpy as _np

    L, P, Hkv, page, Dk = k_pages.shape
    Dv = v_pages.shape[-1]
    B, S = k_new.shape[:2]
    if S > page:
        raise ValueError(f"chunk S={S} must be <= page_size={page}")
    quant = kv_scales is not None
    T = Hkv * page

    # pad the chunk to page rows and move tokens onto the page-row axis:
    # [B, S, Hkv, D] -> [B, Hkv, page, D]
    def prep(x, dtype):
        x = jnp.moveaxis(x, 1, 2).astype(dtype)
        return jnp.pad(x, ((0, 0), (0, 0), (0, page - S), (0, 0)))

    kn = prep(k_new, k_pages.dtype)
    vn = prep(v_new, v_pages.dtype)

    def blk_index(b, m, pg, off, vl):
        return (layer, pg[b, m], 0, 0, 0)

    def chunk_index(b, m, pg, off, vl):
        return (b, 0, 0, 0)

    in_specs = [
        pl.BlockSpec((1, Hkv, page, Dk), chunk_index),
        pl.BlockSpec((1, Hkv, page, Dv), chunk_index),
    ]
    inputs = [kn, vn]
    if quant:
        sn = jnp.pad(
            ks_new.astype(jnp.float32), ((0, 0), (0, page - S), (0, 0))
        )
        vn_s = jnp.pad(
            vs_new.astype(jnp.float32), ((0, 0), (0, page - S), (0, 0))
        )
        onehot = _np.repeat(_np.eye(Hkv, dtype=_np.float32), page, axis=1)
        in_specs += [
            pl.BlockSpec((1, page, Hkv), lambda b, m, pg, off, vl: (b, 0, 0)),
            pl.BlockSpec((1, page, Hkv), lambda b, m, pg, off, vl: (b, 0, 0)),
            pl.BlockSpec((Hkv, T), lambda b, m, pg, off, vl: (0, 0)),
        ]
        inputs += [sn, vn_s, jnp.asarray(onehot)]
    in_specs += [
        pl.BlockSpec((1, 1, Hkv, page, Dk), blk_index),
        pl.BlockSpec((1, 1, Hkv, page, Dv), blk_index),
    ]
    inputs += [k_pages, v_pages]
    out_specs = [
        pl.BlockSpec((1, 1, Hkv, page, Dk), blk_index),
        pl.BlockSpec((1, 1, Hkv, page, Dv), blk_index),
    ]
    out_shape = [
        jax.ShapeDtypeStruct(k_pages.shape, k_pages.dtype),
        jax.ShapeDtypeStruct(v_pages.shape, v_pages.dtype),
    ]
    if quant:
        def scale_index(b, m, pg, off, vl):
            return (layer, pg[b, m], 0, 0)

        in_specs += [
            pl.BlockSpec((1, 1, 8, T), scale_index),
        ]
        inputs += [kv_scales]
        out_specs += [
            pl.BlockSpec((1, 1, 8, T), scale_index),
        ]
        out_shape += [
            jax.ShapeDtypeStruct(kv_scales.shape, jnp.float32),
        ]
        # (pg, off, vl | kn, vn, ksn, vsn, onehot, kp, vp, kv_scales)
        aliases = {8: 0, 9: 1, 10: 2}
        kernel = functools.partial(_chunk_write_kernel_quant, page=page)
    else:
        aliases = {5: 0, 6: 1}
        kernel = functools.partial(_chunk_write_kernel, page=page)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(B, 2),
        in_specs=in_specs,
        out_specs=out_specs,
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        input_output_aliases=aliases,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")
        ),
        interpret=interpret,
    )(page_ids.astype(jnp.int32), offs.astype(jnp.int32),
      valid.astype(jnp.int32), *inputs)
