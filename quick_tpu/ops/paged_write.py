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
                        onehot_ref, kp_in, vp_in, ks_in, vs_in,
                        ko_ref, vo_ref, kso_ref, vso_ref,
                        *, group: int, page: int):
    """KV write + per-page scale-tile write (INT8 KV). Each page owns a
    replicated (8, Hkv*page) scale tile (modules/paged_cache.py) — its RMW
    block never collides across grid steps (unlike an aligned row GROUP
    over a flat [P, H*page] plane, where neighboring pages share rows).
    The per-head scale values expand to the flat (head, token) lane order
    with one tiny one-hot MXU dot ([Hkv,1]^T x [Hkv,T]) — a lane-indexed
    gather of a sublane vector has no direct Mosaic lowering."""
    _write_kernel(pg_ref, off_ref, kn_ref, vn_ref, kp_in, vp_in,
                  ko_ref, vo_ref, group=group)
    b = pl.program_id(0)
    T = onehot_ref.shape[1]
    csel = jax.lax.broadcasted_iota(
        jnp.int32, (1, 1, 1, T), 3
    ) % page == off_ref[b]
    kval = jax.lax.dot_general(
        ksn_ref[...][0], onehot_ref[...], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [1, T] — ksn[h] at every column of head h's token range
    vval = jax.lax.dot_general(
        vsn_ref[...][0], onehot_ref[...], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    kso_ref[...] = jnp.where(csel, kval[None, None], ks_in[...])
    vso_ref[...] = jnp.where(csel, vval[None, None], vs_in[...])


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
    k_scales: jax.Array | None = None,  # [L, P, 8, Hkv*page] f32 replicated
    v_scales: jax.Array | None = None,  # scale tiles (INT8; see paged_cache)
    ks_new: jax.Array | None = None,    # [B, Hkv] f32 per-token scales
    vs_new: jax.Array | None = None,
    interpret: bool = False,
):
    """Returns (k_pages, v_pages[, k_scales, v_scales]) with the tokens
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
    quant = k_scales is not None
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
            pl.BlockSpec((1, 1, 8, T), scale_index),
        ]
        inputs += [k_scales, v_scales]
        out_specs += [
            pl.BlockSpec((1, 1, 8, T), scale_index),
            pl.BlockSpec((1, 1, 8, T), scale_index),
        ]
        out_shape += [
            jax.ShapeDtypeStruct(k_scales.shape, jnp.float32),
            jax.ShapeDtypeStruct(v_scales.shape, jnp.float32),
        ]
        # operand indices count the 2 prefetched scalars first: (pg, off,
        # kn, vn, ksn, vsn, onehot, k_pages, v_pages, k_scales, v_scales)
        aliases = {7: 0, 8: 1, 9: 2, 10: 3}
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
