"""Paged KV cache with block tables — the production serving cache.

The reference's only cache is a dense preallocated ``WindowedCache``
(quick/awq/modules/fused/cache.py:3-59) that discards old context by rolling.
The TPU build replaces it with paged attention storage (SURVEY.md section 5,
"TPU equivalent to build: paged KV cache"):

- K/V live in fixed-size pages ``[L, n_pages, page_size, H_kv, D]`` in HBM.
- Each batch slot owns a row of a block table mapping logical position
  ``p`` to physical page ``block_table[slot, p // page_size]``.
- Page 0 is a reserved TRASH page: unallocated table entries point at it, so
  padded/out-of-range writes land harmlessly (attention masks them by
  per-slot length, and real writes never alias it — the allocator starts
  handing out pages at index 1).

All updates are pure scatters under jit; page allocation is a host-side
free-list (``PageAllocator``) because admission control is inherently
data-dependent and belongs outside the compiled step.
"""
from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

TRASH_PAGE = 0


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class PagedKVCache:
    """Block-table KV cache for ``max_slots`` concurrent sequences.

    k_pages/v_pages: [L, n_pages, H_kv, page_size, D] — heads BEFORE the
    page dimension so a single (page, D) tile per (slot, head) is a
    TPU-aligned DMA block for the paged-attention kernel
    (ops/paged_attention.py).
    block_table:     [max_slots, max_pages_per_seq] int32 physical page ids
    length:          [max_slots] int32 valid tokens per slot
    kv_scales: [L, n_pages, 8, H_kv * page_size] f32 per-token-per-head
    absmax scales when the pages are INT8-quantized (``dtype=jnp.int8`` at
    create — halves KV HBM bytes and roughly doubles KV capacity per chip;
    no reference analog, the reference cache is fp16-only). None for float
    KV. ONE shared tile per page: sublane row 0 holds the K scales, row 1
    the V scales, flat (head, token) in the minor (lane) dim; rows 2-7 are
    tile padding. Each page owning a legal (8, H*page) Mosaic tile keeps
    the attention reads (rows 0/1 of exactly one page's tile per step) and
    the collision-free aliased Pallas RMW writes (ops/paged_write.py) that
    replaced the 145 us/layer XLA scale scatters — while the k+v-in-one-
    tile packing halves the scale bytes vs the round-3 two-array layout
    (+25%% -> +12.5%% of the INT8 KV bytes) and halves the per-page scale
    DMAs in the decode attention kernel.
    """

    k_pages: jax.Array
    v_pages: jax.Array
    block_table: jax.Array
    length: jax.Array
    kv_scales: Optional[jax.Array] = None

    @classmethod
    def create(
        cls,
        n_layers: int,
        n_pages: int,
        page_size: int,
        max_slots: int,
        max_seq: int,
        n_kv: int,
        head_dim: int,
        dtype=jnp.bfloat16,
        v_head_dim: Optional[int] = None,  # deepseek MLA: k plane holds the
        # rope'd k_pe (qk_rope_head_dim) and the v plane the compressed
        # latent (kv_lora_rank) — asymmetric widths, n_kv=1 (MQA)
    ) -> "PagedKVCache":
        max_pages_per_seq = (max_seq + page_size - 1) // page_size
        shape = (n_layers, n_pages, n_kv, page_size, head_dim)
        vshape = (n_layers, n_pages, n_kv, page_size, v_head_dim or head_dim)
        quant = dtype == jnp.int8
        return cls(
            k_pages=jnp.zeros(shape, dtype),
            v_pages=jnp.zeros(vshape, dtype),
            block_table=jnp.full(
                (max_slots, max_pages_per_seq), TRASH_PAGE, jnp.int32
            ),
            length=jnp.zeros((max_slots,), jnp.int32),
            kv_scales=(
                jnp.zeros((n_layers, n_pages, 8, n_kv * page_size),
                          jnp.float32)
                if quant else None
            ),
        )

    @property
    def quantized(self) -> bool:
        return self.kv_scales is not None

    # -- geometry -------------------------------------------------------------
    @property
    def page_size(self) -> int:
        return self.k_pages.shape[3]

    @property
    def max_slots(self) -> int:
        return self.block_table.shape[0]

    @property
    def max_seq(self) -> int:
        return self.block_table.shape[1] * self.page_size

    # -- jit-side ops ----------------------------------------------------------
    def update(
        self, layer: int, k_new: jax.Array, v_new: jax.Array, start: jax.Array
    ) -> "PagedKVCache":
        """Scatter k_new/v_new [B, S, H_kv, D] at logical positions
        ``start[b] + j``. Out-of-range positions hit allocated-or-trash pages
        and are masked by ``length`` at read time."""
        B, S = k_new.shape[:2]
        pos = start.reshape(-1, 1) + jnp.arange(S, dtype=jnp.int32)[None, :]
        page_slot = jnp.minimum(
            pos // self.page_size, self.block_table.shape[1] - 1
        )
        page = jnp.take_along_axis(self.block_table, page_slot, axis=1)  # [B,S]
        # positions past the table's capacity must go to the TRASH page —
        # clamping alone would overwrite the slot's own last real page
        page = jnp.where(pos < self.max_seq, page, TRASH_PAGE)
        off = pos % self.page_size
        kn, vn = (k_new, v_new) if not self.quantized else (None, None)
        if self.quantized:
            kn, ks = _quantize_kv(k_new)
            vn, vs = _quantize_kv(v_new)
        from quick_tpu.ops.paged_write import (
            _group_for,
            paged_write_chunk,
            paged_write_decode,
        )

        if (
            S > 1
            and S <= self.page_size
            and self.page_size % _group_for(self.k_pages.dtype) == 0
            and _use_write_kernel()
        ):
            # chunked-prefill RMW (<= 2 span pages per slot): the XLA
            # scatter path ping-pongs ~2x the cache in step temporaries
            # (measured 10.4GB temp on a 4.3GB cache; ops/paged_write.py)
            # every chunk row writes (padding rows land on future-own or
            # trash pages exactly like the scatter path — masked by length
            # at read). The second span page comes from the first token
            # past the page boundary; capacity limits are page-aligned, so
            # a span page is entirely real or entirely trash.
            valid = jnp.full((B,), S, jnp.int32)
            i_star = jnp.clip(self.page_size - off[:, 0], 0, S - 1)[:, None]
            pg2 = jnp.take_along_axis(page, i_star, axis=1)[:, 0]
            # non-crossing chunks aim their (mask-empty) second span at the
            # TRASH page: re-targeting the first page would write back a
            # stale copy of the block it just updated
            crossing = off[:, 0] + S > self.page_size
            pg2 = jnp.where(crossing, pg2, TRASH_PAGE)
            pgs = jnp.stack([page[:, 0], pg2], axis=1)  # [B, 2]
            written = paged_write_chunk(
                self.k_pages, self.v_pages, kn, vn,
                pgs, off[:, 0], valid, layer,
                kv_scales=self.kv_scales,
                ks_new=ks if self.quantized else None,
                vs_new=vs if self.quantized else None,
                interpret=jax.default_backend() == "cpu",
            )
            if self.quantized:
                kp, vp, sp = written
                return dataclasses.replace(
                    self, k_pages=kp, v_pages=vp, kv_scales=sp,
                )
            kp, vp = written
            return dataclasses.replace(self, k_pages=kp, v_pages=vp)

        if (
            S == 1
            and self.page_size % _group_for(self.k_pages.dtype) == 0
            and _use_write_kernel()
        ):
            # Pallas RMW: output-aliased per-token group writes (the XLA
            # scatter this replaces costs ~128us/call at 7B decode shapes —
            # see ops/paged_write.py). INT8 scale tiles ride the SAME
            # kernel (each page's (8, H*page) replicated tile is its own
            # aliased block): the XLA scale scatter this replaces measured
            # 145 us/layer at 128-slot 7B shapes — the whole INT8 serving
            # regression (tools/int8_gap_bench.py). Chunked prefill (S>1)
            # keeps the scatter: one scatter amortizes over the chunk.
            written = paged_write_decode(
                self.k_pages, self.v_pages, kn[:, 0], vn[:, 0],
                page[:, 0], off[:, 0], layer,
                kv_scales=self.kv_scales,
                ks_new=ks[:, 0] if self.quantized else None,
                vs_new=vs[:, 0] if self.quantized else None,
                interpret=jax.default_backend() == "cpu",
            )
            if self.quantized:
                kp, vp, sp = written
                return dataclasses.replace(
                    self, k_pages=kp, v_pages=vp, kv_scales=sp,
                )
            kp, vp = written
        else:
            # layout [L, P, H, page, D]: advanced indices (page, off)
            # straddle the ':' head axis, so the result axes are
            # [B, S, H, D] — matching k_new directly
            kp = self.k_pages.at[layer, page, :, off].set(
                kn.astype(self.k_pages.dtype)
            )
            vp = self.v_pages.at[layer, page, :, off].set(
                vn.astype(self.v_pages.dtype)
            )
        if not self.quantized:
            return dataclasses.replace(self, k_pages=kp, v_pages=vp)
        # shared scale tile [L, P, 8, H*page]: scatter the flat
        # (head, token) entries into row 0 (k) and row 1 (v) of each
        # page's tile (prefill chunks only — decode rides the RMW kernel)
        H = k_new.shape[2]
        sidx = (
            jnp.arange(H, dtype=jnp.int32)[None, None, :] * self.page_size
            + off[:, :, None]
        )  # [B, S, H]
        sc = self.kv_scales.at[layer, page[:, :, None], 0, sidx].set(ks)
        sc = sc.at[layer, page[:, :, None], 1, sidx].set(vs)
        return dataclasses.replace(
            self, k_pages=kp, v_pages=vp, kv_scales=sc,
        )

    def layer(self, i: int) -> Tuple[jax.Array, jax.Array]:
        """Dense HEAD-major [B, H_kv, max_seq, D] gather of layer ``i``'s
        pages (same contract as KVCache.layer); INT8 pages come back
        dequantized to bf16.

        This is the XLA-gather baseline (also the chunked-prefill read
        path); the fused paged-attention kernel (ops/paged_attention.py)
        reads pages — and their scales — directly with scalar prefetch."""
        B = self.max_slots
        k = self.k_pages[i][self.block_table]  # [B, P_seq, H, page, D]
        v = self.v_pages[i][self.block_table]
        H, Dk, Dv = k.shape[-3], k.shape[-1], v.shape[-1]
        k = jnp.moveaxis(k, 2, 1).reshape(B, H, -1, Dk)
        v = jnp.moveaxis(v, 2, 1).reshape(B, H, -1, Dv)
        if not self.quantized:
            return k, v
        n_pt = self.block_table.shape[1]
        sc = self.kv_scales[i][self.block_table]  # [B, P_seq, 8, T]
        ks = sc[:, :, 0]  # row 0: k scales
        vs = sc[:, :, 1]  # row 1: v scales
        ks = ks.reshape(B, n_pt, H, self.page_size)
        vs = vs.reshape(B, n_pt, H, self.page_size)
        ks = jnp.moveaxis(ks, 2, 1).reshape(B, H, -1, 1)
        vs = jnp.moveaxis(vs, 2, 1).reshape(B, H, -1, 1)
        # dequant arithmetic in bf16: int8 values are exact in bf16 and an
        # f32 intermediate would cost a [pool]-sized f32 temp per layer
        # (512MB at 256 slots — the single biggest step_fn allocation)
        kd = k.astype(jnp.bfloat16) * ks.astype(jnp.bfloat16)
        vd = v.astype(jnp.bfloat16) * vs.astype(jnp.bfloat16)
        return kd, vd

    def with_length(self, length) -> "PagedKVCache":
        return dataclasses.replace(
            self, length=jnp.asarray(length, jnp.int32)
        )

    # -- sub-batch views (decoupled prefill, runtime/serving.py) ---------------
    def select(
        self, slot_ids: jax.Array, row_valid: jax.Array
    ) -> "PagedKVCache":
        """Sub-batch VIEW over the same page pool: per-slot metadata
        (block-table rows, lengths) gathered for ``slot_ids``; rows with
        ``row_valid`` False get all-trash table rows and length 0, so any
        slot id works as padding. Pages are shared, so updates through the
        view write the real cache — fold metadata back with merge()."""
        bt = jnp.where(
            row_valid[:, None], self.block_table[slot_ids], TRASH_PAGE
        )
        ln = jnp.where(row_valid, self.length[slot_ids], 0)
        return dataclasses.replace(self, block_table=bt, length=ln)

    def merge(
        self, sub: "PagedKVCache", slot_ids: jax.Array, row_valid: jax.Array
    ) -> "PagedKVCache":
        """Fold a select() view's updates back: page arrays come from the
        view (updated in place); lengths scatter-max back — max makes
        duplicate/padding slot ids harmless (lengths only grow between
        host-side retirements, and invalid rows contribute 0)."""
        ln = self.length.at[slot_ids].max(
            jnp.where(row_valid, sub.length, 0)
        )
        return dataclasses.replace(
            self,
            k_pages=sub.k_pages,
            v_pages=sub.v_pages,
            kv_scales=sub.kv_scales,
            length=ln,
        )


def _use_write_kernel() -> bool:
    """Route page writes to the Pallas scatter kernel on TPU
    (QUICK_TPU_PAGED_WRITE=1 forces it in interpret mode for CPU tests;
    =0 forces the XLA scatter)."""
    import os

    env = os.environ.get("QUICK_TPU_PAGED_WRITE", "")
    if env == "0":
        return False
    if env == "1":
        return True
    return jax.default_backend() != "cpu"


def _quantize_kv(x: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Per-token-per-head symmetric INT8: x [B, S, H, D] ->
    (codes int8 [B, S, H, D], scales f32 [B, S, H])."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1)
    scale = jnp.maximum(amax / 127.0, 1e-8)
    codes = jnp.clip(
        jnp.round(xf / scale[..., None]), -127, 127
    ).astype(jnp.int8)
    return codes, scale


class PageAllocator:
    """Host-side page free-list. Page 0 is never handed out (trash page)."""

    def __init__(self, n_pages: int):
        if n_pages < 2:
            raise ValueError("need at least 2 pages (page 0 is reserved)")
        self._free: List[int] = list(range(1, n_pages))

    @property
    def n_free(self) -> int:
        return len(self._free)

    def alloc(self, n: int) -> Optional[List[int]]:
        """Allocate n pages, or None if not enough free."""
        if n > len(self._free):
            return None
        pages, self._free = self._free[:n], self._free[n:]
        return pages

    def release(self, pages: List[int]) -> None:
        for p in pages:
            if p == TRASH_PAGE:
                raise ValueError("cannot release the trash page")
        self._free.extend(pages)
