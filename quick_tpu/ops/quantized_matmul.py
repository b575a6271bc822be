"""Fused W4A16 dequant+matmul Pallas kernel — the QUICK-kernel TPU analog.

This is the framework's hot op, replacing the reference's CUDA kernel family
``gemm_forward_cuda_quick`` (reference csrc/gemm_cuda_quick.cu:1456-1517 and
the ``compute_gemm``/``compute_gemm_x2`` device loops at csrc:20-1196).

Design (TPU-first, not a translation):

- Weights stay INT4-packed in HBM (QTPU layout, see
  ``quick_tpu/quantize/packing.py``); each grid step DMAs a packed block to
  VMEM and unpacks with shift/mask only — the j-major nibble order makes every
  4-bit slab a contiguous sublane block, so there are no shuffles and no
  scratch round-trips (the QUICK core idea, reference README.md:20-24).
- Scale/zero-point factor out of the inner loop:
      out = sum_g (x_g @ q_g) * s_g  -  xsum @ (z*s)
  The weight path is int->bf16 convert + one broadcast multiply; the
  zero-point correction is a tiny [M, n_groups] x [n_groups, N] matmul.
  (The reference instead applies sub+mul per mma fragment, csrc:53-60; on TPU
  the factored form keeps the VPU off the critical path.)
- K-accumulation runs in an f32 VMEM scratch over the innermost grid
  dimension (the split-K analog: reference reduces split-K on the host,
  csrc:1515 — here the accumulation is fused, no HBM round-trip).
- Where the reference picks m1/m16/m32/m64 kernels by M (csrc:1488-1514),
  we pick (bm, bn, groups-per-step) tile parameters by (M, K, N); decode
  (small M) is HBM-bandwidth-bound, prefill is MXU-bound.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

PACK = 8


def _impl_mode() -> str:
    """Kernel implementation mode.

    - "pallas": compiled Pallas kernel (TPU).
    - "interpret": Pallas in interpreter mode (CPU kernel tests; set
      QUICK_TPU_PALLAS_INTERPRET=1).
    - "jnp": unpack + dequant + jnp.dot (CPU default — same layout
      contract, XLA-compiled, fast enough for model-level CPU tests).
    """
    import os

    if jax.default_backend() != "cpu":
        return "pallas"
    if os.environ.get("QUICK_TPU_PALLAS_INTERPRET", "0") == "1":
        return "interpret"
    return "jnp"


def unpack_qtpu_jax(qweight: jax.Array, group_size: int = 128) -> jax.Array:
    """jnp unpack of the QTPU layout: int32 [K//8, N] -> uint8-valued
    int32 codes [K, N] (mirrors packing.unpack_qtpu)."""
    K8, N = qweight.shape
    K = K8 * PACK
    slab = group_size // PACK
    ng = K // group_size
    words = qweight.reshape(ng, 1, slab, N)
    shifts = (jnp.arange(PACK, dtype=jnp.int32) * 4).reshape(1, PACK, 1, 1)
    nib = (words >> shifts) & 0xF  # [ng, 8, slab, N], j-major
    return nib.reshape(K, N)


def pack_qtpu_jax(q: jax.Array, group_size: int = 128) -> jax.Array:
    """Traceable QTPU pack: uint8 codes [K, N] -> int32 [K//8, N]
    (inverse of unpack_qtpu_jax; same layout as packing.pack_qtpu). Used by
    QuantLinear.from_float so the whole AWQ search+pack jits into one XLA
    program."""
    K, N = q.shape
    slab = group_size // PACK
    ng = K // group_size
    nib = q.reshape(ng, PACK, slab, N).astype(jnp.uint32)
    shifts = (jnp.arange(PACK, dtype=jnp.uint32) * 4).reshape(1, PACK, 1, 1)
    words = jnp.sum(nib << shifts, axis=1, dtype=jnp.uint32)  # nibbles disjoint
    return jax.lax.bitcast_convert_type(
        words.reshape(K // PACK, N), jnp.int32
    )


def _quantized_matmul_jnp(
    x: jax.Array,
    qweight: jax.Array,
    scales: jax.Array,
    zeros_x_scales: jax.Array,
    group_size: int,
    out_dtype,
) -> jax.Array:
    """Dequant + matmul through XLA; numerics contract identical to the
    Pallas kernel (integer-valued bf16 codes into the dot, f32 accumulation,
    per-group OUTPUT-side scaling, factored zp)."""
    K = x.shape[-1]
    ng = K // group_size
    nib = unpack_qtpu_jax(qweight, group_size).reshape(ng, group_size, -1)
    xb = x.astype(jnp.bfloat16)
    xg = xb.reshape(-1, ng, group_size)
    # [ng, M, N] per-group integer dots, scaled on the output side
    y = jnp.einsum(
        "mgk,gkn->gmn", xg, nib.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )
    y = (y * scales[:, None, :]).sum(0)
    xsum = xb.astype(jnp.float32).reshape(-1, ng, group_size).sum(-1)
    y = y - jnp.dot(xsum, zeros_x_scales)
    return y.astype(out_dtype)


def _make_kernel(gpb: int, slab: int, bn: int):
    """Kernel for one (bm, bn) output tile, stepping gpb quant groups per call.

    Group-dot form: per quant group, unpack (shift/mask/convert only — 3 VPU
    ops per weight) and matmul the *integer-valued* bf16 codes, then scale
    the [bm, bn] partial product on the OUTPUT side:

        acc += (x_g @ q_g) * s_g - rowsum(x_g) * (z_g*s_g)

    Scale cost is bm*bn per group (not G*bn — 25% less VPU work than
    scaling the weights), the zero-point rowsum is computed IN-kernel from
    the x tile (no extra input, no XLA fusion barrier before the call).
    At M=1 this makes the kernel HBM-bound at ~speed-of-light on the packed
    weight stream (the reference's m1 kernel has the same property on GPU,
    csrc/gemm_cuda_quick.cu:1199-1242); at large M the MXU dominates and the
    reduced VPU work keeps unpacking hidden under the matmuls."""
    G = slab * PACK

    def kernel(x_ref, qw_ref, s_ref, zs_ref, o_ref, acc):
        k = pl.program_id(2)

        @pl.when(k == 0)
        def _():
            acc[:] = jnp.zeros_like(acc)

        part = jnp.zeros_like(acc)
        for g in range(gpb):  # static unroll over groups in this K-step
            qg = qw_ref[g * slab : (g + 1) * slab, :]  # [slab, bn] int32
            nib = [(qg >> (4 * j)) & 0xF for j in range(PACK)]
            wg = jnp.concatenate(nib, axis=0).astype(jnp.bfloat16)  # [G, bn]
            xg = x_ref[:, g * G : (g + 1) * G]
            y = jnp.dot(xg, wg, preferred_element_type=jnp.float32)
            xsum = jnp.sum(
                xg.astype(jnp.float32), axis=1, keepdims=True
            )  # [bm, 1]
            part += y * s_ref[g, :, :] - xsum * zs_ref[g, :, :]
        acc[:] += part

        @pl.when(k == pl.num_programs(2) - 1)
        def _():
            o_ref[:] = acc[:].astype(o_ref.dtype)

    return kernel


def _make_kernel_fused_norm(gpb: int, slab: int, bn: int, eps: float):
    """_make_kernel with an RMSNorm PROLOGUE: the raw activation row rides
    in whole ([bm, K], constant over the j/k grid so Mosaic elides the
    re-DMA), is normalized ONCE per (i, j) tile into VMEM scratch, and the
    K-steps slice the normed copy. Removes the separate norm dispatch that
    precedes every decode-shape GEMM (norms were ~1/3 of the measured
    35 us/layer non-GEMM decode cost) — XLA cannot fuse elementwise
    producers into a custom call, so the fusion must live inside the
    kernel. Numerics match ops/norms.rms_norm (f32 statistics, bf16 cast)."""
    G = slab * PACK

    def kernel(x_ref, nw_ref, qw_ref, s_ref, zs_ref, o_ref, acc, xn_scr):
        k = pl.program_id(2)

        @pl.when(k == 0)
        def _():
            acc[:] = jnp.zeros_like(acc)
            xf = x_ref[...].astype(jnp.float32)  # [bm, K]
            ms = jnp.mean(xf * xf, axis=1, keepdims=True)
            xn = xf * jax.lax.rsqrt(ms + eps) * nw_ref[0:1, :].astype(
                jnp.float32
            )
            xn_scr[...] = xn.astype(xn_scr.dtype)

        part = jnp.zeros_like(acc)
        for g in range(gpb):  # static unroll over groups in this K-step
            qg = qw_ref[g * slab : (g + 1) * slab, :]  # [slab, bn] int32
            nib = [(qg >> (4 * j)) & 0xF for j in range(PACK)]
            wg = jnp.concatenate(nib, axis=0).astype(jnp.bfloat16)  # [G, bn]
            xg = xn_scr[:, pl.ds(k * (gpb * G) + g * G, G)]
            y = jnp.dot(xg, wg, preferred_element_type=jnp.float32)
            xsum = jnp.sum(
                xg.astype(jnp.float32), axis=1, keepdims=True
            )  # [bm, 1]
            part += y * s_ref[g, :, :] - xsum * zs_ref[g, :, :]
        acc[:] += part

        @pl.when(k == pl.num_programs(2) - 1)
        def _():
            o_ref[:] = acc[:].astype(o_ref.dtype)

    return kernel


def _make_kernel_fused_glu(gpb: int, slab: int, bn: int):
    """_make_kernel with a SwiGLU PROLOGUE: the raw fused gate_up output
    row rides in whole ([bm, 2K] = [gate | up], constant over the j/k grid
    so Mosaic elides the re-DMA), silu(gate) * up is computed ONCE per
    (i, j) tile into VMEM scratch, and the K-steps slice the gated copy.
    Removes the separate silu-mul dispatch between the gate_up and down
    GEMMs of every decode step (the down-proj analog of the fused-norm
    prologue — XLA cannot fuse elementwise producers into a custom call).
    Numerics match jax.nn.silu(gate) * up in f32 then bf16 cast."""
    G = slab * PACK

    def kernel(gu_ref, qw_ref, s_ref, zs_ref, o_ref, acc, xn_scr):
        k = pl.program_id(2)
        K = xn_scr.shape[1]

        @pl.when(k == 0)
        def _():
            acc[:] = jnp.zeros_like(acc)
            g = gu_ref[:, :K].astype(jnp.float32)
            u = gu_ref[:, K:].astype(jnp.float32)
            xn_scr[...] = (g * jax.lax.logistic(g) * u).astype(xn_scr.dtype)

        part = jnp.zeros_like(acc)
        for g in range(gpb):  # static unroll over groups in this K-step
            qg = qw_ref[g * slab : (g + 1) * slab, :]  # [slab, bn] int32
            nib = [(qg >> (4 * j)) & 0xF for j in range(PACK)]
            wg = jnp.concatenate(nib, axis=0).astype(jnp.bfloat16)  # [G, bn]
            xg = xn_scr[:, pl.ds(k * (gpb * G) + g * G, G)]
            y = jnp.dot(xg, wg, preferred_element_type=jnp.float32)
            xsum = jnp.sum(
                xg.astype(jnp.float32), axis=1, keepdims=True
            )  # [bm, 1]
            part += y * s_ref[g, :, :] - xsum * zs_ref[g, :, :]
        acc[:] += part

        @pl.when(k == pl.num_programs(2) - 1)
        def _():
            o_ref[:] = acc[:].astype(o_ref.dtype)

    return kernel


def quantize_activations(x: jax.Array):
    """Per-token (row) symmetric INT8 activation quantization:
    x [M, K] -> (codes int8 [M, K], scales f32 [M, 1]). The W8 half of the
    W4A8 path — one dynamic scale per token row, the standard serving
    choice (per-row absmax)."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    sx = jnp.maximum(amax / 127.0, 1e-8)
    xq = jnp.clip(jnp.round(xf / sx), -127, 127).astype(jnp.int8)
    return xq, sx


def _quantized_matmul_a8_jnp(
    x: jax.Array,
    qweight: jax.Array,
    scales: jax.Array,
    zeros_x_scales: jax.Array,
    group_size: int,
    out_dtype,
) -> jax.Array:
    """XLA fallback with numerics identical to the A8 Pallas kernel:
    int8 activation codes, int32 per-group integer dots, f32 output-side
    scaling, per-row activation scale folded into the epilogue."""
    K = x.shape[-1]
    ng = K // group_size
    nib = unpack_qtpu_jax(qweight, group_size).reshape(ng, group_size, -1)
    xq, sx = quantize_activations(x)
    xg = xq.reshape(-1, ng, group_size)
    y = jnp.einsum(
        "mgk,gkn->gmn", xg.astype(jnp.int8), nib.astype(jnp.int8),
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32)
    y = (y * scales[:, None, :]).sum(0)
    xsum = xg.astype(jnp.int32).sum(-1).astype(jnp.float32)  # [M, ng]
    y = y - jnp.dot(xsum, zeros_x_scales)
    return (y * sx).astype(out_dtype)


def _make_kernel_a8(gpb: int, slab: int, bn: int):
    """W4A8 variant of _make_kernel: activations arrive as per-row INT8
    codes, the per-group dot runs int8 x int8 -> int32 on the MXU (2x the
    bf16 MXU rate on v5e: 394 vs 197 T*OPS — the prefill compute ceiling
    doubles), and the row scale multiplies once in the epilogue:

        out = sx * [ sum_g (xq_g @ q_g) * s_g - rowsum(xq_g) * (z_g*s_g) ]

    The unpacked uint4 codes (0..15) are exact in int8 — the weight path
    loses nothing vs W4A16; the only new error is the activations' per-row
    int8 rounding."""
    G = slab * PACK

    def kernel(x_ref, sx_ref, qw_ref, s_ref, zs_ref, o_ref, acc):
        k = pl.program_id(2)

        @pl.when(k == 0)
        def _():
            acc[:] = jnp.zeros_like(acc)

        part = jnp.zeros_like(acc)
        for g in range(gpb):
            qg = qw_ref[g * slab : (g + 1) * slab, :]  # [slab, bn] int32
            nib = [(qg >> (4 * j)) & 0xF for j in range(PACK)]
            wg = jnp.concatenate(nib, axis=0).astype(jnp.int8)  # [G, bn]
            xg = x_ref[:, g * G : (g + 1) * G]  # [bm, G] int8
            y = jnp.dot(xg, wg, preferred_element_type=jnp.int32)
            xsum = jnp.sum(
                xg.astype(jnp.int32), axis=1, keepdims=True
            ).astype(jnp.float32)
            part += y.astype(jnp.float32) * s_ref[g, :, :] - xsum * zs_ref[g, :, :]
        acc[:] += part

        @pl.when(k == pl.num_programs(2) - 1)
        def _():
            o_ref[:] = (acc[:] * sx_ref[:]).astype(o_ref.dtype)

    return kernel


def _make_kernel_a8_fused(gpb: int, slab: int, bn: int):
    """_make_kernel_a8 with the ACTIVATION QUANTIZATION fused in: the raw
    bf16 row block rides in whole (constant over j/k — one DMA per i) and
    is int8-quantized once per i into VMEM scratch at (j==0, k==0). The
    separate quantize_activations pass costs read(2*M*K) + write(M*K) +
    re-read(M*K) HBM bytes (~235 us at 8192^2 on v5e — most of W4A8's
    measured e2e loss); here the codes never touch HBM. Relies on the
    TPU's row-major sequential grid order (i outer, k innermost)."""
    G = slab * PACK

    def kernel(x_ref, qw_ref, s_ref, zs_ref, o_ref, acc, xq_scr, sx_scr):
        j = pl.program_id(1)
        k = pl.program_id(2)

        @pl.when(jnp.logical_and(j == 0, k == 0))
        def _():
            # chunk the two quantize passes: a whole-row f32 temp is
            # bm*K*4 bytes (7.3MB at 128x14336 — several live at once blew
            # the 16MB VMEM scope); per-chunk temps are bounded
            K_full = x_ref.shape[1]
            CH = min(K_full, 2048)
            amax = jnp.zeros((x_ref.shape[0], 1), jnp.float32)
            for c in range(K_full // CH):
                xs = x_ref[:, c * CH : (c + 1) * CH].astype(jnp.float32)
                amax = jnp.maximum(
                    amax, jnp.max(jnp.abs(xs), axis=1, keepdims=True)
                )
            sx = jnp.maximum(amax / 127.0, 1e-8)
            sx_scr[...] = sx
            for c in range(K_full // CH):
                xs = x_ref[:, c * CH : (c + 1) * CH].astype(jnp.float32)
                xq_scr[:, c * CH : (c + 1) * CH] = jnp.clip(
                    jnp.round(xs / sx), -127, 127
                ).astype(jnp.int8)

        @pl.when(k == 0)
        def _():
            acc[:] = jnp.zeros_like(acc)

        part = jnp.zeros_like(acc)
        for g in range(gpb):
            qg = qw_ref[g * slab : (g + 1) * slab, :]
            nib = [(qg >> (4 * j2)) & 0xF for j2 in range(PACK)]
            wg = jnp.concatenate(nib, axis=0).astype(jnp.int8)
            xg = xq_scr[:, pl.ds(k * (gpb * G) + g * G, G)]
            y = jnp.dot(xg, wg, preferred_element_type=jnp.int32)
            xsum = jnp.sum(
                xg.astype(jnp.int32), axis=1, keepdims=True
            ).astype(jnp.float32)
            part += y.astype(jnp.float32) * s_ref[g, :, :] - xsum * zs_ref[g, :, :]
        acc[:] += part

        @pl.when(k == pl.num_programs(2) - 1)
        def _():
            o_ref[:] = (acc[:] * sx_scr[:]).astype(o_ref.dtype)

    return kernel


def _a8_fused_quant() -> bool:
    """QUICK_TPU_A8_FUSED=1 routes W4A8 through the in-kernel activation
    quantizer (opt-in until hardware-measured; see _make_kernel_a8_fused)."""
    import os

    return os.environ.get("QUICK_TPU_A8_FUSED", "0") == "1"


@functools.partial(
    jax.jit, static_argnames=("group_size", "out_dtype", "bm", "bn", "gpb")
)
def _quantized_matmul_2d_a8(
    x: jax.Array,
    qweight: jax.Array,
    scales: jax.Array,
    zeros_x_scales: jax.Array,
    group_size: int = 128,
    out_dtype=jnp.bfloat16,
    bm: Optional[int] = None,
    bn: Optional[int] = None,
    gpb: Optional[int] = None,
) -> jax.Array:
    """W4A8 fused matmul: x [M, K] f32/bf16 is dynamically per-row INT8
    quantized, weights stay INT4-packed. Prefill-shaped M only (int8
    blocks need 32-row sublane tiles — decode stays on the W4A16 kernel,
    which is HBM-bound there anyway)."""
    M, K = x.shape
    N = qweight.shape[1]
    G = group_size
    ng = K // G
    slab = G // PACK

    if _impl_mode() == "jnp" or group_size != 128:
        return _quantized_matmul_a8_jnp(
            x, qweight, scales, zeros_x_scales, G, out_dtype
        )

    # int8 operand blocks tile at (32, 128): round rows to 32 (<=128) or
    # pad up to a 128 multiple (same ragged-M policy as the a16 kernel)
    Mp = _round_up(M, 32) if M <= 128 else _round_up(M, 128)
    if bm is None:
        # measured (v5e, 8192^2): Mp=128 single-tile is HBM-bound at ~750
        # GB/s -> 340 TOPS; Mp>=256 runs best at bm=256 (194 vs 234 us at
        # M=256 with bm=128 — weight re-streaming dominates smaller tiles)
        bm = Mp if Mp <= 256 else 256
        if Mp % bm:
            bm = 128
    if bn is None:
        bn = _pick_bn(N) if bm <= 128 else min(512, _pick_bn(N))
    if gpb is None:
        gpb = _pick_gpb(ng, G, bn, slab, bm)

    s3 = scales.reshape(ng, 1, N)
    zs3 = zeros_x_scales.reshape(ng, 1, N)

    if _a8_fused_quant():
        # in-kernel activation quantization: x rides in raw (bf16, whole
        # rows, one DMA per i); codes live only in VMEM scratch. bm capped
        # at 128: the whole-row x block + int8 scratch cost bm*K*3 bytes of
        # VMEM (3MB at 128x8192) on top of the weight pipeline
        if bm > 128:
            bm = 128
            bn = _pick_bn(N)
            gpb = _pick_gpb(ng, G, bn, slab, bm)
        # shrink the K-step until the whole working set fits scoped VMEM.
        # Mosaic double-buffers EVERY operand block (even the constant-
        # index x block), so budget 2x on x + codes scratch + acc + 2x
        # weight/scale blocks against a ~12MB scope (16MB total)
        fixed = bm * K * (2 * 2 + 1) + bm * bn * 6
        while gpb > 1 and fixed + 2 * (gpb * slab * bn * 4 + gpb * bn * 8) \
                > 12 * 1024 * 1024:
            nxt = gpb // 2
            while nxt > 1 and ng % nxt:
                nxt -= 1
            if nxt == gpb or ng % nxt:
                break
            gpb = nxt
        xb = x.astype(jnp.bfloat16)
        if Mp != M:
            xb = jnp.pad(xb, ((0, Mp - M), (0, 0)))
        out = pl.pallas_call(
            _make_kernel_a8_fused(gpb, slab, bn),
            grid=(Mp // bm, N // bn, ng // gpb),
            in_specs=[
                pl.BlockSpec((bm, K), lambda i, j, k: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((gpb * slab, bn), lambda i, j, k: (k, j), memory_space=pltpu.VMEM),
                pl.BlockSpec((gpb, 1, bn), lambda i, j, k: (k, 0, j), memory_space=pltpu.VMEM),
                pl.BlockSpec((gpb, 1, bn), lambda i, j, k: (k, 0, j), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((bm, bn), lambda i, j, k: (i, j), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((Mp, N), out_dtype),
            scratch_shapes=[
                pltpu.VMEM((bm, bn), jnp.float32),
                pltpu.VMEM((bm, K), jnp.int8),
                pltpu.VMEM((bm, 1), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary")
            ),
            cost_estimate=pl.CostEstimate(
                flops=2 * Mp * K * N,
                bytes_accessed=K * N // 2 + Mp * K * 2 + Mp * N * 2 + ng * N * 8,
                transcendentals=0,
            ),
            interpret=_impl_mode() == "interpret",
        )(xb, qweight, s3, zs3)
        return out[:M] if Mp != M else out

    xq, sx = quantize_activations(x)
    if Mp != M:
        xq = jnp.pad(xq, ((0, Mp - M), (0, 0)))
        sx = jnp.pad(sx, ((0, Mp - M), (0, 0)))

    out = pl.pallas_call(
        _make_kernel_a8(gpb, slab, bn),
        grid=(Mp // bm, N // bn, ng // gpb),
        in_specs=[
            pl.BlockSpec((bm, gpb * G), lambda i, j, k: (i, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, 1), lambda i, j, k: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((gpb * slab, bn), lambda i, j, k: (k, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((gpb, 1, bn), lambda i, j, k: (k, 0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((gpb, 1, bn), lambda i, j, k: (k, 0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, k: (i, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Mp, N), out_dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * Mp * K * N,
            bytes_accessed=K * N // 2 + Mp * K + Mp * N * 2 + ng * N * 8,
            transcendentals=0,
        ),
        interpret=_impl_mode() == "interpret",
    )(xq, sx, qweight, s3, zs3)
    return out[:M] if Mp != M else out


def _make_kernel_dequant(gpb: int, slab: int, bn: int):
    """Small-group (G < 128, e.g. GGUF's 32) kernel variant.

    The output-side-scaling kernel slices qw_ref/x_ref per group — at
    slab < 8 those slices sit at sub-native-tile offsets (illegal/slow
    Mosaic layouts). An earlier variant rebuilt logical row order with 3D
    reshape/concat over a sub-native middle dim ([gpb, slab, bn]) — legal
    but slow (sub-native relayouts; same class of cost as the measured
    ~30 us/pass ``jnp.repeat`` below). This version is pure 2D,
    native-tiled ops only:

    - unpack as 8 stacked shift-copies: out row t = j*R + p (R = gpb*slab
      packed rows per K-step) holds logical row (P//slab)*G + j*slab +
      P%slab — a STATIC permutation, applied to x's columns outside the
      kernel (``_small_g_perm``) so the dot contracts correctly;
    - per-group scales/zeros expanded to per-row [R, bn] via a one-hot
      MXU dot (E [R, gpb] @ s [gpb, bn]) — ``jnp.repeat`` along sublanes
      lowers to a relayout that costs ~30 us per pass at 7B shapes
      (measured v5e, tools/smallg_sweep.py: repeat-based 86 us vs
      E-dot 25 us vs scale-free floor 22 us);
    - dequantize in-registers, one big [bm, 8R] x [8R, bn] dot.

    Weights stay INT4-packed in HBM — at decode that is ~4x less traffic
    than the XLA fallback, which materializes dequantized bf16 weights
    through HBM."""
    G = slab * PACK
    # XLA:CPU (interpret mode) lacks a bf16 x bf16 -> f32 dot thunk for
    # this shape family; run the interpreted dot in f32 (same tolerance)
    wdt = jnp.float32 if _impl_mode() == "interpret" else jnp.bfloat16

    def kernel(x_ref, qw_ref, s_ref, zs_ref, o_ref, acc):
        k = pl.program_id(2)

        @pl.when(k == 0)
        def _():
            acc[:] = jnp.zeros_like(acc)

        qg = qw_ref[...]  # [R, bn] int32 — whole block, no slices
        R = gpb * slab
        r_i = jax.lax.broadcasted_iota(jnp.int32, (R, gpb), 0)
        c_i = jax.lax.broadcasted_iota(jnp.int32, (R, gpb), 1)
        E = (r_i // slab == c_i).astype(jnp.float32)  # one-hot row->group
        s_rep = jnp.dot(
            E, s_ref[...].astype(jnp.float32),
            preferred_element_type=jnp.float32,
        )
        zs_rep = jnp.dot(
            E, zs_ref[...].astype(jnp.float32),
            preferred_element_type=jnp.float32,
        )
        ws = []
        for j in range(PACK):
            cj = ((qg >> (4 * j)) & 0xF).astype(jnp.float32)
            ws.append((cj * s_rep - zs_rep).astype(wdt))
        w = jnp.concatenate(ws, axis=0)  # [8R, bn], copy-major row order
        acc[:] += jnp.dot(
            x_ref[...].astype(wdt), w, preferred_element_type=jnp.float32
        )

        @pl.when(k == pl.num_programs(2) - 1)
        def _():
            o_ref[:] = acc[:].astype(o_ref.dtype)

    return kernel


def _small_g_perm(K: int, G: int, gpb: int) -> np.ndarray:
    """x-column order matching ``_make_kernel_dequant``'s copy-major unpack.

    Within each K-step (R = gpb*slab packed rows), dequantized row
    t = j*R + p holds logical k = (P//slab)*G + j*slab + P%slab, with P
    the global packed row index. Returns perm with x_perm[:, t] =
    x[:, perm[t]]."""
    slab = G // PACK
    R = gpb * slab
    T = np.arange(K)
    blk, t = T // (gpb * G), T % (gpb * G)
    j, p = t // R, t % R
    P = blk * R + p
    return (P // slab) * G + j * slab + P % slab


def _pick_tiles_decode(N: int, ng: int, slab: int):
    """(bn, gpb) for M <= 8: minimize TOTAL grid steps (N/bn) * (ng/gpb).

    Decode GEMMs are weight-stream bound and, at 13B-class shapes,
    grid-step-overhead bound on top: the round-3 policy (bn=1024 preferred,
    gpb capped at 8MB of unpacked tile) ran llama-13B's qkv (K=5120,
    N=15360) as 30 steps at 698 GB/s; bn=1536/gpb=20 = 20 steps measures
    45.5-57 us (and e2e is the arbiter — M=1 microbenches VMEM-cache the
    whole weight across fori-loop iterations and can read above HBM peak).
    Constraint: the packed int32 block [gpb*slab, bn] double-buffers within
    ~8MB -> gpb*bn <= 64K lanes (x itself is a whole [8, K] row, constant
    over the grid). Tie-break: fewer K steps (deeper gpb), then larger bn."""
    best = None
    for bn in range(128, min(N, 4096) + 1, 128):
        if N % bn:
            continue
        gpb = 1
        for cand in range(2, min(ng, 64) + 1):
            if ng % cand or cand * bn > 65536:
                continue
            if (cand * slab) % 8 and cand * slab != ng * slab:
                continue
            gpb = cand
        key = ((N // bn) * (ng // gpb), ng // gpb, -bn)
        if best is None or key < best[0]:
            best = (key, bn, gpb)
    if best is None:
        # N has no 128-multiple divisor (e.g. MLA's kv_a N=576): defer to
        # the generic _pick_bn/_pick_gpb path
        return None, None
    return best[1], best[2]


def _pick_bn(N: int) -> int:
    # 1024 measured best across M=1..128 at 7B/8192 shapes (tools/msweep.py,
    # tools/shape_sweep.py, tools/tile_sweep.py: bn=2048 helps some mid-M
    # fan-out shapes ~10% but regresses K-heavy ones ~30%; net within
    # run-to-run variance, so keep the uniform choice); smaller bn only when
    # N demands it
    for bn in (1024, 512, 2048, 256, 128):
        if N % bn == 0:
            return bn
    return N


def _pick_gpb(
    ng: int, G: int, bn: int, slab: int, bm: int = 128, wbytes: int = 2
) -> int:
    # deepest K-step whose unpacked bf16 tile stays within ~4MB of VMEM and
    # whose int32 block keeps sublane alignment. Decode (bm<=8) tolerates
    # 2x deeper steps — the x/acc tiles are tiny and the factored kernel
    # only materializes one [G, bn] unpacked group at a time; measured
    # (v5e, M=1, 7B shapes) gpb 16->32 gains 3-8% weight-stream on every
    # GEMM (gate_up 711->767 GB/s). Candidates include non-power-of-2
    # divisors for odd ng (down-proj ng=112 -> 28).
    cap = (8 if bm <= 8 else 4) * 1024 * 1024
    gpb = 1
    # ALL divisors of ng up to 64, largest fitting the cap (a fixed
    # candidate list missed e.g. ng=108's 27/54 — llama-13B's down proj
    # ran gpb=4 at 496 GB/s vs 754 at gpb=27)
    for cand in range(2, min(ng, 64) + 1):
        if ng % cand:
            continue
        if cand * G * bn * wbytes > cap:
            continue
        if (cand * slab) % 8 and cand * slab != ng * slab:
            continue
        gpb = cand
    return gpb


def _glu_fallback(x: jax.Array) -> jax.Array:
    """silu(gate) * up on a raw [M, 2K] fused gate_up row (f32 math, cast
    back) — the out-of-kernel form of _make_kernel_fused_glu's prologue."""
    K = x.shape[-1] // 2
    g = x[..., :K].astype(jnp.float32)
    u = x[..., K:].astype(jnp.float32)
    return (g * jax.lax.logistic(g) * u).astype(
        x.dtype if x.dtype != jnp.float32 else jnp.bfloat16
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "group_size", "out_dtype", "bm", "bn", "gpb", "norm_eps", "glu"
    ),
)
def _quantized_matmul_2d(
    x: jax.Array,
    qweight: jax.Array,
    scales: jax.Array,
    zeros_x_scales: jax.Array,
    group_size: int = 128,
    out_dtype=jnp.bfloat16,
    bm: Optional[int] = None,
    bn: Optional[int] = None,
    gpb: Optional[int] = None,
    norm_weight: Optional[jax.Array] = None,  # rms weight [K]: apply
    # RMSNorm to x inside the kernel prologue (decode shapes M <= 8 only;
    # see _make_kernel_fused_norm). Ineligible paths pre-norm and proceed.
    norm_eps: float = 1e-6,  # static (baked into the kernel)
    glu: bool = False,  # x is the RAW [M, 2K] fused gate_up output;
    # silu(gate) * up runs inside the kernel prologue (decode shapes
    # M <= 8; see _make_kernel_fused_glu). Ineligible paths pre-gate.
) -> jax.Array:
    """x [M, K] @ dequant(qweight) [K, N] -> [M, N].

    qweight: QTPU-packed int32 [K//8, N]; scales/zeros_x_scales: [K//G, N].
    """
    M = x.shape[0]
    K = qweight.shape[0] * PACK if glu else x.shape[1]
    N = qweight.shape[1]
    G = group_size
    ng = K // G
    slab = G // PACK

    small_g = group_size != 128
    fuse_glu = glu and not small_g and M <= 8 and _impl_mode() != "jnp"
    if glu and not fuse_glu:
        x = _glu_fallback(x)
    fuse = norm_weight is not None and not small_g and M <= 8
    if norm_weight is not None and not fuse:
        from quick_tpu.ops.norms import rms_norm

        x = rms_norm(x, norm_weight, norm_eps)
        norm_weight = None
    if _impl_mode() == "jnp" or (small_g and (ng * slab) % 8 != 0):
        if fuse_glu:
            x = _glu_fallback(x)
        if fuse:
            from quick_tpu.ops.norms import rms_norm

            x = rms_norm(x, norm_weight, norm_eps)
        return _quantized_matmul_jnp(
            x, qweight, scales, zeros_x_scales, G, out_dtype
        )

    # --- tile selection (reference's M-based kernel mux, csrc:1488-1514) ---
    # pad rows to the 8-sublane granule: a [8, G] x [G, bn] dot per group is
    # the smallest MXU-shaped op; M=1 decode rides the same kernel. Ragged
    # M > 128 pads UP to the next 128 multiple: a few junk rows beat the
    # 8-row-tile degeneration (25x more grid rows re-streaming the weights)
    Mp = _round_up(M, 8) if M <= 128 else _round_up(M, 128)
    if bm is None:
        # Mp=256 measured ~10% faster single-tile (bm=256/bn=512: 194-207 us
        # vs bm=128/bn=1024: 204-231 us at 8192^2); Mp>=512 is flat across
        # tiles — keep bm=256 for the halved weight re-streaming
        bm = Mp if Mp <= 256 else 256
        if Mp % bm:
            bm = 128
    if bn is None and gpb is None and bm <= 8 and not small_g:
        bn, gpb = _pick_tiles_decode(N, ng, slab)
    if bn is None:
        bn = _pick_bn(N) if bm <= 128 else min(512, _pick_bn(N))
    if gpb is None:
        gpb = _pick_gpb(ng, G, bn, slab, bm, wbytes=4 if small_g else 2)
    if small_g and (gpb % 8 != 0 and gpb != ng):
        # the scale block [gpb, bn] and packed block [gpb*slab, bn] must
        # stay 8-sublane aligned for the dequant kernel's whole-block reads
        gpb = 8 if ng % 8 == 0 else None
        if gpb is None:
            return _quantized_matmul_jnp(
                x, qweight, scales, zeros_x_scales, G, out_dtype
            )

    x = x.astype(jnp.bfloat16)
    if Mp != M:
        x = jnp.pad(x, ((0, Mp - M), (0, 0)))

    if small_g:
        # dequant-in-kernel variant (the factored kernel's per-group
        # slices are sub-native-tile at slab < 8): 2D scale blocks,
        # x columns pre-permuted to the kernel's copy-major row order.
        # The permutation is a pure dim-transpose (logical k =
        # blk*gpb*G + g*G + j*slab + r -> kernel order blk, j, g, r),
        # expressed as reshape/transpose so XLA emits a relayout copy
        # instead of a lane gather.
        x = (
            x.reshape(Mp, ng // gpb, gpb, PACK, slab)
            .transpose(0, 1, 3, 2, 4)
            .reshape(Mp, K)
        )
        kern = _make_kernel_dequant
        scale_spec = pl.BlockSpec(
            (gpb, bn), lambda i, j, k: (k, j), memory_space=pltpu.VMEM
        )
        s_in, zs_in = scales, zeros_x_scales
    else:
        kern = _make_kernel
        scale_spec = pl.BlockSpec(
            (gpb, 1, bn), lambda i, j, k: (k, 0, j), memory_space=pltpu.VMEM
        )
        s_in = scales.reshape(ng, 1, N)
        zs_in = zeros_x_scales.reshape(ng, 1, N)

    if fuse and ng % gpb == 0:
        nw = jnp.broadcast_to(
            norm_weight.reshape(1, K).astype(jnp.bfloat16), (8, K)
        )  # 8-row tile: a [1, K] block has no legal sublane dim
        in_specs = [
            # whole raw row, constant over j/k: Mosaic elides the re-DMA
            pl.BlockSpec((bm, K), lambda i, j, k: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, K), lambda i, j, k: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((gpb * slab, bn), lambda i, j, k: (k, j), memory_space=pltpu.VMEM),
            scale_spec,
            scale_spec,
        ]
        out = pl.pallas_call(
            _make_kernel_fused_norm(gpb, slab, bn, float(norm_eps)),
            grid=(Mp // bm, N // bn, ng // gpb),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((bm, bn), lambda i, j, k: (i, j), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((Mp, N), out_dtype),
            scratch_shapes=[
                pltpu.VMEM((bm, bn), jnp.float32),
                pltpu.VMEM((bm, K), jnp.bfloat16),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary")
            ),
            cost_estimate=pl.CostEstimate(
                flops=2 * Mp * K * N,
                bytes_accessed=K * N // 2 + Mp * K * 2 + Mp * N * 2 + ng * N * 8,
                transcendentals=0,
            ),
            interpret=_impl_mode() == "interpret",
        )(x, nw, qweight, s_in, zs_in)
        return out[:M] if Mp != M else out
    if fuse_glu and ng % gpb == 0:
        in_specs = [
            # whole raw gate_up row, constant over j/k: Mosaic elides the
            # re-DMA; the prologue gates it into the [bm, K] scratch
            pl.BlockSpec((bm, 2 * K), lambda i, j, k: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((gpb * slab, bn), lambda i, j, k: (k, j), memory_space=pltpu.VMEM),
            scale_spec,
            scale_spec,
        ]
        out = pl.pallas_call(
            _make_kernel_fused_glu(gpb, slab, bn),
            grid=(Mp // bm, N // bn, ng // gpb),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((bm, bn), lambda i, j, k: (i, j), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((Mp, N), out_dtype),
            scratch_shapes=[
                pltpu.VMEM((bm, bn), jnp.float32),
                pltpu.VMEM((bm, K), jnp.bfloat16),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary")
            ),
            cost_estimate=pl.CostEstimate(
                flops=2 * Mp * K * N,
                bytes_accessed=K * N // 2 + Mp * K * 4 + Mp * N * 2 + ng * N * 8,
                transcendentals=Mp * K,
            ),
            interpret=_impl_mode() == "interpret",
        )(x, qweight, s_in, zs_in)
        return out[:M] if Mp != M else out
    elif fuse_glu:
        x = _glu_fallback(x)
    if fuse:
        from quick_tpu.ops.norms import rms_norm

        x = rms_norm(x, norm_weight, norm_eps)

    out = pl.pallas_call(
        kern(gpb, slab, bn),
        grid=(Mp // bm, N // bn, ng // gpb),
        in_specs=[
            pl.BlockSpec((bm, gpb * G), lambda i, j, k: (i, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((gpb * slab, bn), lambda i, j, k: (k, j), memory_space=pltpu.VMEM),
            scale_spec,
            scale_spec,
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, k: (i, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Mp, N), out_dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * Mp * K * N,
            bytes_accessed=K * N // 2 + Mp * K * 2 + Mp * N * 2 + ng * N * 8,
            transcendentals=0,
        ),
        interpret=_impl_mode() == "interpret",
    )(x, qweight, s_in, zs_in)
    return out[:M] if Mp != M else out


def _round_up(v: int, m: int) -> int:
    return (v + m - 1) // m * m


def quantized_matmul_reference(
    x: jax.Array,
    qweight_unpacked: jax.Array,
    scales: jax.Array,
    zeros: jax.Array,
    group_size: int = 128,
) -> jax.Array:
    """Golden model: dequantize-then-matmul in fp32 (no Pallas).

    ``qweight_unpacked``: uint8 codes [K, N]; ``zeros``: integer zero points
    [K//G, N] (NOT pre-multiplied by scales). Port of the semantics of the
    reference's pure-torch fallback (quick/awq/utils/packing_utils.py:82-96).
    """
    K, N = qweight_unpacked.shape
    ng = K // group_size
    q = qweight_unpacked.astype(jnp.float32).reshape(ng, group_size, N)
    w = (q - zeros[:, None, :]) * scales[:, None, :]
    return jnp.dot(x.astype(jnp.float32), w.reshape(K, N))


def _dense_m_threshold() -> int:
    """Row count at/above which the dense-dequant route engages.

    DISABLED by default (QUICK_TPU_DENSE_M=<M> opts in): measured on v5e
    (tools/dense_m_sweep.py, 8192^2) the fused kernel already runs at MXU
    peak (210-218 TFLOPS at M>=1024) and XLA's dequant materializes the
    int32 unpack through HBM (~1.9 ms at 8192^2), so the dense route
    LOSES at every M — unlike the reference's GPU, where cuBLAS fp16
    beats its fused kernel at large M (linear/gemm.py:156-172)."""
    import os

    v = os.environ.get("QUICK_TPU_DENSE_M", "")
    if v and int(v) > 0:
        return int(v)
    return 1 << 62


@functools.partial(
    jax.jit, static_argnames=("group_size", "out_dtype")
)
def _quantized_matmul_dense(
    x: jax.Array,
    qweight: jax.Array,
    scales: jax.Array,
    zeros_x_scales: jax.Array,
    group_size: int = 128,
    out_dtype=jnp.bfloat16,
) -> jax.Array:
    """Dequantize-then-dense-matmul for compute-bound M (prefill).

    All reshapes split/merge LEADING dims only (ng*G = K is k-major), so
    the dequant is pure elementwise + broadcast — XLA fuses it into one
    pass writing the bf16 weight, then runs the dense bf16 MXU dot."""
    K = x.shape[-1]
    N = qweight.shape[1]
    ng = K // group_size
    codes = unpack_qtpu_jax(qweight, group_size)  # int32 [K, N]
    w = (
        codes.reshape(ng, group_size, N).astype(jnp.float32)
        * scales.astype(jnp.float32)[:, None, :]
        - zeros_x_scales.astype(jnp.float32)[:, None, :]
    ).astype(jnp.bfloat16).reshape(K, N)
    return jnp.dot(
        x.astype(jnp.bfloat16), w, preferred_element_type=jnp.float32
    ).astype(out_dtype)


def quantized_matmul(
    x: jax.Array,
    qweight: jax.Array,
    scales: jax.Array,
    zeros_x_scales: jax.Array,
    group_size: int = 128,
    bias: Optional[jax.Array] = None,
    out_dtype=None,
    a8: bool = False,  # dynamic per-row INT8 activations: int8 x int8 MXU
    # dots at 2x the bf16 rate (prefill compute ceiling doubles); adds
    # per-row activation rounding error (~0.4%/value). Decode-shaped M
    # still routes to the W4A16 kernel (bandwidth-bound there).
    fuse_norm: Optional[tuple] = None,  # (rms_weight [K], eps): RMSNorm x
    # inside the decode kernel's prologue (see _make_kernel_fused_norm);
    # routes that cannot fuse apply the norm first — numerics identical.
    fuse_glu: bool = False,  # x is the RAW [..., 2K] fused gate_up output;
    # silu(gate) * up runs inside the decode kernel's prologue (see
    # _make_kernel_fused_glu); routes that cannot fuse pre-gate — numerics
    # identical.
) -> jax.Array:
    """Public fused W4A16 (or W4A8 with ``a8=True``) matmul over arbitrary
    leading dims.

    x: [..., K] activations; qweight: QTPU int32 [K//8, N];
    scales/zeros_x_scales: f32 [K//G, N]. Returns [..., N].
    """
    if out_dtype is None:
        out_dtype = x.dtype if x.dtype != jnp.float32 else jnp.bfloat16
    lead = x.shape[:-1]
    x2 = x.reshape(-1, x.shape[-1])
    if fuse_glu and (x2.shape[0] > 8 or a8 or group_size != 128):
        x2 = _glu_fallback(x2)
        fuse_glu = False
    K = qweight.shape[0] * PACK if fuse_glu else x2.shape[-1]
    if fuse_norm is not None and (x2.shape[0] > 8 or a8):
        from quick_tpu.ops.norms import rms_norm

        x2 = rms_norm(x2, fuse_norm[0], fuse_norm[1])
        fuse_norm = None
    # a8 measured (v5e, 8192^2): Mp=128 340 TOPS vs 155 a16 (2.2x — the
    # int8 weight stream is HBM-bound at ~750 GB/s); but M<=64 REGRESSES
    # (126 vs 158 TF — quantize_activations overhead dominates), so the
    # int8 path only engages where it wins: rows that pad to >=128.
    if fuse_glu and x2.shape[0] >= _dense_m_threshold():
        x2 = _glu_fallback(x2)
        fuse_glu = False
    if x2.shape[0] >= _dense_m_threshold():
        # large-prefill route (the reference's tokens>=1024 heuristic,
        # linear/gemm.py:156-172, re-derived for TPU): materialize the
        # dequantized bf16 weight once and ride the dense MXU matmul —
        # compute-bound at these M, the dense bf16 dot sustains a higher
        # MXU rate than the fused unpack kernel, and the one-time
        # dequant (K*N VPU ops + 2*K*N HBM bytes) amortizes over M rows
        y = _quantized_matmul_dense(
            x2, qweight, scales, zeros_x_scales,
            group_size=group_size, out_dtype=out_dtype,
        )
    elif a8 and x2.shape[0] > 96:
        y = _quantized_matmul_2d_a8(
            x2, qweight, scales, zeros_x_scales,
            group_size=group_size, out_dtype=out_dtype,
        )
    else:
        y = _quantized_matmul_2d(
            x2, qweight, scales, zeros_x_scales,
            group_size=group_size, out_dtype=out_dtype,
            norm_weight=None if fuse_norm is None else fuse_norm[0],
            norm_eps=1e-6 if fuse_norm is None else float(fuse_norm[1]),
            glu=fuse_glu,
        )
    y = y.reshape(*lead, y.shape[-1])
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y
