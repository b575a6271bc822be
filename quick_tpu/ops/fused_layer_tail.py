"""Decode layer-tail megakernel: o-proj + residual + RMSNorm + SwiGLU MLP
in ONE pallas_call.

At bs=1 decode the per-layer budget (tools/decode_breakdown.py, round 4) is
~51 us of XLA dispatch glue plus ~6 us of DMA ramp per GEMM custom call —
XLA cannot pipeline the NEXT GEMM's weight DMAs across a custom-call
boundary, so the HBM stream stops at every o/gate_up/down seam. This
kernel runs the whole post-attention tail of a llama-family layer as one
grid:

    phase 1   o-proj GEMM            h  = bf16(acc) + x_residual
    boundary  RMSNorm(h) * w         -> xn scratch      (first P2 step)
    phase 2   gate_up GEMM           gu scratch
    boundary  silu(g) * u            -> x2 scratch      (first P3 step)
    phase 3   down GEMM              y  = bf16(acc) + h

One flat "arbitrary" grid; each phase's weight blocks are ~1MB packed
int32 tiles whose index maps CLAMP outside their phase, so Mosaic keeps
them resident (no re-DMA) and prefetches the next phase's first block
while the current phase drains — the weight stream never stops. Scale
handling, in-kernel zero-point rowsums and the per-group OUTPUT-side
factored numerics are identical to ops/quantized_matmul.py::_make_kernel;
bf16 cast points match the unfused path exactly (tested).

Replaces 3 GEMM dispatches + the silu/residual/norm fusions per layer with
one call (the attention step is already one kernel,
ops/fused_decode_step.py). Reference analog: the per-layer chain of QUICK
kernel launches (quick/awq/modules/fused/block.py:61-74) — collapsed
rather than translated. Llama-family decode only: rows <= 8, RMSNorm,
gated silu MLP, bias-free QuantLinears (g=128), no TP (the o/down psum
must happen before the residual adds under TP).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

PACK = 8
BM = 8  # row tile (decode rows pad to 8)


def _tail_tiles(N: int, ng: int, max_lanes: int) -> tuple:
    """(bn, gpb) per phase under a packed-block budget of ``max_lanes``
    (block bytes = lanes * 64). Mosaic allocates 2 buffers per operand for
    the WHOLE kernel regardless of phase, so the wrapper hands the big
    matrices (gate_up, down) big blocks and the small one (o) a small
    block — 2 x (sum of blocks) must stay inside the ~16MB VMEM scope.
    1MB blocks measured 622 GB/s vs ~750 at the standalone kernels'
    2-4MB tiles. Fewest total steps, then fewest K steps, then larger bn."""
    best = None
    for bn in range(128, min(N, 4096) + 1, 128):
        if N % bn:
            continue
        gpb = 1
        for cand in range(2, min(ng, 64) + 1):
            if ng % cand or cand * bn > max_lanes:
                continue
            gpb = cand
        key = ((N // bn) * (ng // gpb), ng // gpb, -bn)
        if best is None or key < best[0]:
            best = (key, bn, gpb)
    return best[1], best[2]


def _make_tail_kernel(
    shapes,  # ((K1, D), (D, N2), (K3, D)) logical GEMM dims
    tiles,   # ((bn1, gpb1), (bn2, gpb2), (bn3, gpb3))
    eps: float,
):
    (K1, D), (_, N2), (K3, _) = shapes
    (bn1, gpb1), (bn2, gpb2), (bn3, gpb3) = tiles
    G = 128
    slab = G // PACK
    ng1, ng2, ng3 = K1 // G, D // G, K3 // G
    KS1, KS2, KS3 = ng1 // gpb1, ng2 // gpb2, ng3 // gpb3
    S1 = (D // bn1) * KS1
    S2 = (N2 // bn2) * KS2
    S3 = (D // bn3) * KS3

    def group_dot(acc, x_slice, qw_ref, s_ref, zs_ref, gpb):
        part = jnp.zeros_like(acc)
        for g in range(gpb):
            qg = qw_ref[g * slab : (g + 1) * slab, :]
            nib = [(qg >> (4 * j)) & 0xF for j in range(PACK)]
            wg = jnp.concatenate(nib, axis=0).astype(jnp.bfloat16)
            xg = x_slice(g)
            y = jnp.dot(xg, wg, preferred_element_type=jnp.float32)
            xsum = jnp.sum(xg.astype(jnp.float32), axis=1, keepdims=True)
            part += y * s_ref[g, :, :] - xsum * zs_ref[g, :, :]
        return acc + part

    def kernel(ao_ref, xres_ref, nw_ref,
               qw1, s1, zs1, qw2, s2, zs2, qw3, s3, zs3,
               y_ref,
               acc, h_scr, xn_scr, gu_scr, x2_scr):
        s = pl.program_id(0)

        # ---- phase 1: o-proj (attn_out [BM, K1] @ W_o -> h) --------------
        @pl.when(s < S1)
        def _p1():
            k = s % KS1
            j = s // KS1

            @pl.when(k == 0)
            def _():
                acc[:, :bn1] = jnp.zeros_like(acc[:, :bn1])

            acc[:, :bn1] = group_dot(
                acc[:, :bn1],
                lambda g, k=k: ao_ref[
                    :, pl.ds((k * gpb1 + g) * G, G)
                ],
                qw1, s1, zs1, gpb1,
            )

            @pl.when(k == KS1 - 1)
            def _():
                # residual add in bf16 — same cast point as the unfused
                # path (o GEMM emits bf16, then x + o in bf16)
                h_scr[:, pl.ds(j * bn1, bn1)] = (
                    acc[:, :bn1].astype(jnp.bfloat16)
                    + xres_ref[:, pl.ds(j * bn1, bn1)]
                )

        # ---- boundary: RMSNorm(h) * w -> xn (first P2 step) --------------
        @pl.when(s == S1)
        def _norm():
            hf = h_scr[...].astype(jnp.float32)
            ms = jnp.mean(hf * hf, axis=1, keepdims=True)
            xn_scr[...] = (
                hf * jax.lax.rsqrt(ms + eps)
                * nw_ref[0:1, :].astype(jnp.float32)
            ).astype(xn_scr.dtype)

        # ---- phase 2: gate_up (xn [BM, D] @ W_gu -> gu) ------------------
        @pl.when(jnp.logical_and(s >= S1, s < S1 + S2))
        def _p2():
            srel = s - S1
            k = srel % KS2
            j = srel // KS2

            @pl.when(k == 0)
            def _():
                acc[:, :bn2] = jnp.zeros_like(acc[:, :bn2])

            acc[:, :bn2] = group_dot(
                acc[:, :bn2],
                lambda g, k=k: xn_scr[:, pl.ds((k * gpb2 + g) * G, G)],
                qw2, s2, zs2, gpb2,
            )

            @pl.when(k == KS2 - 1)
            def _():
                gu_scr[:, pl.ds(j * bn2, bn2)] = acc[:, :bn2].astype(
                    jnp.bfloat16
                )

        # ---- boundary: silu(gate) * up -> x2 (first P3 step) -------------
        @pl.when(s == S1 + S2)
        def _glu():
            g = gu_scr[:, :K3].astype(jnp.float32)
            u = gu_scr[:, K3:].astype(jnp.float32)
            x2_scr[...] = (g * jax.lax.logistic(g) * u).astype(x2_scr.dtype)

        # ---- phase 3: down (x2 [BM, K3] @ W_dn -> y) ---------------------
        @pl.when(s >= S1 + S2)
        def _p3():
            srel = s - S1 - S2
            k = srel % KS3
            j = srel // KS3

            @pl.when(k == 0)
            def _():
                acc[:, :bn3] = jnp.zeros_like(acc[:, :bn3])

            acc[:, :bn3] = group_dot(
                acc[:, :bn3],
                lambda g, k=k: x2_scr[:, pl.ds((k * gpb3 + g) * G, G)],
                qw3, s3, zs3, gpb3,
            )

            @pl.when(k == KS3 - 1)
            def _():
                y_ref[...] = (
                    acc[:, :bn3].astype(jnp.bfloat16)
                    + h_scr[:, pl.ds(j * bn3, bn3)]
                ).astype(y_ref.dtype)

    return kernel, (S1, S2, S3)


@functools.partial(jax.jit, static_argnames=("eps", "interpret"))
def fused_layer_tail(
    attn_out: jax.Array,   # [M, K1] pre-o attention output (M <= 8)
    x_resid: jax.Array,    # [M, D] the layer's residual stream
    norm_w: jax.Array,     # [D] mlp RMSNorm weight
    o_qw: jax.Array, o_s: jax.Array, o_zs: jax.Array,
    gu_qw: jax.Array, gu_s: jax.Array, gu_zs: jax.Array,
    dn_qw: jax.Array, dn_s: jax.Array, dn_zs: jax.Array,
    eps: float = 1e-6,
    interpret: bool = False,
) -> jax.Array:
    """Returns the layer output y [M, D] (= x + o(attn) + mlp(norm(x + o)))."""
    M, K1 = attn_out.shape
    D = o_qw.shape[1]
    N2 = gu_qw.shape[1]
    K3 = dn_qw.shape[0] * PACK
    G = 128
    t1 = _tail_tiles(D, K1 // G, 16384)     # o: 1MB blocks
    t2 = _tail_tiles(N2, D // G, 32768)     # gate_up: 2MB (4.2MB measured
    # SLOWER — 171 vs 157 us: the next-block prefetch outruns the step)
    t3 = _tail_tiles(D, K3 // G, 32768)     # down: 2MB
    kernel, (S1, S2, S3) = _make_tail_kernel(
        ((K1, D), (D, N2), (K3, D)), (t1, t2, t3), float(eps)
    )
    (bn1, gpb1), (bn2, gpb2), (bn3, gpb3) = t1, t2, t3
    ng1, ng2, ng3 = K1 // G, D // G, K3 // G
    slab = G // PACK
    KS1, KS2, KS3 = ng1 // gpb1, ng2 // gpb2, ng3 // gpb3
    S = S1 + S2 + S3

    ao = jnp.pad(attn_out.astype(jnp.bfloat16), ((0, BM - M), (0, 0)))
    xr = jnp.pad(x_resid.astype(jnp.bfloat16), ((0, BM - M), (0, 0)))
    nw = jnp.broadcast_to(
        norm_w.reshape(1, D).astype(jnp.bfloat16), (8, D)
    )

    def p1_map(gpb, KS, lo, hi, ks_len):
        def qw_map(s):
            srel = jnp.clip(s - lo, 0, hi - lo - 1)
            return (srel % ks_len, srel // ks_len)
        return qw_map

    def sc_map(lo, hi, ks_len):
        def m(s):
            srel = jnp.clip(s - lo, 0, hi - lo - 1)
            return (srel % ks_len, 0, srel // ks_len)
        return m

    def out_map(s):
        srel = jnp.clip(s - S1 - S2, 0, S3 - 1)
        return (0, srel // KS3)

    in_specs = [
        pl.BlockSpec((BM, K1), lambda s: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((BM, D), lambda s: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((8, D), lambda s: (0, 0), memory_space=pltpu.VMEM),
    ]
    inputs = [ao, xr, nw]
    for (qw, sc, zs, bn, gpb, lo, hi, ks_len, ng, N) in (
        (o_qw, o_s, o_zs, bn1, gpb1, 0, S1, KS1, ng1, D),
        (gu_qw, gu_s, gu_zs, bn2, gpb2, S1, S1 + S2, KS2, ng2, N2),
        (dn_qw, dn_s, dn_zs, bn3, gpb3, S1 + S2, S, KS3, ng3, D),
    ):
        qmap = p1_map(gpb, ks_len, lo, hi, ks_len)
        smap = sc_map(lo, hi, ks_len)
        in_specs += [
            pl.BlockSpec(
                (gpb * slab, bn), qmap, memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((gpb, 1, bn), smap, memory_space=pltpu.VMEM),
            pl.BlockSpec((gpb, 1, bn), smap, memory_space=pltpu.VMEM),
        ]
        inputs += [
            qw,
            sc.reshape(ng, 1, N).astype(jnp.float32),
            zs.reshape(ng, 1, N).astype(jnp.float32),
        ]

    bn_max = max(bn1, bn2, bn3)
    out = pl.pallas_call(
        kernel,
        grid=(S,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (BM, bn3), out_map, memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((BM, D), jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((BM, bn_max), jnp.float32),   # acc
            pltpu.VMEM((BM, D), jnp.bfloat16),       # h
            pltpu.VMEM((BM, D), jnp.bfloat16),       # xn
            pltpu.VMEM((BM, N2), jnp.bfloat16),      # gu
            pltpu.VMEM((BM, K3), jnp.bfloat16),      # x2
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)
        ),
        interpret=interpret,
    )(*inputs)
    return out[:M]
