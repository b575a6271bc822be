"""INT4 weight packing: the QTPU interleaved layout + AutoAWQ interop.

The QTPU layout is this framework's analog of the reference's QUICK offline
interleave (quick/awq/modules/linear/quick.py:89-150). The GPU reference
reorders nibbles so one ``uint4`` load per thread is ``mma``-fragment-ready;
here the co-design target is the TPU's (sublane × lane) vector layout and the
MXU's VMEM operand order:

**QTPU format** — for weight q [K, N] (codes 0..15), group size G, SLAB = G//8:
``qweight`` is int32 [K//8, N]. Within group ``g``, word ``(g*SLAB + k8, n)``
holds nibble ``j`` = code ``q[g*G + j*SLAB + k8, n]`` (j-major row order).
Inside the Pallas kernel, slab ``j`` = ``(qw >> 4j) & 0xF`` is then a
*contiguous* [SLAB, N] row-block; for G=128, SLAB=16 matches the bf16
(16, 128) native tile exactly, so the 8 slabs concatenate along sublanes with
zero shuffles — unpack is shift/mask/convert only, the TPU equivalent of
QUICK's "no shared-memory write-back" property (reference README.md:20-24).

Scales are NOT duplicated (the reference's 2x duplication,
linear/quick.py:52-54, is an ``mma`` fragment artifact with no TPU analog).
Instead we store ``scales`` [K//G, N] and ``zeros_x_scales = z*s`` [K//G, N]
so the kernel can factor both out of the inner loop:
``out = sum_g (x_g @ q_g) * s_g - xsum @ (z*s)``.

Also provided: pack/unpack for the AutoAWQ **GEMM** layout
(column-interleaved order_map, reference quick/awq/modules/linear/gemm.py:116
and utils/packing_utils.py:4-96) so existing AWQ checkpoints can be imported
and our checkpoints exported.
"""
from __future__ import annotations

from typing import Tuple

import numpy as np

PACK = 8  # int4 nibbles per int32 word

# AutoAWQ GEMM column interleave (reference linear/gemm.py:116) and its
# inverse (reference utils/packing_utils.py:10).
AWQ_ORDER = np.array([0, 2, 4, 6, 1, 3, 5, 7])
AWQ_REVERSE_ORDER = np.array([0, 4, 1, 5, 2, 6, 3, 7])


# ---------------------------------------------------------------------------
# QTPU native layout
# ---------------------------------------------------------------------------

def pack_qtpu(q: np.ndarray, group_size: int = 128) -> np.ndarray:
    """Pack codes [K, N] (uint8, 0..15) into QTPU int32 [K//8, N].

    j-major within-group nibble order (see module docstring). Uses the
    native C++ packer when available (quick_tpu/_native), numpy otherwise —
    bit-identical paths.
    """
    K, N = q.shape
    if K % group_size:
        raise ValueError(f"K={K} not divisible by group_size={group_size}")
    if group_size % PACK:
        raise ValueError(f"group_size={group_size} not divisible by {PACK}")
    from quick_tpu._native import pack_qtpu_native

    native = pack_qtpu_native(q, group_size)
    if native is not None:
        return native
    slab = group_size // PACK
    qg = np.ascontiguousarray(q).reshape(K // group_size, PACK, slab, N)
    qg = qg.astype(np.uint32)
    words = np.zeros((K // group_size, slab, N), dtype=np.uint32)
    for j in range(PACK):
        # mask to the nibble like the native packer (& 0xF): an
        # out-of-range code must not bleed into the adjacent nibble —
        # the two paths stay bit-identical
        words |= (qg[:, j] & np.uint32(0xF)) << np.uint32(4 * j)
    return words.reshape(K // PACK, N).view(np.int32)


def unpack_qtpu(qweight: np.ndarray, group_size: int = 128) -> np.ndarray:
    """Inverse of :func:`pack_qtpu`: int32 [K//8, N] -> uint8 codes [K, N]."""
    from quick_tpu._native import unpack_qtpu_native

    native = unpack_qtpu_native(qweight, group_size)
    if native is not None:
        return native
    K8, N = qweight.shape
    K = K8 * PACK
    slab = group_size // PACK
    words = qweight.view(np.uint32).reshape(K // group_size, slab, N)
    out = np.empty((K // group_size, PACK, slab, N), dtype=np.uint8)
    for j in range(PACK):
        out[:, j] = ((words >> np.uint32(4 * j)) & np.uint32(0xF)).astype(np.uint8)
    return out.reshape(K, N)


# ---------------------------------------------------------------------------
# AutoAWQ GEMM layout interop
# ---------------------------------------------------------------------------

def pack_awq_gemm(q_t: np.ndarray) -> np.ndarray:
    """Pack codes laid out [K, N] into AutoAWQ GEMM int32 [K, N//8].

    Column-packed with AWQ_ORDER interleave (reference
    quick/awq/modules/linear/gemm.py:100-121 packs along output channels).
    """
    K, N = q_t.shape
    if N % PACK:
        raise ValueError(f"N={N} not divisible by {PACK}")
    cols = q_t.reshape(K, N // PACK, PACK).astype(np.uint32)
    cols = cols[:, :, AWQ_ORDER]  # nibble j holds column AWQ_ORDER[j]
    words = np.zeros((K, N // PACK), dtype=np.uint32)
    for j in range(PACK):
        words |= (cols[:, :, j] & np.uint32(0xF)) << np.uint32(4 * j)
    return words.view(np.int32)


def unpack_awq_gemm(qweight: np.ndarray) -> np.ndarray:
    """Unpack AutoAWQ GEMM int32 [K, N//8] -> codes [K, N].

    Equivalent to reference ``unpack_awq`` + ``reverse_awq_order``
    (quick/awq/utils/packing_utils.py:4-42).
    """
    K, N8 = qweight.shape
    words = qweight.view(np.uint32)
    nibbles = np.empty((K, N8, PACK), dtype=np.uint8)
    for j in range(PACK):
        nibbles[:, :, j] = ((words >> np.uint32(4 * j)) & np.uint32(0xF)).astype(np.uint8)
    # nibble j is column AWQ_ORDER[j]; invert the interleave
    nibbles = nibbles[:, :, AWQ_REVERSE_ORDER]
    return nibbles.reshape(K, N8 * PACK)


def import_awq_gemm(
    qweight: np.ndarray,
    qzeros: np.ndarray,
    scales: np.ndarray,
    group_size: int = 128,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Convert an AutoAWQ GEMM checkpoint tensor triple to QTPU arrays.

    Inputs (AutoAWQ convention, reference linear/gemm.py:14-36):
      qweight [K, N//8] int32, qzeros [K//G, N//8] int32, scales [K//G, N].
    Returns (qweight_qtpu [K//8, N] int32, scales [K//G, N] f32,
             zeros_x_scales [K//G, N] f32).
    """
    q = unpack_awq_gemm(qweight)                    # [K, N]
    z = unpack_awq_gemm(qzeros).astype(np.float32)  # [K//G, N]
    s = scales.astype(np.float32)
    return pack_qtpu(q, group_size), s, z * s


def export_awq_gemm(
    qweight_qtpu: np.ndarray,
    scales: np.ndarray,
    zeros_x_scales: np.ndarray,
    group_size: int = 128,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Inverse of :func:`import_awq_gemm` (QTPU -> AutoAWQ GEMM triple)."""
    q = unpack_qtpu(qweight_qtpu, group_size)
    s = scales.astype(np.float32)
    z = np.round(zeros_x_scales / np.clip(s, 1e-10, None)).astype(np.uint8)
    return pack_awq_gemm(q), pack_awq_gemm(z), s.astype(np.float16)


# ---------------------------------------------------------------------------
# AutoAWQ GEMV layout interop
# ---------------------------------------------------------------------------
# GEMV convention (reference quick/awq/modules/linear/gemv.py:15-27, 80-157):
# qweight int32 [OC, IC//8] with natural nibble order along IC; qzeros
# int32 [OC, zw] (zw = zeros width padded to pack/size multiples); scales
# fp16 [OC, zw*8] zero-padded beyond the true n_groups columns.

def calculate_zeros_width(in_features: int, group_size: int = 128,
                          pack_num: int = PACK) -> int:
    """Padded zeros width (reference gemv.py:15-27)."""
    if group_size >= 128:
        size_multiplier = 1
    elif group_size == 64:
        size_multiplier = 2
    elif group_size == 32:
        size_multiplier = 4
    else:
        raise NotImplementedError(f"group_size={group_size}")
    base = -(-(in_features // group_size) // pack_num)
    return -(-base // size_multiplier) * size_multiplier


def _unpack_words_lastdim(words: np.ndarray) -> np.ndarray:
    """int32 [..., W] -> uint8 nibbles [..., W*8], natural order."""
    w = words.view(np.uint32)
    out = np.empty(w.shape + (PACK,), np.uint8)
    for j in range(PACK):
        out[..., j] = ((w >> np.uint32(4 * j)) & np.uint32(0xF)).astype(np.uint8)
    return out.reshape(*w.shape[:-1], w.shape[-1] * PACK)


def import_awq_gemv(
    qweight: np.ndarray,
    qzeros: np.ndarray,
    scales: np.ndarray,
    group_size: int = 128,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Convert an AutoAWQ GEMV-layout tensor triple to QTPU arrays
    (same return contract as :func:`import_awq_gemm`)."""
    OC, IC8 = qweight.shape
    IC = IC8 * PACK
    ng = IC // group_size
    q = _unpack_words_lastdim(qweight).T            # [IC, OC]
    z = _unpack_words_lastdim(qzeros)[:, :ng].T     # [ng, OC]
    s = scales[:, :ng].astype(np.float32).T         # [ng, OC]
    return (
        pack_qtpu(np.ascontiguousarray(q), group_size),
        np.ascontiguousarray(s),
        np.ascontiguousarray(z.astype(np.float32) * s),
    )


# ---------------------------------------------------------------------------
# Exllama(v1/v2) layout interop
# ---------------------------------------------------------------------------
# Exllama/GPTQ convention (reference quick/awq/utils/packing_utils.py:42-80
# ``pack_exllama``/``unpack_reorder_pack``): qweight packs 8 consecutive K
# rows per int32 in natural nibble order (rowwise); qzeros packs 8
# consecutive N columns per int32 (columnwise) with the zero point stored
# MINUS 1 (exllama adds 1 in its kernel).

def pack_exllama(q: np.ndarray, zeros: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Codes [K, N] + integer zeros [K//G, N] -> exllama (qweight [K//8, N],
    qzeros [K//G, N//8])."""
    K, N = q.shape
    if K % PACK or N % PACK:
        raise ValueError(f"K={K}, N={N} must be divisible by {PACK}")
    rows = q.reshape(K // PACK, PACK, N).astype(np.uint32)
    qweight = np.zeros((K // PACK, N), np.uint32)
    for j in range(PACK):
        qweight |= rows[:, j, :] << np.uint32(4 * j)
    iz = (zeros.astype(np.int64) - 1).astype(np.uint32) & np.uint32(0xF)
    cols = iz.reshape(zeros.shape[0], N // PACK, PACK)
    qzeros = np.zeros((zeros.shape[0], N // PACK), np.uint32)
    for j in range(PACK):
        qzeros |= cols[:, :, j] << np.uint32(4 * j)
    return qweight.view(np.int32), qzeros.view(np.int32)


def unpack_exllama(
    qweight: np.ndarray, qzeros: np.ndarray
) -> Tuple[np.ndarray, np.ndarray]:
    """Exllama (qweight [K//8, N], qzeros [K//G, N//8]) -> codes [K, N] +
    integer zeros [K//G, N] (the +1 restored)."""
    K8, N = qweight.shape
    words = qweight.view(np.uint32)
    q = np.empty((K8, PACK, N), np.uint8)
    for j in range(PACK):
        q[:, j, :] = ((words >> np.uint32(4 * j)) & np.uint32(0xF)).astype(np.uint8)
    zw = qzeros.view(np.uint32)
    z = np.empty((qzeros.shape[0], qzeros.shape[1], PACK), np.uint8)
    for j in range(PACK):
        z[:, :, j] = ((zw >> np.uint32(4 * j)) & np.uint32(0xF)).astype(np.uint8)
    zeros = (z.reshape(qzeros.shape[0], -1).astype(np.int64) + 1) & 0xF
    return q.reshape(K8 * PACK, N), zeros.astype(np.uint8)


def gemm_to_exllama(
    qweight: np.ndarray, qzeros: np.ndarray
) -> Tuple[np.ndarray, np.ndarray]:
    """AutoAWQ GEMM tensors -> exllama tensors (reference
    ``unpack_reorder_pack``, packing_utils.py:65-80): unpack + un-interleave,
    subtract 1 from zeros, repack row/columnwise."""
    q = unpack_awq_gemm(qweight)
    z = unpack_awq_gemm(qzeros)
    return pack_exllama(q, z)


def import_exllama(
    qweight: np.ndarray,
    qzeros: np.ndarray,
    scales: np.ndarray,
    group_size: int = 128,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Convert an exllama/GPTQ-layout tensor triple to QTPU arrays
    (same return contract as :func:`import_awq_gemm`)."""
    q, z = unpack_exllama(qweight, qzeros)
    s = scales.astype(np.float32)
    return pack_qtpu(q, group_size), s, z.astype(np.float32) * s
