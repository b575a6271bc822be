"""Packed-layout property tests: QTPU round trips + AutoAWQ interop."""
import numpy as np
import pytest

from quick_tpu.quantize.packing import (
    export_awq_gemm,
    import_awq_gemm,
    pack_awq_gemm,
    pack_qtpu,
    unpack_awq_gemm,
    unpack_qtpu,
)


@pytest.mark.parametrize("group_size", [32, 64, 128])
def test_qtpu_round_trip(rng, group_size):
    q = rng.integers(0, 16, (512, 96), dtype=np.uint8)
    packed = pack_qtpu(q, group_size)
    assert packed.shape == (512 // 8, 96) and packed.dtype == np.int32
    np.testing.assert_array_equal(unpack_qtpu(packed, group_size), q)


def test_qtpu_j_major_order(rng):
    """The layout contract the Pallas kernel relies on: nibble j of word
    (g*slab + k8, n) is code q[g*G + j*slab + k8, n]."""
    G, slab = 128, 16
    q = rng.integers(0, 16, (256, 8), dtype=np.uint8)
    packed = pack_qtpu(q, G).view(np.uint32)
    for g in range(2):
        for j in range(8):
            for k8 in (0, 5, 15):
                word = packed[g * slab + k8, 3]
                assert (word >> (4 * j)) & 0xF == q[g * G + j * slab + k8, 3]


def test_awq_gemm_round_trip(rng):
    q = rng.integers(0, 16, (256, 64), dtype=np.uint8)
    packed = pack_awq_gemm(q)
    assert packed.shape == (256, 8) and packed.dtype == np.int32
    np.testing.assert_array_equal(unpack_awq_gemm(packed), q)


def test_awq_import_export_round_trip(rng):
    K, N, G = 256, 64, 128
    q = rng.integers(0, 16, (K, N), dtype=np.uint8)
    z = rng.integers(0, 16, (K // G, N), dtype=np.uint8)
    s = (rng.random((K // G, N)).astype(np.float32) * 0.02 + 1e-3)
    qw_awq, qz_awq = pack_awq_gemm(q), pack_awq_gemm(z)
    qw, s2, zs = import_awq_gemm(qw_awq, qz_awq, s, G)
    np.testing.assert_array_equal(unpack_qtpu(qw, G), q)
    np.testing.assert_allclose(zs, z.astype(np.float32) * s, rtol=1e-6)
    qw_back, qz_back, s_back = export_awq_gemm(qw, s2, zs, G)
    np.testing.assert_array_equal(qw_back, qw_awq)
    np.testing.assert_array_equal(qz_back, qz_awq)
    np.testing.assert_allclose(s_back.astype(np.float32), s, rtol=1e-2)


# ---------------------------------------------------------------------------
# Exllama layout
# ---------------------------------------------------------------------------

def test_exllama_round_trip(rng):
    from quick_tpu.quantize.packing import pack_exllama, unpack_exllama

    K, N, G = 256, 64, 128
    q = rng.integers(0, 16, (K, N), dtype=np.uint8)
    z = rng.integers(0, 16, (K // G, N), dtype=np.uint8)
    qw, qz = pack_exllama(q, z)
    assert qw.shape == (K // 8, N) and qz.shape == (K // G, N // 8)
    q2, z2 = unpack_exllama(qw, qz)
    np.testing.assert_array_equal(q2, q)
    np.testing.assert_array_equal(z2, z)


def test_exllama_minus_one_convention(rng):
    """qzeros must store z-1 (exllama kernels add 1; reference
    packing_utils.py:76-78)."""
    from quick_tpu.quantize.packing import pack_exllama

    z = np.full((1, 8), 5, np.uint8)
    q = np.zeros((8, 8), np.uint8)
    _, qz = pack_exllama(q, z)
    word = qz.view(np.uint32)[0, 0]
    for j in range(8):
        assert (word >> (4 * j)) & 0xF == 4  # 5 - 1


def test_gemm_to_exllama_consistent(rng):
    """GEMM -> exllama repack must preserve the dequantized weights
    (reference unpack_reorder_pack semantics)."""
    from quick_tpu.quantize.packing import (
        gemm_to_exllama,
        import_awq_gemm,
        import_exllama,
    )

    K, N, G = 256, 64, 128
    q = rng.integers(0, 16, (K, N), dtype=np.uint8)
    z = rng.integers(1, 15, (K // G, N), dtype=np.uint8)
    s = rng.random((K // G, N)).astype(np.float32) * 0.02 + 1e-3
    qw_g, qz_g = pack_awq_gemm(q), pack_awq_gemm(z)
    qw_e, qz_e = gemm_to_exllama(qw_g, qz_g)
    a = import_awq_gemm(qw_g, qz_g, s, G)
    b = import_exllama(qw_e, qz_e, s, G)
    np.testing.assert_array_equal(a[0], b[0])
    np.testing.assert_allclose(a[2], b[2], rtol=1e-6)


def test_gemv_import(rng):
    """AutoAWQ GEMV layout (row-major along IC, padded zeros width) must
    import to the same QTPU arrays as the GEMM layout of the same codes."""
    from quick_tpu.quantize.packing import (
        calculate_zeros_width,
        import_awq_gemm,
        import_awq_gemv,
    )

    K, N, G = 256, 64, 128
    ng = K // G
    q = rng.integers(0, 16, (K, N), dtype=np.uint8)
    z = rng.integers(0, 16, (ng, N), dtype=np.uint8)
    s = rng.random((ng, N)).astype(np.float32) * 0.02 + 1e-3

    # build GEMV tensors: qweight [N, K//8] natural, scales/zeros transposed+padded
    qw = np.zeros((N, K // 8), np.uint32)
    for j in range(8):
        qw |= q.T[:, j::8].astype(np.uint32) << np.uint32(4 * j)
    zw = calculate_zeros_width(K, G)
    qz = np.zeros((N, zw), np.uint32)
    zt = z.T  # [N, ng]
    for col in range(zw):
        for j in range(8):
            idx = col * 8 + j
            if idx < ng:
                qz[:, col] |= zt[:, idx].astype(np.uint32) << np.uint32(4 * j)
    sc = np.zeros((N, zw * 8), np.float16)
    sc[:, :ng] = s.T

    a = import_awq_gemv(qw.view(np.int32), qz.view(np.int32), sc, G)
    b = import_awq_gemm(pack_awq_gemm(q), pack_awq_gemm(z), s, G)
    np.testing.assert_array_equal(a[0], b[0])
    np.testing.assert_allclose(a[1], b[1], rtol=1e-3)
    np.testing.assert_allclose(a[2], b[2], rtol=1e-3)


def test_pack_qtpu_jax_matches_numpy(rng):
    from quick_tpu.ops.quantized_matmul import pack_qtpu_jax
    import jax.numpy as jnp

    for G in (32, 128):
        q = rng.integers(0, 16, (256, 16), dtype=np.uint8)
        np.testing.assert_array_equal(
            np.asarray(pack_qtpu_jax(jnp.asarray(q), G)), pack_qtpu(q, G)
        )
