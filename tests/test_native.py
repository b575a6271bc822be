"""Native C++ packer: bit-equivalence with the numpy paths + availability."""
import numpy as np
import pytest

from quick_tpu._native import (
    awq_gemm_to_qtpu_native,
    get_lib,
    pack_qtpu_native,
    unpack_qtpu_native,
)
from quick_tpu.quantize import packing


def _numpy_pack(q, G):
    """The pure-numpy QTPU pack (bypassing the native hook)."""
    K, N = q.shape
    slab = G // 8
    qg = q.reshape(K // G, 8, slab, N).astype(np.uint32)
    words = np.zeros((K // G, slab, N), dtype=np.uint32)
    for j in range(8):
        words |= qg[:, j] << np.uint32(4 * j)
    return words.reshape(K // 8, N).view(np.int32)


@pytest.fixture(scope="module")
def lib():
    lib = get_lib()
    if lib is None:
        pytest.skip("native packer unavailable")
    return lib


@pytest.mark.parametrize("G", [32, 128])
def test_native_pack_matches_numpy(lib, rng, G):
    q = rng.integers(0, 16, (512, 96), dtype=np.uint8)
    np.testing.assert_array_equal(pack_qtpu_native(q, G), _numpy_pack(q, G))


def test_native_unpack_round_trip(lib, rng):
    q = rng.integers(0, 16, (256, 64), dtype=np.uint8)
    packed = pack_qtpu_native(q, 128)
    np.testing.assert_array_equal(unpack_qtpu_native(packed, 128), q)


def test_native_awq_to_qtpu_fused(lib, rng):
    """The fused AWQ->QTPU repack must equal unpack-then-pack."""
    K, N, G = 256, 64, 128
    q = rng.integers(0, 16, (K, N), dtype=np.uint8)
    awq = packing.pack_awq_gemm(q)
    fused = awq_gemm_to_qtpu_native(awq, N, G)
    two_step = _numpy_pack(packing.unpack_awq_gemm(awq), G)
    np.testing.assert_array_equal(fused, two_step)


def test_packing_module_uses_native_transparently(rng):
    """pack_qtpu through the public API stays correct regardless of backend."""
    q = rng.integers(0, 16, (256, 32), dtype=np.uint8)
    a = packing.pack_qtpu(q, 128)
    np.testing.assert_array_equal(packing.unpack_qtpu(a, 128), q)
    np.testing.assert_array_equal(a, _numpy_pack(q, 128))
