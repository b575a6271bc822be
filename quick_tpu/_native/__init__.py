"""Native (C++) acceleration for offline weight packing.

Compiles ``packer.cpp`` to a shared library on first import (g++, baked into
the image) and binds it via ctypes — the TPU-native stand-in for the
reference's torch CUDAExtension build (reference setup.py:55-97). Falls back
to the pure-numpy implementations in quick_tpu.quantize.packing when the
toolchain is unavailable; both paths are bit-identical (property-tested).
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import sys
from typing import Optional

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "packer.cpp")
_LIB = os.path.join(_HERE, "libqtpu_packer.so")

_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", _LIB],
            check=True, capture_output=True, timeout=120,
        )
        return True
    except Exception as e:  # toolchain missing / failed: numpy fallback
        print(f"[quick_tpu] native packer build failed ({e}); "
              "using numpy fallback", file=sys.stderr)
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native packer, or None."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if os.environ.get("QUICK_TPU_NO_NATIVE") == "1":
        return None
    if not os.path.exists(_LIB) or (
        os.path.getmtime(_LIB) < os.path.getmtime(_SRC)
    ):
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(_LIB)
        i64, u8p, i32p = (
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_int32),
        )
        lib.qtpu_pack.argtypes = [u8p, i32p, i64, i64, i64]
        lib.qtpu_unpack.argtypes = [i32p, u8p, i64, i64, i64]
        lib.awq_gemm_pack.argtypes = [u8p, i32p, i64, i64]
        lib.awq_gemm_unpack.argtypes = [i32p, u8p, i64, i64]
        lib.awq_gemm_to_qtpu.argtypes = [i32p, i32p, i64, i64, i64]
        _lib = lib
    except OSError as e:
        print(f"[quick_tpu] native packer load failed ({e})", file=sys.stderr)
    return _lib


def _ptr(arr, ctype):
    return arr.ctypes.data_as(ctypes.POINTER(ctype))


def pack_qtpu_native(q, group_size: int):
    import numpy as np

    lib = get_lib()
    if lib is None:
        return None
    q = np.ascontiguousarray(q, dtype=np.uint8)
    K, N = q.shape
    out = np.empty((K // 8, N), dtype=np.int32)
    lib.qtpu_pack(_ptr(q, ctypes.c_uint8), _ptr(out, ctypes.c_int32),
                  K, N, group_size)
    return out


def unpack_qtpu_native(qweight, group_size: int):
    import numpy as np

    lib = get_lib()
    if lib is None:
        return None
    qweight = np.ascontiguousarray(qweight, dtype=np.int32)
    K8, N = qweight.shape
    out = np.empty((K8 * 8, N), dtype=np.uint8)
    lib.qtpu_unpack(_ptr(qweight, ctypes.c_int32), _ptr(out, ctypes.c_uint8),
                    K8 * 8, N, group_size)
    return out


def awq_gemm_to_qtpu_native(qweight_awq, N: int, group_size: int):
    import numpy as np

    lib = get_lib()
    if lib is None:
        return None
    qw = np.ascontiguousarray(qweight_awq, dtype=np.int32)
    K = qw.shape[0]
    out = np.empty((K // 8, N), dtype=np.int32)
    lib.awq_gemm_to_qtpu(_ptr(qw, ctypes.c_int32), _ptr(out, ctypes.c_int32),
                         K, N, group_size)
    return out
