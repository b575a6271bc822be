"""Fused-kernel vs dense-dequant matmul over prefill-shaped M.

Picks the QUICK_TPU_DENSE_M threshold: at large M the dense bf16 MXU dot
beats the fused unpack kernel (compute-bound regime); the dequant
materialization amortizes over rows. Run from repo root on TPU:

    python tools/dense_m_sweep.py [Ms...]   # default 256 512 1024 2048 4096 8192
"""
import sys, time, functools
import numpy as np, jax, jax.numpy as jnp

sys.path.insert(0, ".")
from quick_tpu.ops.quantized_matmul import (
    _quantized_matmul_2d, _quantized_matmul_dense)
from quick_tpu.quantize.packing import pack_qtpu

K = N = 8192
G = 128
rng = np.random.default_rng(0)
q = rng.integers(0, 16, (K, N), dtype=np.uint8)
qw = jnp.asarray(pack_qtpu(q, G))
s = jnp.asarray(rng.random((K // G, N), dtype=np.float32) * 0.02)
zs = jnp.asarray(rng.random((K // G, N), dtype=np.float32))

Ms = [int(a) for a in sys.argv[1:]] or [256, 512, 1024, 2048, 4096, 8192]

for M in Ms:
    x = jnp.asarray(rng.standard_normal((M, K)) * 0.1, jnp.bfloat16)
    for tag, fn in (("kernel", _quantized_matmul_2d),
                    ("dense ", _quantized_matmul_dense)):

        @functools.partial(jax.jit, static_argnames="n")
        def loop(qw, s, zs, x, n, fn=fn):
            def body(i, xx):
                y = fn(xx, qw, s, zs, group_size=G)
                return (xx + 0.0 * y[:, :K]).astype(xx.dtype)
            return jax.lax.fori_loop(0, n, body, x)

        n1, n2 = (4, 54) if M >= 2048 else (10, 110)
        for n in (n1, n2):
            np.asarray(loop(qw, s, zs, x, n))
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter(); np.asarray(loop(qw, s, zs, x, n2)); t1 = time.perf_counter()
            np.asarray(loop(qw, s, zs, x, n1)); t2 = time.perf_counter()
            best = min(best, ((t1 - t0) - (t2 - t1)) / (n2 - n1))
        tf = 2 * M * K * N / best / 1e12
        print(f"M={M:5d} {tag}: {best*1e6:8.1f} us  {tf:6.1f} TFLOPS", flush=True)
