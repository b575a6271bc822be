"""Kernel M-sweep microbenchmark (run from repo root on TPU):
    python tools/msweep.py 1 8 64          # W4A16
    python tools/msweep.py --a8 64 128     # W4A8 (int8 activations)
"""
import sys; sys.path.insert(0, ".")
import functools, time, sys
import numpy as np, jax, jax.numpy as jnp
from quick_tpu.ops.quantized_matmul import (
    _quantized_matmul_2d,
    _quantized_matmul_2d_a8,
)
from quick_tpu.quantize.packing import pack_qtpu

K, N, G = 8192, 8192, 128
rng = np.random.default_rng(0)
q = rng.integers(0, 16, (K, N), dtype=np.uint8)
qw = jnp.asarray(pack_qtpu(q, G))
s = jnp.asarray(rng.random((K // G, N), dtype=np.float32) * 0.02)
zs = jnp.asarray(rng.random((K // G, N), dtype=np.float32))

def timeit(M, n1, n2, a8=False):
    mm = _quantized_matmul_2d_a8 if a8 else _quantized_matmul_2d
    x0 = jnp.asarray(rng.standard_normal((M, K)) * 0.1, jnp.bfloat16)
    @functools.partial(jax.jit, static_argnames="n")
    def loop(x, n):
        def body(i, x):
            y = mm(x, qw, s, zs, group_size=G)
            return y[:, :K] * jnp.bfloat16(1e-2)
        return jax.lax.fori_loop(0, n, body, x)
    def run(n):
        np.asarray(loop(x0, n)[:1,:1])
        best = np.inf
        for _ in range(4):
            t0 = time.perf_counter(); np.asarray(loop(x0, n)[:1,:1]); best = min(best, time.perf_counter()-t0)
        return best
    per = (run(n2) - run(n1)) / (n2 - n1)
    tf = 2*M*K*N/per/1e12
    wgb = (K*N/2 + 2*(K//G)*N*4)/per/1e9
    print(f"M={M:4d}: {per*1e6:8.1f} us  {tf:7.1f} TFLOPS  weights {wgb:5.0f} GB/s", flush=True)

args = sys.argv[1:]
a8 = "--a8" in args
args = [a for a in args if a != "--a8"]
for a in args:
    M = int(a)
    n1, n2 = (10, 510) if M <= 64 else (4, 104)
    timeit(M, n1, n2, a8=a8)
