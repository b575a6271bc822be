"""Tile-parameter sweep for the fused W4A16/W4A8 kernel at a fixed (M, K, N).

Usage: python tools/tile_sweep.py [--a8] M K N "bn:gpb[:bm],..."
e.g.:  python tools/tile_sweep.py 64 4096 28672 "1024:16,2048:8,512:32"
       python tools/tile_sweep.py --a8 256 8192 8192 "1024:16:256,512:32:128"
"""
import sys; sys.path.insert(0, ".")
import functools, time
import numpy as np, jax, jax.numpy as jnp
from quick_tpu.ops.quantized_matmul import (
    _quantized_matmul_2d,
    _quantized_matmul_2d_a8,
)
from quick_tpu.quantize.packing import pack_qtpu

G = 128
args = sys.argv[1:]
a8 = "--a8" in args
args = [a for a in args if a != "--a8"]
M, K, N = int(args[0]), int(args[1]), int(args[2])
configs = []
for c in args[3].split(","):
    parts = list(map(int, c.split(":")))
    configs.append((parts[0], parts[1], parts[2] if len(parts) > 2 else None))

rng = np.random.default_rng(0)
q = rng.integers(0, 16, (K, N), dtype=np.uint8)
qw = jnp.asarray(pack_qtpu(q, G))
s = jnp.asarray(rng.random((K // G, N), dtype=np.float32) * 0.02)
zs = jnp.asarray(rng.random((K // G, N), dtype=np.float32))
x = jnp.asarray(rng.standard_normal((M, K)) * 0.1, jnp.bfloat16)
mm = _quantized_matmul_2d_a8 if a8 else _quantized_matmul_2d

for bn, gpb, bm in configs:
    @functools.partial(jax.jit, static_argnames=("n", "bn", "gpb", "bm"))
    def loop(qw, s, zs, x, n, bn=None, gpb=None, bm=None):
        def body(i, xx):
            y = mm(xx, qw, s, zs, group_size=G, bn=bn, gpb=gpb, bm=bm)
            if y.shape[1] >= K:
                return (xx + 0.0 * y[:, :K]).astype(xx.dtype)
            return (xx + 0.0 * jnp.pad(y, ((0, 0), (0, K - y.shape[1])))).astype(xx.dtype)
        return jax.lax.fori_loop(0, n, body, x)

    def run(n):
        np.asarray(loop(qw, s, zs, x, n, bn=bn, gpb=gpb, bm=bm)[:1, :1])
        best = np.inf
        for _ in range(4):
            t0 = time.perf_counter()
            np.asarray(loop(qw, s, zs, x, n, bn=bn, gpb=gpb, bm=bm)[:1, :1])
            best = min(best, time.perf_counter() - t0)
        return best

    try:
        if len(args) > 4:
            n1, n2 = map(int, args[4].split(":"))
        else:
            n1, n2 = (10, 310) if M <= 64 else (4, 104)
        per = (run(n2) - run(n1)) / (n2 - n1)
        wb = K * N / 2 + 2 * (K // G) * N * 4
        tf = 2 * M * K * N / per / 1e12
        print(f"bn={bn:5d} gpb={gpb:3d} bm={bm}: {per*1e6:7.1f} us  "
              f"{wb/per/1e9:5.0f} GB/s(wt)  {tf:6.1f} TFLOPS", flush=True)
    except Exception as e:
        print(f"bn={bn:5d} gpb={gpb:3d} bm={bm}: FAIL {type(e).__name__}: {str(e)[:120]}",
              flush=True)
