"""Per-shape decode (M=1) kernel sweep over real model shapes."""
import sys; sys.path.insert(0, ".")
import time, functools
import numpy as np, jax, jax.numpy as jnp
from quick_tpu.ops.quantized_matmul import _quantized_matmul_2d
from quick_tpu.quantize.packing import pack_qtpu

G = 128
SHAPES = {  # mistral-7b decode GEMMs
    "qkv": (4096, 6144), "o": (4096, 4096),
    "gate_up": (4096, 28672), "down": (14336, 4096),
}
rng = np.random.default_rng(0)
for name in sys.argv[1:]:
    K, N = SHAPES[name]
    q = rng.integers(0, 16, (K, N), dtype=np.uint8)
    qw = jnp.asarray(pack_qtpu(q, G))
    s = jnp.asarray(rng.random((K // G, N), dtype=np.float32) * 0.02)
    zs = jnp.asarray(rng.random((K // G, N), dtype=np.float32))
    x = jnp.asarray(rng.standard_normal((1, K)) * 0.1, jnp.bfloat16)
    @functools.partial(jax.jit, static_argnames="n")
    def loop(qw, s, zs, x, n):
        def body(i, xx):
            y = _quantized_matmul_2d(xx, qw, s, zs, group_size=G)
            return (xx + 0.0 * y[:, :K]).astype(xx.dtype) if y.shape[1] >= K else xx + 0.0 * jnp.pad(y, ((0,0),(0,K-y.shape[1])))[:, :K]
        return jax.lax.fori_loop(0, n, body, x)
    def run(n):
        np.asarray(loop(qw, s, zs, x, n)[:1,:1]); best=np.inf
        for _ in range(4):
            t0=time.perf_counter(); np.asarray(loop(qw, s, zs, x, n)[:1,:1]); best=min(best,time.perf_counter()-t0)
        return best
    per = (run(510) - run(10)) / 500
    wb = K*N/2 + 2*(K//G)*N*4
    print(f"{name:8s} K={K:6d} N={N:6d}: {per*1e6:6.1f} us  {wb/per/1e9:5.0f} GB/s", flush=True)
