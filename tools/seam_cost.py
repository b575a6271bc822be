"""Custom-call seam cost at decode shapes: fixed weight bytes, varying
call count.

The 13B decode budget (TODO_TPU round-4 notes) attributes ~10% to
per-invocation DMA ramps between DEPENDENT custom calls. This measures
that directly: stream the SAME ~134MB of packed weights per iteration as
a chain of n data-dependent M=1 GEMM calls (n = 1..16, splitting N), and
watch effective GB/s vs n. If GB/s is flat, XLA/Mosaic already keep the
weight stream saturated across call boundaries and a whole-layer
megakernel has nothing to win on DMA; if it falls, the slope prices each
seam. Run from repo root on TPU:  python tools/seam_cost.py
"""
import sys; sys.path.insert(0, ".")
import functools, time

import numpy as np, jax, jax.numpy as jnp

from quick_tpu.ops.quantized_matmul import _quantized_matmul_2d
from quick_tpu.quantize.packing import pack_qtpu

G = 128
K, N_TOTAL = 8192, 32768  # 8192 x 32768 int4 = 134MB packed — too big for
# the ~50MB VMEM weight-caching artifact that polluted M=1 microbenches


def build(n_splits):
    rng = np.random.default_rng(0)
    Nn = N_TOTAL // n_splits
    ws = []
    for i in range(n_splits):
        q = rng.integers(0, 16, (K, Nn), dtype=np.uint8)
        ws.append((
            jnp.asarray(pack_qtpu(q, G)),
            jnp.asarray(rng.random((K // G, Nn), np.float32) * 0.02),
            jnp.asarray(rng.random((K // G, Nn), np.float32) * 0.1),
        ))
    x0 = jnp.asarray(rng.standard_normal((1, K)) * 0.3, jnp.bfloat16)
    return ws, x0


def bench(n_splits, n1=50, n2=350):
    ws, x0 = build(n_splits)

    @functools.partial(jax.jit, static_argnames="n")
    def loop(ws, x0, n):
        def body(i, carry):
            x, acc = carry
            for (qw, s, zs) in ws:
                y = _quantized_matmul_2d(x, qw, s, zs)
                # data dependency INTO the next call without changing x's
                # value scale: fold a scalar of y into x
                x = x * (1.0 + 0.0 * jnp.sum(y).astype(x.dtype))
                acc = acc + jnp.sum(y)
            return x, acc
        return jax.lax.fori_loop(0, n, body, (x0, jnp.float32(0)))

    def run(n):
        np.asarray(loop(ws, x0, n)[1])
        best = np.inf
        for _ in range(5):
            t0 = time.perf_counter()
            np.asarray(loop(ws, x0, n)[1])
            best = min(best, time.perf_counter() - t0)
        return best

    per = (run(n2) - run(n1)) / (n2 - n1)
    bytes_it = K * N_TOTAL // 2 + (K // G) * N_TOTAL * 8
    print(f"splits={n_splits:2d} ({n_splits} calls of [{K},{N_TOTAL//n_splits}]):"
          f" {per*1e6:7.1f} us/iter  {bytes_it/per/1e9:6.1f} GB/s",
          flush=True)
    return per


def main():
    for n in (1, 2, 4, 8, 16):
        bench(n)


if __name__ == "__main__":
    main()
