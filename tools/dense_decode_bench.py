"""Dense-decode attention: einsum path vs chunked Pallas kernel (real TPU).

Sweeps (nb, c) grid layouts at 7B decode shapes. Differential in-jit
fori-loop timing (see CLAUDE.md measurement notes).

    python tools/dense_decode_bench.py --batch 64 --max_seq 256 --len 192
"""
import sys; sys.path.insert(0, ".")
import argparse, functools, time

import numpy as np, jax, jax.numpy as jnp

from quick_tpu.ops.attention import decode_attention
from quick_tpu.ops.decode_attention import dense_decode_attention


def diff_time(loop, args, n1, n2, reps=4):
    def run(n):
        np.asarray(loop(*args, n)).ravel()[:1]
        best = np.inf
        for _ in range(reps):
            t0 = time.perf_counter()
            np.asarray(loop(*args, n)).ravel()[:1]
            best = min(best, time.perf_counter() - t0)
        return best
    return (run(n2) - run(n1)) / (n2 - n1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--max_seq", type=int, default=256)
    ap.add_argument("--len", type=int, dest="length", default=192)
    ap.add_argument("--hq", type=int, default=32)
    ap.add_argument("--hkv", type=int, default=8)
    ap.add_argument("--hd", type=int, default=128)
    ap.add_argument("--n1", type=int, default=20)
    ap.add_argument("--n2", type=int, default=520)
    args = ap.parse_args()
    B, T, Hq, Hkv, D = args.batch, args.max_seq, args.hq, args.hkv, args.hd

    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, 1, Hq, D)) * 0.1, jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((B, Hkv, T, D)) * 0.1, jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((B, Hkv, T, D)) * 0.1, jnp.bfloat16)
    ln = jnp.full((B,), args.length, jnp.int32)
    kv_bytes = 2 * B * T * Hkv * D * 2
    valid_bytes = 2 * B * args.length * Hkv * D * 2
    print(f"B={B} T={T} len={args.length} Hq={Hq} Hkv={Hkv} D={D}  "
          f"KV alloc {kv_bytes/1e6:.0f} MB, valid {valid_bytes/1e6:.0f} MB",
          flush=True)

    @functools.partial(jax.jit, static_argnames="n")
    def loop_einsum(q, k, v, ln, n):
        def body(i, qq):
            out = decode_attention(qq, k, v, ln, kv_heads_major=True)
            return (qq + 0.0 * out).astype(qq.dtype)
        return jax.lax.fori_loop(0, n, body, q)

    per = diff_time(loop_einsum, (q, k, v, ln), args.n1, args.n2)
    print(f"  einsum path:            {per*1e6:7.1f} us  "
          f"{kv_bytes/per/1e9:5.0f} GB/s(alloc)", flush=True)

    for nb, c in [(1, 256), (2, 256), (2, 128), (4, 128), (8, 128),
                  (4, 256), (8, 64), (16, 64)]:
        if B % nb or T % c or nb * c > 2048:
            continue

        @functools.partial(jax.jit, static_argnames=("n", "nb", "c"))
        def loop_kernel(q, k, v, ln, n, nb=nb, c=c):
            def body(i, qq):
                out = dense_decode_attention(qq, k, v, ln, nb=nb, c=c)
                return (qq + 0.0 * out).astype(qq.dtype)
            return jax.lax.fori_loop(0, n, body, q)

        per = diff_time(loop_kernel, (q, k, v, ln), args.n1, args.n2)
        print(f"  kernel nb={nb:2d} c={c:3d}:     {per*1e6:7.1f} us  "
              f"{valid_bytes/per/1e9:5.0f} GB/s(valid)", flush=True)


main()
