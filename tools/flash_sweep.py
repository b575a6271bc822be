"""Flash prefill kernel sweep: S x (bq, bk) timing at 7B shapes.

Run from repo root on TPU:
    python tools/flash_sweep.py [S ...]          # default 2048 4096 8192
Reports us/call and causal-adjusted TFLOPS per tile config.
"""
import sys; sys.path.insert(0, ".")
import functools, time

import numpy as np, jax, jax.numpy as jnp

from quick_tpu.ops.flash_attention import flash_attention

B, Hq, Hkv, D = 1, 32, 8, 128
TILES = [(512, 512), (1024, 512), (512, 1024), (1024, 1024)]


@functools.partial(jax.jit, static_argnames=("n", "bq", "bk"))
def loop(q, k, v, n, bq, bk):
    def body(i, qq):
        out = flash_attention(qq, k, v, bq=bq, bk=bk)
        return (qq + 0.0 * out).astype(qq.dtype)
    return jax.lax.fori_loop(0, n, body, q)


def bench(S, bq, bk, n1, n2):
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, S, Hq, D)) * 0.3, jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((B, S, Hkv, D)) * 0.3, jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((B, S, Hkv, D)) * 0.3, jnp.bfloat16)

    def run(n):
        np.asarray(loop(q, k, v, n, bq, bk)[:1, :1, :1])
        best = np.inf
        for _ in range(4):
            t0 = time.perf_counter()
            np.asarray(loop(q, k, v, n, bq, bk)[:1, :1, :1])
            best = min(best, time.perf_counter() - t0)
        return best

    per = (run(n2) - run(n1)) / (n2 - n1)
    fl = 4 * S * S * D * Hq / 2  # causal-adjusted
    print(f"S={S} bq={bq} bk={bk}: {per*1e6:.1f} us  "
          f"{fl/per/1e12:.1f} TFLOPS (causal-adj)", flush=True)


def main():
    sizes = [int(a) for a in sys.argv[1:]] or [2048, 4096, 8192]
    for S in sizes:
        n1, n2 = (10, 210) if S >= 4096 else (10, 510)
        if S >= 8192:
            n1, n2 = (5, 55)
        for bq, bk in TILES:
            if bq > S or bk > S:
                continue
            bench(S, bq, bk, n1, n2)


if __name__ == "__main__":
    main()
