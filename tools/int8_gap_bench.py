"""Where does INT8 KV lose vs bf16 at serving scale? Stage breakdown.

engine_bench at 128 slots measures bf16 5591 tok/s (22.9 ms/step) vs INT8
3947 (32.4 ms/step) — INT8 streams HALF the KV bytes yet is 40% slower.
This tool times the two INT8-specific stages in isolation at the same
shapes to locate the regression:

  1. paged_decode_attention, bf16 vs int8 pages (B=128, page=64, len=190)
  2. PagedKVCache.update decode write, bf16 vs int8 (Pallas RMW + the
     INT8 scale scatter)

Run from repo root on TPU:
    JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache \
    JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=5 \
    timeout 590 python tools/int8_gap_bench.py
"""
import sys; sys.path.insert(0, ".")
import dataclasses, functools, time
import numpy as np, jax, jax.numpy as jnp

from quick_tpu.modules.paged_cache import PagedKVCache
from quick_tpu.ops.paged_attention import paged_decode_attention

L, B, Hq, Hkv, D, page = 32, 128, 32, 8, 128, 64
n_pt = 4                 # max_seq 256
LEN = 190
n_pages = 1 + B * n_pt
rng = np.random.default_rng(0)
q = jnp.asarray(rng.standard_normal((B, Hq, D)) * 0.3, jnp.bfloat16)
bt = jnp.asarray(
    rng.permutation(np.arange(1, n_pages))[: B * n_pt].reshape(B, n_pt),
    jnp.int32)
lens = jnp.full((B,), LEN, jnp.int32)


def diff_time(run, n1=10, n2=210, reps=4):
    run(n1)
    best1 = best2 = np.inf
    for _ in range(reps):
        t0 = time.perf_counter(); run(n1); best1 = min(best1, time.perf_counter() - t0)
        t0 = time.perf_counter(); run(n2); best2 = min(best2, time.perf_counter() - t0)
    return (best2 - best1) / (n2 - n1)


# ---- stage 1: attention kernel (single layer's pages, L folded = 1) ----
def bench_attn(tag, kp, vp, sc, bytes_tok):
    @functools.partial(jax.jit, static_argnames="n")
    def loop(q, n):
        def body(i, qq):
            o = paged_decode_attention(qq, kp, vp, bt, lens,
                                       kv_scales=sc)
            return qq + 0.0 * o.astype(qq.dtype)
        return jax.lax.fori_loop(0, n, body, q)
    per = diff_time(lambda n: np.asarray(loop(q, n)[:1, :1]))
    toks = B * LEN
    print(f"attn {tag}: {per*1e6:7.1f} us/step  "
          f"({toks*bytes_tok/per/1e9:5.0f} GB/s eff KV)", flush=True)
    return per


# ---- stage 2: cache decode write (one layer per iteration) ----
def bench_write(tag, dtype):
    cache = PagedKVCache.create(L, n_pages, page, B, n_pt * page, Hkv, D,
                                dtype)
    cache = dataclasses.replace(cache, block_table=bt, length=lens)
    kn = jnp.asarray(rng.standard_normal((B, 1, Hkv, D)) * 0.3, jnp.bfloat16)
    start = lens

    # NO donation: the timed call must be repeatable (donating would
    # delete the cache after the first run); the one defensive copy per
    # call is a constant the differential timing cancels
    @functools.partial(jax.jit, static_argnames="n")
    def loop(cache, n):
        def body(i, c):
            return c.update(0, kn, kn, start)
        return jax.lax.fori_loop(0, n, body, cache)
    per = diff_time(lambda n: np.asarray(loop(cache, n).k_pages[0, 1, 0, 0, :1]),
                    n1=10, n2=510)
    print(f"write {tag}: {per*1e6:7.1f} us/layer  (x{2*L} per step = "
          f"{per*2*L*1e3:.2f} ms)", flush=True)
    return per


# ---- stage 3: combined update+attention per layer (engine-step shape) ----
# The isolated stages can both be fast while the ENGINE regresses: inside
# one program the scale planes are scatter targets AND whole-stack operands
# of the attention custom call — XLA may lose in-place aliasing and copy
# the plane per layer. This mirrors blocks.py's per-layer order.
def bench_combined(tag, dtype):
    cache = PagedKVCache.create(L, n_pages, page, B, n_pt * page, Hkv, D,
                                dtype)
    cache = dataclasses.replace(cache, block_table=bt, length=lens)
    kn = jnp.asarray(rng.standard_normal((B, 1, Hkv, D)) * 0.3, jnp.bfloat16)
    start = lens

    @functools.partial(jax.jit, static_argnames="n")
    def loop(cache, n):
        def body(i, carry):
            c, acc = carry
            for layer in range(4):  # 4 layers/iter: amortize loop overhead
                c = c.update(layer, kn, kn, start)
                o = paged_decode_attention(
                    q, c.k_pages, c.v_pages, c.block_table, start + 1,
                    layer=layer,
                    kv_scales=c.kv_scales if c.quantized else None,
                )
                acc = acc + jnp.sum(o.astype(jnp.float32))
            return c, acc
        return jax.lax.fori_loop(0, n, body, (cache, jnp.zeros(())))
    per = diff_time(lambda n: np.asarray(loop(cache, n)[1]), n1=5, n2=55)
    per_layer = per / 4
    print(f"combined {tag}: {per_layer*1e6:7.1f} us/layer  (x{L} per step = "
          f"{per_layer*L*1e3:.2f} ms)", flush=True)
    return per_layer


if __name__ == "__main__":
    stages = sys.argv[1:] or ["attn_bf16", "attn_int8", "write_bf16",
                              "write_int8", "combined_bf16", "combined_int8"]
    kp = jnp.asarray(rng.standard_normal((n_pages, Hkv, page, D)) * 0.3,
                     jnp.bfloat16)
    vp = jnp.asarray(rng.standard_normal((n_pages, Hkv, page, D)) * 0.3,
                     jnp.bfloat16)
    kq = jnp.asarray(rng.integers(-127, 128, (n_pages, Hkv, page, D)), jnp.int8)
    sc = jnp.full((n_pages, 8, Hkv * page), 0.01, jnp.float32)
    for st in stages:
        t0 = time.time()
        if st == "attn_bf16":
            bench_attn("bf16", kp, vp, None, 2 * Hkv * D * 2)
        elif st == "attn_int8":
            bench_attn("int8", kq, kq, sc, 2 * Hkv * (D + 2))
        elif st == "write_bf16":
            bench_write("bf16", jnp.bfloat16)
        elif st == "write_int8":
            bench_write("int8", jnp.int8)
        elif st == "combined_bf16":
            bench_combined("bf16", jnp.bfloat16)
        elif st == "combined_int8":
            bench_combined("int8", jnp.int8)
        print(f"  [{st}: {time.time()-t0:.0f}s total]", flush=True)
