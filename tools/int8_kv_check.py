"""INT8 KV cache TPU check: kernel correctness vs dequantized pages +
decode timing vs bf16 pages (7B shapes, 8 slots x ~1k ctx, page=64).

Run from repo root: python tools/int8_kv_check.py
"""
import sys; sys.path.insert(0, ".")
import functools, time
import numpy as np, jax, jax.numpy as jnp
from quick_tpu.ops.paged_attention import paged_decode_attention

B, Hq, Hkv, D, page = 8, 32, 8, 128, 64
n_pt = 16
n_pages = 1 + B * n_pt
rng = np.random.default_rng(0)
q = jnp.asarray(rng.standard_normal((B, Hq, D)) * 0.3, jnp.bfloat16)
kp = jnp.asarray(rng.standard_normal((n_pages, Hkv, page, D)) * 0.3, jnp.bfloat16)
vp = jnp.asarray(rng.standard_normal((n_pages, Hkv, page, D)) * 0.3, jnp.bfloat16)
bt = jnp.asarray(
    rng.permutation(np.arange(1, n_pages))[: B * n_pt].reshape(B, n_pt),
    jnp.int32,
)
lens = jnp.asarray([1024, 1000, 977, 640, 333, 128, 64, 1], jnp.int32)


def quant(p):
    pf = p.astype(jnp.float32)
    amax = jnp.max(jnp.abs(pf), axis=-1)
    sc = jnp.maximum(amax / 127.0, 1e-8)
    codes = jnp.clip(jnp.round(pf / sc[..., None]), -127, 127).astype(jnp.int8)
    return codes, sc


kq, ks = quant(kp)
vq, vs = quant(vp)
# shared per-page scale tile: row 0 = k, row 1 = v (modules/paged_cache.py)
sc_tile = (
    jnp.zeros((n_pages, 8, Hkv * page), jnp.float32)
    .at[:, 0].set(ks.reshape(n_pages, -1))
    .at[:, 1].set(vs.reshape(n_pages, -1))
)

mode = sys.argv[1] if len(sys.argv) > 1 else "both"

if mode in ("correctness", "both"):
    o_bf = np.asarray(paged_decode_attention(q, kp, vp, bt, lens), np.float32)
    print("bf16 kernel done", flush=True)
    o_i8 = np.asarray(
        paged_decode_attention(q, kq, vq, bt, lens, kv_scales=sc_tile),
        np.float32,
    )
    print(f"int8-KV vs bf16-KV max abs err: {np.abs(o_i8 - o_bf).max():.2e}",
          flush=True)
if mode == "correctness":
    sys.exit(0)


def bench(fn, tag, kv_bytes_per_tok):
    @functools.partial(jax.jit, static_argnames="n")
    def loop(q, n):
        def body(i, qq):
            out = fn(qq)
            return (qq + 0.0 * out.astype(qq.dtype))
        return jax.lax.fori_loop(0, n, body, q)

    def run(n):
        np.asarray(loop(q, n)[:1, :1])
        best = np.inf
        for _ in range(4):
            t0 = time.perf_counter()
            np.asarray(loop(q, n)[:1, :1])
            best = min(best, time.perf_counter() - t0)
        return best

    per = (run(10) and 0) or (run(510) - run(10)) / 500
    toks = int(np.asarray(lens).sum())
    eff = toks * kv_bytes_per_tok / per / 1e9
    print(f"{tag}: {per*1e6:6.1f} us/step  ({eff:5.0f} GB/s effective KV)",
          flush=True)


bench(lambda qq: paged_decode_attention(qq, kp, vp, bt, lens),
      "bf16 KV", 2 * Hkv * D * 2)
bench(lambda qq: paged_decode_attention(qq, kq, vq, bt, lens,
                                        kv_scales=sc_tile),
      "int8 KV", 2 * Hkv * (D + 2))
