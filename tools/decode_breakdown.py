"""Decode-step component breakdown at 7B shapes (run from repo root on TPU).

Times, at a given batch size, each decode GEMM shape, the decode attention
read, and one full decoder block step — in-jit differential fori loops
(axon tunnel: never time single dispatches). Usage:

    python tools/decode_breakdown.py --batch 64 --max_seq 256
"""
import sys; sys.path.insert(0, ".")
import argparse, functools, time
import numpy as np, jax, jax.numpy as jnp

from quick_tpu import ModelConfig
from quick_tpu.ops.quantized_matmul import _quantized_matmul_2d
from quick_tpu.ops.attention import causal_attention
from quick_tpu.quantize.packing import pack_qtpu

G = 128
MODELS = {
    # name: (layer GEMM shapes, ModelConfig kwargs)
    "mistral7b": (
        {"qkv": (4096, 6144), "o": (4096, 4096),
         "gate_up": (4096, 28672), "down": (14336, 4096)},
        dict(vocab_size=32000, hidden_size=4096, intermediate_size=14336,
             num_hidden_layers=32, num_attention_heads=32,
             num_key_value_heads=8, max_position_embeddings=4096,
             model_type="mistral"),
    ),
    # llama-2-13b: MHA (40 kv heads), hidden 5120 (VERDICT r3 weak #5:
    # 85.5 tok/s = ~72% of the ~119 weight-stream floor — locate the gap)
    "llama13b": (
        {"qkv": (5120, 15360), "o": (5120, 5120),
         "gate_up": (5120, 27648), "down": (13824, 5120)},
        dict(vocab_size=32000, hidden_size=5120, intermediate_size=13824,
             num_hidden_layers=40, num_attention_heads=40,
             num_key_value_heads=40, max_position_embeddings=4096,
             model_type="llama"),
    ),
}
SHAPES = MODELS["mistral7b"][0]  # overridden by --model in main()


def diff_time(loop, args, n1, n2, reps=4):
    def run(n):
        np.asarray(jax.tree_util.tree_leaves(loop(*args, n))[0]).ravel()[:1]
        best = np.inf
        for _ in range(reps):
            t0 = time.perf_counter()
            np.asarray(jax.tree_util.tree_leaves(loop(*args, n))[0]).ravel()[:1]
            best = min(best, time.perf_counter() - t0)
        return best
    return (run(n2) - run(n1)) / (n2 - n1)


def bench_gemm(name, B, n1, n2):
    K, N = SHAPES[name]
    rng = np.random.default_rng(0)
    q = rng.integers(0, 16, (K, N), dtype=np.uint8)
    qw = jnp.asarray(pack_qtpu(q, G))
    s = jnp.asarray(rng.random((K // G, N), dtype=np.float32) * 0.02)
    zs = jnp.asarray(rng.random((K // G, N), dtype=np.float32))
    x = jnp.asarray(rng.standard_normal((B, K)) * 0.1, jnp.bfloat16)

    @functools.partial(jax.jit, static_argnames="n")
    def loop(qw, s, zs, x, n):
        def body(i, xx):
            y = _quantized_matmul_2d(xx, qw, s, zs, group_size=G)
            if y.shape[1] >= K:
                return (xx + 0.0 * y[:, :K]).astype(xx.dtype)
            return (xx + 0.0 * jnp.pad(y, ((0, 0), (0, K - y.shape[1])))).astype(xx.dtype)
        return jax.lax.fori_loop(0, n, body, x)

    per = diff_time(loop, (qw, s, zs, x), n1, n2)
    wb = K * N / 2 + 2 * (K // G) * N * 4
    tf = 2 * B * K * N / per / 1e12
    print(f"  gemm {name:8s} K={K:6d} N={N:6d}: {per*1e6:7.1f} us  "
          f"{wb/per/1e9:5.0f} GB/s(wt)  {tf:6.1f} TFLOPS", flush=True)
    return per


def bench_attn(B, hq, hkv, hd, max_seq, n1, n2):
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.standard_normal((B, 1, hq, hd)) * 0.1, jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((B, max_seq, hkv, hd)) * 0.1, jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((B, max_seq, hkv, hd)) * 0.1, jnp.bfloat16)

    @functools.partial(jax.jit, static_argnames="n")
    def loop(q, k, v, n):
        def body(i, qq):
            out = causal_attention(
                qq, k, v, q_offset=jnp.int32(max_seq - 1), kv_len=jnp.int32(max_seq)
            )
            return (qq + 0.0 * out).astype(qq.dtype)
        return jax.lax.fori_loop(0, n, body, q)

    per = diff_time(loop, (q, k, v), n1, n2)
    kvb = 2 * B * max_seq * hkv * hd * 2
    print(f"  attn decode (dense, max_seq={max_seq}): {per*1e6:7.1f} us  "
          f"KV {kvb/per/1e9:5.0f} GB/s", flush=True)
    return per


def bench_block(B, max_seq, n1, n2, layers=1, cfg_kw=None):
    from quick_tpu.models import init_quant_params
    from quick_tpu.models.model import model_forward
    from quick_tpu.runtime import make_cache

    kw = dict(cfg_kw or MODELS["mistral7b"][1])
    kw["num_hidden_layers"] = layers
    cfg = ModelConfig(**kw)
    params = init_quant_params(cfg, jax.random.PRNGKey(0))
    cache = make_cache(cfg, B, max_seq)
    rng = np.random.default_rng(2)
    tok = jnp.asarray(rng.integers(0, 32000, (B, 1)), jnp.int32)
    # steady state: half-full cache, reset length each iter so n doesn't
    # change the work per step
    start = max_seq // 2

    @functools.partial(jax.jit, static_argnames="n")
    def loop(params, tok, cache, n):
        cache = cache.with_length(jnp.int32(start))
        def body(i, carry):
            tok, cache = carry
            logits, cache2 = model_forward(params, cfg, tok, cache)
            nxt = jnp.argmax(logits[:, -1], -1).astype(jnp.int32)[:, None]
            return nxt, cache2.with_length(jnp.int32(start))
        tok, cache = jax.lax.fori_loop(0, n, body, (tok, cache))
        return tok

    per = diff_time(loop, (params, tok, cache), n1, n2)
    print(f"  {layers}-layer model step (incl embed+norm+lm_head): "
          f"{per*1e6:7.1f} us", flush=True)
    return per


def bench_block4_variant(B, max_seq, n1, n2, variant, cfg_kw=None):
    """Time a 4-layer step with attention_forward ablated.

    variant: 'full' | 'no_einsum' (qkv/rope/cache-update/o kept, score+value
    einsum replaced by a broadcast) | 'no_attn' (whole attention replaced by
    the o-projection of the normed input)."""
    import quick_tpu.modules.blocks as qb
    orig = qb.attention_forward

    def no_einsum(p, cfg, x, rope_cos, rope_sin, cache, layer_idx,
                  positions, ctx=None, **kw):
        import jax.numpy as jnp
        from quick_tpu.ops.rope import apply_rope
        B_, S, D = x.shape
        hq, hkv, hd = (cfg.num_attention_heads, cfg.num_key_value_heads,
                       cfg.head_dim)
        qkv = p.qkv_proj(x)
        q, k, v = jnp.split(qkv, [hq * hd, (hq + hkv) * hd], axis=-1)
        q = q.reshape(B_, S, hq, hd)
        k = k.reshape(B_, S, hkv, hd)
        v = v.reshape(B_, S, hkv, hd)
        q = apply_rope(q, positions, rope_cos, rope_sin)
        k = apply_rope(k, positions, rope_cos, rope_sin)
        cache = cache.update(layer_idx, k, v, cache.length)
        out = q.reshape(B_, S, hq * hd)
        return p.o_proj(out), cache

    def no_attn(p, cfg, x, rope_cos, rope_sin, cache, layer_idx,
                positions, ctx=None, **kw):
        return x, cache

    qb.attention_forward = {
        "full": orig, "no_einsum": no_einsum, "no_attn": no_attn
    }[variant]
    try:
        t = bench_block(B, max_seq, n1, n2, layers=4, cfg_kw=cfg_kw)
    finally:
        qb.attention_forward = orig
    print(f"    [variant={variant}] 4-layer step: {t*1e6:.1f} us", flush=True)
    return t


def main():
    global SHAPES
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--max_seq", type=int, default=256)
    ap.add_argument("--model", default="mistral7b", choices=sorted(MODELS))
    ap.add_argument("--parts", default="gemms,attn,block")
    ap.add_argument("--n1", type=int, default=10)
    ap.add_argument("--n2", type=int, default=510)
    args = ap.parse_args()
    B = args.batch
    parts = args.parts.split(",")
    SHAPES, cfg_kw = MODELS[args.model]
    nL = cfg_kw["num_hidden_layers"]
    hq = cfg_kw["num_attention_heads"]
    hkv = cfg_kw["num_key_value_heads"]
    print(f"model={args.model} batch={B} max_seq={args.max_seq} "
          f"backend={jax.default_backend()}")
    total = 0.0
    if "gemms" in parts:
        for name in SHAPES:
            total += bench_gemm(name, B, args.n1, args.n2)
        print(f"  -> layer GEMMs total: {total*1e6:.1f} us "
              f"(x{nL} = {nL*total*1e3:.2f} ms)")
    if "attn" in parts:
        ta = bench_attn(B, hq, hkv, 128, args.max_seq, args.n1, args.n2)
        print(f"  -> x{nL} = {nL*ta*1e3:.2f} ms")
    if "block" in parts:
        tb = bench_block(B, args.max_seq, args.n1, min(args.n2, 110),
                         cfg_kw=cfg_kw)
        print(f"  -> block-step x{nL}-ish = {nL*tb*1e3:.2f} ms (has fixed "
              f"embed/lm_head part)")
    if "block2" in parts:
        t1 = bench_block(B, args.max_seq, args.n1, min(args.n2, 110),
                         layers=1, cfg_kw=cfg_kw)
        t4 = bench_block(B, args.max_seq, args.n1, min(args.n2, 110),
                         layers=4, cfg_kw=cfg_kw)
        per_layer = (t4 - t1) / 3
        fixed = t1 - per_layer
        print(f"  -> marginal per-layer: {per_layer*1e6:.1f} us, fixed "
              f"(embed+lm_head+sample): {fixed*1e6:.1f} us, "
              f"{nL}-layer est: {(fixed + nL*per_layer)*1e3:.2f} ms")
    if "ablate" in parts:
        n2b = min(args.n2, 110)
        tf = bench_block4_variant(B, args.max_seq, args.n1, n2b, "full",
                                  cfg_kw=cfg_kw)
        tne = bench_block4_variant(B, args.max_seq, args.n1, n2b,
                                   "no_einsum", cfg_kw=cfg_kw)
        tna = bench_block4_variant(B, args.max_seq, args.n1, n2b, "no_attn",
                                   cfg_kw=cfg_kw)
        print(f"  -> per-layer attention einsum: {(tf-tne)/4*1e6:.1f} us; "
              f"qkv+o+rope+cache-update: {(tne-tna)/4*1e6:.1f} us")


main()
