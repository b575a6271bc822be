"""Production-path decode throughput: paged cache + paged-attention kernel
at high slot counts (the serving engine's jitted step, timed device-side).

The dense-cache e2e bench (tools/e2e_bench.py) OOMs at bs>=128 on one 16GB
v5e with bf16 KV; INT8 KV pages halve that. Usage:

    python tools/engine_bench.py --slots 128 --kv int8 --quantize_lm_head
"""
import sys; sys.path.insert(0, ".")
import argparse, dataclasses, functools, time
import numpy as np, jax, jax.numpy as jnp

from quick_tpu import ModelConfig
from quick_tpu.models import init_quant_params
from quick_tpu.models.model import model_forward, quantize_params
from quick_tpu.modules.paged_cache import PagedKVCache


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--slots", type=int, default=128)
    ap.add_argument("--kv", choices=["bf16", "int8"], default="int8")
    ap.add_argument("--page", type=int, default=64)
    ap.add_argument("--start_len", type=int, default=128)
    ap.add_argument("--max_seq", type=int, default=256)
    ap.add_argument("--quantize_lm_head", action="store_true")
    ap.add_argument("--n1", type=int, default=10)
    ap.add_argument("--n2", type=int, default=110)
    ap.add_argument("--window", type=int, default=0, help="mistral sliding "
                    "window (0 = full attention); engages the paged "
                    "kernel's below-window DMA+compute skip")
    ap.add_argument("--softcap", type=float, default=0.0,
                    help="gemma2-class attention logit softcap (0 = off); "
                    "same geometry so the tanh cost is isolated")
    ap.add_argument("--model", default="",
                    help="use a tools/e2e_bench.py SHAPES geometry instead "
                    "of the default mistral-7B (e.g. qwen15moe for the MoE "
                    "engine row); --window/--softcap are ignored then")
    args = ap.parse_args()

    if args.model:
        from tools.e2e_bench import SHAPES
        from quick_tpu.models.auto import apply_model_type
        cfg = apply_model_type(ModelConfig(**dict(
            SHAPES[args.model], max_position_embeddings=args.max_seq)))
    else:
        cfg = ModelConfig(
            vocab_size=32000, hidden_size=4096, intermediate_size=14336,
            num_hidden_layers=32, num_attention_heads=32,
            num_key_value_heads=8, max_position_embeddings=args.max_seq,
            model_type="mistral", sliding_window=args.window or None,
            attn_logit_softcap=args.softcap or None)
    B, page = args.slots, args.page
    kv_dtype = jnp.int8 if args.kv == "int8" else jnp.bfloat16

    t0 = time.time()
    params = init_quant_params(cfg, jax.random.PRNGKey(0))
    if args.quantize_lm_head:
        from quick_tpu.modules.linear import QuantLinear
        params = dataclasses.replace(
            params,
            lm_head=QuantLinear.from_float(params.lm_head.weight, None),
            embed=params.embed,  # embed stays bf16 (gather, not streamed)
        )
    params = jax.tree_util.tree_map(jax.device_put, params)

    pages_per_slot = args.max_seq // page
    n_pages = B * pages_per_slot + 1
    # identity-ish block tables: slot i owns pages [1 + i*pps, ...)
    bt = jnp.asarray(
        (1 + np.arange(B)[:, None] * pages_per_slot
         + np.arange(pages_per_slot)[None, :]).astype(np.int32)
    )

    def build_cache(key, bt):
        """Mid-generation cache state, built ON DEVICE (traceable): every
        slot at start_len with random KV content. Lives inside `rebuild`
        so the timing loop can DONATE its cache — the un-donated 2x held
        the 256-slot int8 cache twice and OOM'd."""
        cache = PagedKVCache.create(
            cfg.num_hidden_layers, n_pages, page, B, args.max_seq,
            cfg.num_key_value_heads, cfg.head_dim, kv_dtype,
        )
        if kv_dtype == jnp.int8:
            kp = jax.random.randint(
                key, cache.k_pages.shape, -127, 128, jnp.int8
            )
            sc = jnp.full(cache.kv_scales.shape, 0.01, jnp.float32)
            return dataclasses.replace(
                cache, k_pages=kp, v_pages=kp, kv_scales=sc,
                block_table=bt,
                length=jnp.full((B,), args.start_len, jnp.int32),
            )
        kp = (jax.random.normal(key, cache.k_pages.shape, jnp.bfloat16) * 0.3)
        return dataclasses.replace(
            cache, k_pages=kp, v_pages=kp, block_table=bt,
            length=jnp.full((B,), args.start_len, jnp.int32),
        )

    rebuild = jax.jit(build_cache)
    cache = rebuild(jax.random.PRNGKey(1), bt)
    print(f"init: {time.time()-t0:.1f}s  (kv={args.kv}, "
          f"kv bytes={cache.k_pages.nbytes*2/1e9:.2f}GB"
          + (f" + scales {cache.kv_scales.nbytes/1e9:.2f}GB"
             if cache.quantized else "") + ")", flush=True)

    tokens0 = jnp.zeros((B, 1), jnp.int32)

    @functools.partial(jax.jit, static_argnames="n", donate_argnums=(2,))
    def loop(params, tokens, cache, n):
        def body(i, carry):
            tokens, cache = carry
            logits, cache = model_forward(params, cfg, tokens, cache)
            nxt = jnp.argmax(logits[:, -1], -1).astype(jnp.int32)[:, None]
            return nxt, cache
        tokens, cache = jax.lax.fori_loop(0, n, body, (tokens, cache))
        # the cache must be an OUTPUT for the donation to have something
        # to alias — donate-without-alias leaves the input live and the
        # program holds the cache twice (8 slots x 8k bf16 OOM'd at 20.5G)
        return tokens, cache

    holder = [cache]  # init cache: donated by the first warmup call
    del cache

    def fresh():
        c = holder[0] if holder[0] is not None else rebuild(
            jax.random.PRNGKey(1), bt
        )
        holder[0] = None
        return c

    def run(n):
        np.asarray(loop(params, tokens0, fresh(), n)[0][:1, :1])
        best = np.inf
        for _ in range(3):
            c = fresh()
            t0 = time.perf_counter()
            np.asarray(loop(params, tokens0, c, n)[0][:1, :1])
            best = min(best, time.perf_counter() - t0)
        return best

    per = (run(args.n2) - run(args.n1)) / (args.n2 - args.n1)
    print(f"slots={B} kv={args.kv} page={page} "
          f"len~{args.start_len}-{args.start_len + args.n2}:", flush=True)
    print(f"  decode: {per*1e3:.2f} ms/step -> {B/per:.1f} tok/s", flush=True)


main()
