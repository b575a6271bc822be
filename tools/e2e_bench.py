"""End-to-end generation benchmark on a randomly-initialized quantized model.

Reference protocol (README.md:120): prefill len = decode len = 128, report
prefill and decode tok/s. Run from repo root on TPU:
    python tools/e2e_bench.py --model mistral7b --batch 1
"""
import argparse, functools, sys, time
import numpy as np, jax, jax.numpy as jnp

sys.path.insert(0, ".")
from quick_tpu import ModelConfig
from quick_tpu.models import init_quant_params
from quick_tpu.runtime import decode_loop, make_cache, prefill
from quick_tpu.runtime.generate import SamplingParams

SHAPES = {
    "mistral7b": dict(vocab_size=32000, hidden_size=4096, intermediate_size=14336,
                      num_hidden_layers=32, num_attention_heads=32,
                      num_key_value_heads=8, max_position_embeddings=4096,
                      model_type="mistral"),
    "llama13b": dict(vocab_size=32000, hidden_size=5120, intermediate_size=13824,
                     num_hidden_layers=40, num_attention_heads=40,
                     num_key_value_heads=40, max_position_embeddings=4096),
    "tiny": dict(vocab_size=1024, hidden_size=512, intermediate_size=1024,
                 num_hidden_layers=4, num_attention_heads=8,
                 num_key_value_heads=4, max_position_embeddings=512),
    # gemma2-9b geometry (vocab clipped 256k->32k so the head matches the
    # other rows; the softcap/sandwich-norm/alt-window kernel paths are the
    # point here): logit softcap rides every attention kernel + the final
    # head via final_logit_softcap (MODEL_TYPE_MAP["gemma2"]).
    "gemma2_9b": dict(vocab_size=32768, hidden_size=3584,
                      intermediate_size=14336, num_hidden_layers=42,
                      num_attention_heads=16, num_key_value_heads=8,
                      head_dim=256, max_position_embeddings=4096,
                      sliding_window=4096, sliding_window_pattern=2,
                      query_pre_attn_scalar=256.0, model_type="gemma2"),
    # bloom-7b1 geometry (vocab clipped 250k->32k): ALiBi + no-rope through
    # the fused decode step (use_rope=False path).
    "bloom7b": dict(vocab_size=32768, hidden_size=4096,
                    intermediate_size=16384, num_hidden_layers=30,
                    num_attention_heads=32, num_key_value_heads=32,
                    max_position_embeddings=2048, model_type="bloom"),
    # Qwen1.5-MoE-A2.7B geometry (vocab clipped 152k->32k): 14.3B total /
    # 2.7B active, 60 experts top-4 + a gated 5632-wide shared expert —
    # the 16GB-fitting MoE e2e row (Mixtral-8x7B W4 is ~23GB and can't);
    # exercises the cond-gated expert-skip dispatch at generation batch.
    "qwen15moe": dict(vocab_size=32768, hidden_size=2048,
                      intermediate_size=5632, num_hidden_layers=24,
                      num_attention_heads=16, num_key_value_heads=16,
                      max_position_embeddings=4096,
                      num_local_experts=60, num_experts_per_tok=4,
                      moe_intermediate_size=1408,
                      shared_intermediate_size=5632,
                      model_type="qwen2_moe"),
    # DeepSeek-V2-Lite geometry (vocab clipped 102k->32k): 15.7B total /
    # 2.4B active — MLA latent-cache attention AND DeepSeekMoE (64 routed
    # top-6 + 2 shared experts, first layer dense) in one e2e row.
    "dsv2lite": dict(vocab_size=32768, hidden_size=2048,
                     intermediate_size=10944, num_hidden_layers=27,
                     num_attention_heads=16, num_key_value_heads=16,
                     max_position_embeddings=4096,
                     num_local_experts=64, num_experts_per_tok=6,
                     moe_intermediate_size=1408, n_shared_experts=2,
                     first_k_dense_replace=1, kv_lora_rank=512,
                     # direct-config MLA needs the derived dims explicit
                     # (from_hf_config sets them for real checkpoints)
                     head_dim=192, rotary_dim=64,
                     model_type="deepseek_v2"),
}

def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="mistral7b")
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--ctx", type=int, default=128)
    ap.add_argument("--gen", type=int, default=128)
    # int4 head default: +6% bs=1 decode for dNLL ~ +0.006
    # (QuantConfig.quantize_lm_head); --no-quantize_lm_head restores the
    # reference's fp16-head protocol
    ap.add_argument("--quantize_lm_head", action=argparse.BooleanOptionalAction,
                    default=True)
    ap.add_argument("--prefill_chunk", type=int, default=0,
                    help="sequence-chunked prefill (0 = whole ctx at once); "
                         "bounds activation memory at large batch")
    ap.add_argument("--group", type=int, default=128,
                    help="quant group size (32 = the GGUF Q4_K-class regime "
                         "through the small-group kernel)")
    ap.add_argument("--speculative", type=int, default=0, metavar="K",
                    help="also bench prompt-lookup speculative greedy decode "
                         "with draft_len=K (B=1 only; 0 = off). Reports "
                         "wall tok/s plus the verified tokens-per-model-step "
                         "acceptance ratio")
    args = ap.parse_args()
    from quick_tpu.models.auto import apply_model_type
    cfg = apply_model_type(ModelConfig(**SHAPES[args.model]))
    t0 = time.time()
    params = init_quant_params(cfg, jax.random.PRNGKey(0),
                               group_size=args.group)
    if args.quantize_lm_head:
        import dataclasses
        from quick_tpu.modules.linear import Linear, QuantLinear
        lm = params.lm_head
        params = dataclasses.replace(
            params, lm_head=QuantLinear.from_float(lm.weight, lm.bias))
    params = jax.tree_util.tree_map(lambda x: jax.device_put(x), params)
    print(f"init: {time.time()-t0:.1f}s", flush=True)

    B, C, Gn = args.batch, args.ctx, args.gen
    rng = np.random.default_rng(0)
    toks = jnp.asarray(rng.integers(0, cfg.vocab_size, (B, C)), jnp.int32)
    max_seq = C + Gn

    PC = args.prefill_chunk or C

    @jax.jit
    def prefill_fn(params, toks):
        logits, _ = prefill_fn_inner(params, toks)
        return logits

    @functools.partial(jax.jit, static_argnames="n")
    def full_fn(params, toks, n):
        # prefill + decode inside ONE program: the cache never escapes, so
        # XLA reuses its buffers (an external cache arg would need donation
        # or double the KV memory)
        logits, cache = prefill_fn_inner(params, toks)
        first = jnp.argmax(logits, -1).astype(jnp.int32).reshape(B)
        return decode_loop(params, cfg, first, cache, n,
                           SamplingParams(temperature=0.0),
                           jax.random.PRNGKey(0))

    def prefill_fn_inner(params, toks):
        cache = make_cache(cfg, B, max_seq)
        logits = None
        for i in range(0, C, PC):
            logits, cache = prefill(params, cfg, toks[:, i : i + PC], cache)
        return logits, cache

    def timed(fn, *a, reps=3):
        best = np.inf
        for _ in range(reps):
            t0 = time.perf_counter()
            out = fn(*a)
            np.asarray(jax.tree_util.tree_leaves(out)[0])[:1]
            best = min(best, time.perf_counter() - t0)
        return best, out
    tp, _ = timed(prefill_fn, params, toks)
    # decode: two lengths, differential (prefill cost cancels)
    _, _ = timed(full_fn, params, toks, 8, reps=1)  # compile
    t8, _ = timed(full_fn, params, toks, 8)
    tg, _ = timed(full_fn, params, toks, Gn)
    per_tok = (tg - t8) / (Gn - 8)
    print(f"{args.model} bs={B} {C}/{Gn}:")
    print(f"  prefill: {tp*1e3:.1f} ms -> {B*C/tp:.1f} tok/s")
    print(f"  decode:  {per_tok*1e3:.2f} ms/tok -> {B/per_tok:.1f} tok/s")

    if args.speculative and B == 1:
        from quick_tpu.runtime import speculative_generate

        K = args.speculative

        def spec_fn(n):
            return speculative_generate(
                params, cfg, toks, n, draft_len=K, return_stats=True,
            )

        spec_fn(8)  # compile both loop shapes
        spec_fn(Gn)
        t8s, _ = timed(spec_fn, 8)
        tgs, (_, st) = timed(spec_fn, Gn)
        per_spec = (tgs - t8s) / (Gn - 8)
        steps = int(st["model_steps"])
        print(f"  speculative (K={K}): {per_spec*1e3:.2f} ms/tok -> "
              f"{1/per_spec:.1f} tok/s; {Gn}/{steps} = "
              f"{Gn/max(steps,1):.2f} tok/model-step")


if __name__ == "__main__":
    main()
