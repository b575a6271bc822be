"""Single-stream generation with prompt-lookup speculative decoding
(no reference analog — SqueezeBits/QUICK decodes one token per forward
via HF generate, quick/awq/models/base.py:87-89; see
runtime/speculative.py for the TPU-shaped design).

    python examples/speculate.py --model path/to/quantized-checkpoint \
        --tokenizer path/to/hf-tokenizer \
        --prompt "def fibonacci(n):" --max_new_tokens 128 \
        [--draft_len 4] [--ngram 3]

Greedy and token-exact vs plain generate(temperature=0) (bit-identical
up to kernel-path numerics); prints the
verified tokens-per-model-step ratio (the speculation payoff — decode is
weight-bandwidth-bound on TPU, so each accepted draft is a model step
that never pays the weight stream).
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp

from quick_tpu.models.auto import AutoQuickModel
from quick_tpu.runtime import speculative_generate


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", required=True, help="quantized checkpoint dir")
    ap.add_argument("--tokenizer", help="HF tokenizer dir (omit with "
                    "--prompt_ids for a tokenizer-free run)")
    ap.add_argument("--prompt", default="def fibonacci(n):")
    ap.add_argument("--prompt_ids", help="comma-separated token ids — "
                    "hermetic smoke runs without any tokenizer on disk")
    ap.add_argument("--max_new_tokens", type=int, default=128)
    ap.add_argument("--draft_len", type=int, default=4)
    ap.add_argument("--ngram", type=int, default=3)
    args = ap.parse_args()

    tok = None
    if args.prompt_ids:
        ids = jnp.asarray(
            [[int(t) for t in args.prompt_ids.split(",")]], jnp.int32
        )
    else:
        if not args.tokenizer:
            ap.error("need --tokenizer (or --prompt_ids)")
        from transformers import AutoTokenizer

        tok = AutoTokenizer.from_pretrained(args.tokenizer)
        ids = None
    model = AutoQuickModel.from_quantized(args.model)
    if ids is None:
        ids = jnp.asarray([tok.encode(args.prompt)], jnp.int32)

    t0 = time.perf_counter()
    out, stats = speculative_generate(
        model.params, model.cfg, ids, args.max_new_tokens,
        draft_len=args.draft_len, ngram=args.ngram,
        eos_token_id=tok.eos_token_id if tok else None, return_stats=True,
    )
    text = (
        tok.decode(list(out[0])) if tok
        else " ".join(str(int(t)) for t in out[0])
    )
    dt = time.perf_counter() - t0
    print(text)
    steps = int(stats["model_steps"])
    print(
        f"\n[{args.max_new_tokens} tokens, {steps} model steps = "
        f"{args.max_new_tokens / max(steps, 1):.2f} tok/step, "
        f"{args.max_new_tokens / dt:.1f} tok/s wall]"
    )


if __name__ == "__main__":
    main()
