"""Generate from a llama.cpp GGUF checkpoint (no reference analog —
SqueezeBits/QUICK loads HF/AutoAWQ only; see utils/gguf.py for the
bit-exact Q4_0/Q4_1/Q4_K import onto the fused TPU kernel).

    python examples/gguf_generate.py --gguf model-q4_k_m.gguf \
        --tokenizer path/to/hf-tokenizer \
        --prompt "The capital of France is" --max_new_tokens 32 \
        [--beams 4]

Greedy by default; --beams runs scan-based beam search
(runtime/generate.py::beam_generate). --penalty adds a repetition
penalty through the same SamplingParams the serving engine uses.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp

from quick_tpu.models.auto import AutoQuickModel
from quick_tpu.runtime import SamplingParams, beam_generate, generate


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--gguf", required=True)
    ap.add_argument("--tokenizer", required=True, help="HF tokenizer dir")
    ap.add_argument("--prompt", default="The capital of France is")
    ap.add_argument("--max_new_tokens", type=int, default=32)
    ap.add_argument("--beams", type=int, default=1)
    ap.add_argument("--temperature", type=float, default=0.0)
    ap.add_argument("--penalty", type=float, default=1.0,
                    help="repetition penalty (1.0 = off)")
    args = ap.parse_args()

    from transformers import AutoTokenizer

    tok = AutoTokenizer.from_pretrained(args.tokenizer)
    model = AutoQuickModel.from_gguf(args.gguf)
    ids = jnp.asarray([tok.encode(args.prompt)], jnp.int32)

    if args.beams > 1:
        out, score = beam_generate(
            model.params, model.cfg, ids,
            max_new_tokens=args.max_new_tokens, num_beams=args.beams,
            eos_token_id=tok.eos_token_id,
        )
        print(f"[beam score {float(score[0]):.3f}]")
    else:
        out = generate(
            model.params, model.cfg, ids,
            max_new_tokens=args.max_new_tokens,
            sampling=SamplingParams(
                temperature=args.temperature,
                repetition_penalty=args.penalty,
            ),
            eos_token_id=tok.eos_token_id,
        )
    print(tok.decode([int(t) for t in out[0]]))


if __name__ == "__main__":
    main()
