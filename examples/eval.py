"""Accuracy evaluation mux (analog of reference examples/eval.py:13-57).

Tasks: wikitext-style PPL on a token stream, KL-divergence vs a float model,
MMLU (local cais/mmlu copy), HumanEval (local openai_humaneval copy).

    python examples/eval.py --quant_path out/ --tasks ppl --tokens toks.npy
    python examples/eval.py --quant_path out/ --ref_path hf_dir --tasks kldiv
    python examples/eval.py --quant_path out/ --tasks mmlu --mmlu_subject anatomy
    python examples/eval.py --quant_path out/ --tasks humaneval
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from quick_tpu.evaluation import eval_kl_divergence, evaluate_perplexity
from quick_tpu.models.auto import AutoQuickModel


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quant_path", required=True)
    ap.add_argument("--ref_path", help="float model dir (for kldiv)")
    ap.add_argument("--tokens", help=".npy pre-tokenized eval stream")
    ap.add_argument(
        "--tasks", default="ppl", help="comma list: ppl,kldiv,mmlu,humaneval"
    )
    ap.add_argument("--seqlen", type=int, default=2048)
    ap.add_argument("--max_windows", type=int, default=None)
    ap.add_argument("--mmlu_subject", default="anatomy")
    ap.add_argument("--n_shot", type=int, default=0)
    ap.add_argument("--n_samples", type=int, default=1,
                    help="humaneval completions per problem")
    args = ap.parse_args()

    model = AutoQuickModel.from_quantized(args.quant_path)
    if args.tokens:
        tokens = np.load(args.tokens)
    else:
        rng = np.random.default_rng(0)
        tokens = rng.integers(0, model.cfg.vocab_size, 8 * args.seqlen)
        print("WARNING: no --tokens given; using random tokens (smoke only)")

    for task in args.tasks.split(","):
        if task == "ppl":
            ppl = evaluate_perplexity(
                model.params, model.cfg, tokens,
                seqlen=args.seqlen, max_windows=args.max_windows, verbose=True,
            )
            print(f"PPL: {ppl:.4f}")
        elif task == "kldiv":
            if not args.ref_path:
                raise SystemExit("kldiv needs --ref_path")
            ref = AutoQuickModel.from_pretrained(args.ref_path)
            rep = eval_kl_divergence(
                ref.params, ref.cfg, model.params, model.cfg, tokens,
                seqlen=min(args.seqlen, 512),
            )
            print(rep)
        elif task == "mmlu":
            from quick_tpu.evaluation.mmlu import eval_mmlu, load_mmlu_rows

            tok = model.tokenizer  # requires a tokenizer in the checkpoint
            rows = load_mmlu_rows(args.mmlu_subject)
            out = eval_mmlu(
                model.params, model.cfg,
                lambda s: tok.encode(s, add_special_tokens=False),
                rows, n_shot=args.n_shot,
                subject=args.mmlu_subject, verbose=True,
            )
            print(f"MMLU[{args.mmlu_subject}]: {out}")
        elif task == "humaneval":
            from quick_tpu.evaluation.humaneval import eval_humaneval
            from quick_tpu.runtime import SamplingParams

            tok = model.tokenizer

            def gen(prompt):
                outs = []
                for i in range(args.n_samples):
                    temp = 0.0 if args.n_samples == 1 else 0.8
                    text = model.generate_text(
                        prompt, max_new_tokens=256,
                        sampling=SamplingParams(temperature=temp), seed=i,
                    )
                    outs.append(text.split("\ndef ")[0])  # stop heuristic
                return outs

            scores = eval_humaneval(gen, ks=(1,), verbose=True)
            print(f"HumanEval: {scores}")
        else:
            raise SystemExit(f"unknown task {task}")


if __name__ == "__main__":
    main()
