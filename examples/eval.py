"""Accuracy evaluation mux (analog of reference examples/eval.py:13-57).

Tasks: wikitext-style PPL on a token stream, KL-divergence vs a float model.

    python examples/eval.py --quant_path out/ --tasks ppl --tokens toks.npy
    python examples/eval.py --quant_path out/ --ref_path hf_dir --tasks kldiv
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
    ap.add_argument("--tasks", default="ppl", help="comma list: ppl,kldiv")
    ap.add_argument("--seqlen", type=int, default=2048)
    ap.add_argument("--max_windows", type=int, default=None)
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
        else:
            raise SystemExit(f"unknown task {task}")


if __name__ == "__main__":
    main()
