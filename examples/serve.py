"""Continuous-batching serving demo (net-new vs the reference, which only
offers batch `generate`; SURVEY.md section 2.3).

    python examples/serve.py --quant_path out/ --max_slots 8 \
        --prompts prompts.txt --max_new_tokens 64

Reads one prompt per line, runs all of them through the Engine with
chunked prefill + paged KV cache, prints completions as they finish.
Multi-host: call quick_tpu.parallel.multihost.initialize_runtime() first;
each host runs its own engine over its shard of the request stream.
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from quick_tpu.models.auto import AutoQuickModel
from quick_tpu.runtime.serving import Engine


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quant_path", required=True)
    ap.add_argument("--prompts", help="file with one prompt per line")
    ap.add_argument("--prompt_ids", help="comma-separated token-id prompts "
                    "separated by ';' — hermetic smoke runs without any "
                    "tokenizer on disk")
    ap.add_argument("--max_slots", type=int, default=8)
    ap.add_argument("--max_seq", type=int, default=2048)
    ap.add_argument("--page_size", type=int, default=64)
    ap.add_argument("--chunk", type=int, default=64)
    ap.add_argument("--max_new_tokens", type=int, default=64)
    args = ap.parse_args()

    model = AutoQuickModel.from_quantized(args.quant_path)
    tok = None if args.prompt_ids else model.tokenizer
    if args.prompt_ids:
        prompts = [p for p in args.prompt_ids.split(";") if p.strip()]
    elif args.prompts:
        with open(args.prompts) as f:
            prompts = [ln.rstrip("\n") for ln in f if ln.strip()]
    else:
        prompts = ["The capital of France is", "Once upon a time"]
        print("(no --prompts given; using built-in demo prompts)")

    eng = Engine(
        model.params, model.cfg,
        max_slots=args.max_slots, max_seq=args.max_seq,
        page_size=args.page_size, chunk=args.chunk,
    )
    uids = {}
    for p in prompts:
        if tok is None:
            ids = [int(t) for t in p.split(",")]
            eos = None
        else:
            ids = tok.encode(p)
            eos = tok.eos_token_id
        uids[eng.submit(ids, args.max_new_tokens, eos)] = p

    t0 = time.time()
    done = 0
    n_tokens = 0
    while eng.has_work:
        eng.step()
        for uid in list(eng.finished):
            if uid in uids:
                out_ids = eng.finished[uid]
                text = (
                    tok.decode(out_ids, skip_special_tokens=True)
                    if tok is not None
                    else " ".join(str(int(t)) for t in out_ids)
                )
                n_tokens += len(eng.finished[uid])
                done += 1
                print(f"--- [{done}/{len(prompts)}] {uids.pop(uid)!r}\n{text}\n")
    dt = time.time() - t0
    print(f"{n_tokens} tokens in {dt:.1f}s -> {n_tokens / dt:.1f} tok/s")


if __name__ == "__main__":
    main()
