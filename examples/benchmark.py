"""End-to-end generation benchmark (analog of reference examples/benchmark.py).

Sweeps batch sizes at fixed prefill/decode lengths (the reference's 128/128
protocol, README.md:120), reporting prefill and decode tok/s. OOM stops the
sweep with a report row, like the reference (benchmark.py:115-119,190-191).

Timing is tunnel-robust: the decode loop is ONE jit program (lax.scan), so a
single dispatch covers all decode steps; prefill is timed by differencing
two in-jit repetition counts.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from quick_tpu.models.auto import AutoQuickModel
from quick_tpu.runtime import decode_loop, make_cache, prefill
from quick_tpu.runtime.generate import SamplingParams


def _fetch(x):
    return np.asarray(jax.tree_util.tree_leaves(x)[0][..., :1])


def time_once(fn, *args):
    t0 = time.perf_counter()
    out = fn(*args)
    _fetch(out)
    return time.perf_counter() - t0, out


def run_round(model, batch, ctx_len, gen_len, trials=3):
    cfg = model.cfg
    params = model.params
    rng = np.random.default_rng(0)
    tokens = jnp.asarray(
        rng.integers(0, cfg.vocab_size, (batch, ctx_len)), jnp.int32
    )
    max_seq = ctx_len + gen_len

    # prefill timing
    def prefill_once():
        cache = make_cache(cfg, batch, max_seq)
        return prefill(params, cfg, tokens, cache)

    _, (first_logits, cache0) = time_once(prefill_once)  # compile
    times = [time_once(prefill_once)[0] for _ in range(trials)]
    t_prefill = min(times)

    # decode timing: the whole loop is one program; subtract the
    # fixed dispatch overhead measured with a 1-token loop
    first = jnp.argmax(first_logits, -1).astype(jnp.int32)

    def decode_n(n):
        return decode_loop(params, cfg, first, cache0, n, SamplingParams())

    _ = _fetch(decode_n(1))
    _ = _fetch(decode_n(gen_len))
    t1 = min(time_once(decode_n, 1)[0] for _ in range(trials))
    tg = min(time_once(decode_n, gen_len)[0] for _ in range(trials))
    t_decode_per_tok = (tg - t1) / (gen_len - 1)

    prefill_tps = batch * ctx_len / t_prefill
    decode_tps = batch / t_decode_per_tok
    return {
        "batch": batch, "ctx": ctx_len, "gen": gen_len,
        "prefill_tok_s": round(prefill_tps, 1),
        "decode_tok_s": round(decode_tps, 1),
        "prefill_ms": round(t_prefill * 1e3, 2),
        "decode_ms_per_tok": round(t_decode_per_tok * 1e3, 3),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quant_path")
    ap.add_argument("--random", help="random preset (see basic_quant.py)")
    ap.add_argument("--ctx", type=int, default=128)
    ap.add_argument("--gen", type=int, default=128)
    ap.add_argument("--batches", default="1,8,32,64,128,256")
    ap.add_argument("--lengths", help="sweep ctx=gen lengths at a fixed "
                    "batch instead of sweeping batch (the reference's "
                    "32->4096 rounds, benchmark.py:153-162), e.g. "
                    "'32,128,512,2048,4096'")
    ap.add_argument("--batch", type=int, default=1, help="batch for the "
                    "--lengths sweep")
    args = ap.parse_args()

    if args.quant_path:
        model = AutoQuickModel.from_quantized(args.quant_path)
    else:
        # random weights: init DIRECTLY in packed form — from_random +
        # RTN pack holds float (13.5GB at 7B) and packed params at once
        # and OOMs one 16GB chip
        import dataclasses
        import types

        from basic_quant import PRESETS

        from quick_tpu.models import init_quant_params

        cfg = PRESETS[args.random or "debug"]
        if args.lengths:  # rope tables must cover ctx+gen
            need = 2 * max(int(L) for L in args.lengths.split(","))
            if need > cfg.max_position_embeddings:
                cfg = dataclasses.replace(
                    cfg, max_position_embeddings=need
                )
        params = init_quant_params(cfg, jax.random.PRNGKey(0))
        params = jax.tree_util.tree_map(jax.device_put, params)
        model = types.SimpleNamespace(cfg=cfg, params=params)

    if args.lengths:
        rounds = [
            (args.batch, int(L), int(L)) for L in args.lengths.split(",")
        ]
    else:
        rounds = [
            (int(b), args.ctx, args.gen) for b in args.batches.split(",")
        ]
    rows = []
    for batch, ctx, gen in rounds:
        try:
            row = run_round(model, batch, ctx, gen)
        except Exception as e:  # OOM or compile failure: report and stop
            rows.append({"batch": batch, "ctx": ctx, "error": str(e)[:120]})
            print(json.dumps(rows[-1]))
            break
        rows.append(row)
        print(json.dumps(row), flush=True)
    return rows


if __name__ == "__main__":
    main()
