"""Headline benchmark: fused W4A16 GEMM effective TFLOPS.

Protocol mirrors the reference's kernel benchmark (M x 8192 x 8192,
reference README.md:128-147). Baseline = the reference's best published
QUICK number at M=128: 138.59 TFLOPS on RTX 4090 (README.md:136).

Prints ONE JSON line to stdout:
  {"metric": ..., "value": N, "unit": "TFLOPS", "vs_baseline": N}

Measurement notes (this environment): the TPU sits behind a tunnel with
~80ms fixed dispatch+fetch latency and a non-blocking block_until_ready, so
single-dispatch timing is meaningless. We time an in-jit lax.fori_loop that
chains the kernel with a data dependency, fetch to host, and difference two
loop lengths to cancel the fixed overhead. Median-of-repeats per loop length,
median over loop-pair trials, and any pair implying a rate above the v5e
bf16 MXU peak (197 TFLOPS — physically impossible) is rejected outright.
"""
from __future__ import annotations

import functools
import json
import sys
import time

import numpy as np

M, K, N = 128, 8192, 8192
BASELINE_TFLOPS = 138.59  # reference QUICK, M=128, RTX 4090 (README.md:136)
GROUP = 128


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from quick_tpu.ops.quantized_matmul import _quantized_matmul_2d
    from quick_tpu.quantize.packing import pack_qtpu

    rng = np.random.default_rng(0)
    q = rng.integers(0, 16, (K, N), dtype=np.uint8)
    qw = jnp.asarray(pack_qtpu(q, GROUP))
    s = jnp.asarray(rng.random((K // GROUP, N), dtype=np.float32) * 0.02)
    zs = jnp.asarray(rng.random((K // GROUP, N), dtype=np.float32))
    x0 = jnp.asarray(rng.standard_normal((M, K)) * 0.1, jnp.bfloat16)

    @functools.partial(jax.jit, static_argnames=("n",))
    def loop(x, n):
        def body(i, x):
            y = _quantized_matmul_2d(x, qw, s, zs, group_size=GROUP)
            return y[:, :K] * jnp.bfloat16(1e-2)

        return jax.lax.fori_loop(0, n, body, x)

    def run(n):
        _ = np.asarray(loop(x0, n)[:1, :1])  # compile + warm
        reps = []
        for _ in range(5):
            t0 = time.perf_counter()
            _ = np.asarray(loop(x0, n)[:1, :1])
            reps.append(time.perf_counter() - t0)
        return float(np.median(reps))

    # Physical floor: v5e bf16 MXU peak is 197 TFLOPS, so one iteration of
    # this dot cannot take less than flops/peak seconds. A loop-pair whose
    # difference implies a sub-floor per-iter time is a measurement artifact
    # (tunnel hiccup inflating t1 / deflating t2), not a fast kernel — it is
    # rejected, never reported (VERDICT r3 weak #1).
    PEAK_TFLOPS = 197.0
    flops = 2 * M * K * N
    floor_s = flops / (PEAK_TFLOPS * 1e12)

    # Long spans so the kernel signal dominates the ~80 ms tunnel jitter:
    # n2-n1 = 1000 iters at ~100 us each = ~100 ms of real compute per pair.
    n1, n2 = 50, 1050
    trials, rejected = [], 0
    while len(trials) < 5 and rejected < 8:
        t1, t2 = run(n1), run(n2)
        per = (t2 - t1) / (n2 - n1)
        if per < floor_s:
            rejected += 1
            log(f"  rejected loop-pair: {per*1e6:.1f} us/iter implies "
                f"{flops/per/1e12:.0f} TFLOPS > {PEAK_TFLOPS:.0f} peak")
            continue
        trials.append(per)
    if not trials:
        log("FATAL: no physically valid loop-pair in 8 attempts")
        sys.exit(1)
    per_iter = float(np.median(trials))
    tf = sorted(flops / t / 1e12 for t in trials)
    tflops = flops / per_iter / 1e12
    spread = (tf[-1] - tf[0]) / 2
    weight_gbs = (K * N / 2 + 2 * (K // GROUP) * N * 4) / per_iter / 1e9
    log(f"fused W4A16 GEMM M={M} K={K} N={N}: {per_iter*1e6:.1f} us/iter, "
        f"{tflops:.1f} +- {spread:.1f} TFLOPS "
        f"(range {tf[0]:.1f}-{tf[-1]:.1f} over {len(trials)} loop-pairs), "
        f"weight stream {weight_gbs:.0f} GB/s")
    try:
        from quick_tpu.utils.profiling import roofline, w4a16_gemm_counters

        c = w4a16_gemm_counters(M, K, N, GROUP)
        r = roofline(c["flops"], c["hbm_bytes"], per_iter)
        log(f"roofline: {r['bound']}-bound, {r['fraction_of_light']:.2f} of "
            f"light, MXU {r['mxu_utilization']:.0%}, HBM {r['hbm_utilization']:.0%}")
    except Exception as e:
        log(f"(roofline report unavailable: {e})")
    print(json.dumps({
        "metric": f"fused_w4a16_gemm_tflops_m{M}_k{K}_n{N}",
        "value": round(tflops, 2),
        "unit": "TFLOPS",
        "vs_baseline": round(tflops / BASELINE_TFLOPS, 3),
        "spread": round(spread, 2),  # half the min-max range over the
        # loop-pair trials (tunnel variance qualifier, VERDICT r2 item 9)
        "trials": [round(t, 2) for t in tf],
        "rejected_trials": rejected,  # loop-pairs discarded for implying
        # > peak-TFLOPS rates (physically impossible; VERDICT r3 weak #1)
    }))


if __name__ == "__main__":
    main()
