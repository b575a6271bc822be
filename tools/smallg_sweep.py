"""Variant experiments for the small-group (g=32) dequant kernel.

Isolates where time goes at M=1: scale expansion (jnp.repeat), the
zero-point path, f32 vs bf16 dequant math, tile shape. Variants that
skip work are numerically WRONG — timing probes only.

Usage: python tools/smallg_sweep.py [variant ...]
Variants: base noscale nozs bf16math edot tiles
"""
import sys, time, functools
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

K, N, G, PACK = 4096, 4096, 32, 8
slab = G // PACK
ng = K // G
rng = np.random.default_rng(0)
qw = jnp.asarray(rng.integers(-2**31, 2**31, (K // 8, N), dtype=np.int64).astype(np.int32))
s = jnp.asarray(rng.standard_normal((ng, N)).astype(np.float32) * 0.01)
zs = jnp.asarray(rng.standard_normal((ng, N)).astype(np.float32) * 0.08)


def make_kernel(variant, gpb, bn):
    R = gpb * slab

    def kernel(x_ref, qw_ref, s_ref, zs_ref, o_ref, acc):
        k = pl.program_id(2)

        @pl.when(k == 0)
        def _():
            acc[:] = jnp.zeros_like(acc)

        qg = qw_ref[...]
        if variant == "noscale":
            ws = [((qg >> (4 * j)) & 0xF).astype(jnp.bfloat16) for j in range(PACK)]
        elif variant == "bf16math":
            s_rep = jnp.repeat(s_ref[...].astype(jnp.bfloat16), slab, axis=0)
            zs_rep = jnp.repeat(zs_ref[...].astype(jnp.bfloat16), slab, axis=0)
            ws = [((qg >> (4 * j)) & 0xF).astype(jnp.bfloat16) * s_rep - zs_rep
                  for j in range(PACK)]
        elif variant == "nozs":
            s_rep = jnp.repeat(s_ref[...], slab, axis=0)
            ws = [(((qg >> (4 * j)) & 0xF).astype(jnp.float32) * s_rep).astype(jnp.bfloat16)
                  for j in range(PACK)]
        elif variant == "edot":
            # scale expansion via MXU: E [R, gpb] one-hot, s_rep = E @ s_blk
            r_i = jax.lax.broadcasted_iota(jnp.int32, (R, gpb), 0)
            c_i = jax.lax.broadcasted_iota(jnp.int32, (R, gpb), 1)
            E = (r_i // slab == c_i).astype(jnp.float32)
            s_rep = jnp.dot(E, s_ref[...], preferred_element_type=jnp.float32)
            zs_rep = jnp.dot(E, zs_ref[...], preferred_element_type=jnp.float32)
            ws = [(((qg >> (4 * j)) & 0xF).astype(jnp.float32) * s_rep - zs_rep).astype(jnp.bfloat16)
                  for j in range(PACK)]
        else:  # base
            s_rep = jnp.repeat(s_ref[...], slab, axis=0)
            zs_rep = jnp.repeat(zs_ref[...], slab, axis=0)
            ws = [(((qg >> (4 * j)) & 0xF).astype(jnp.float32) * s_rep - zs_rep).astype(jnp.bfloat16)
                  for j in range(PACK)]
        w = jnp.concatenate(ws, axis=0)
        acc[:] += jnp.dot(x_ref[...], w, preferred_element_type=jnp.float32)

        @pl.when(k == pl.num_programs(2) - 1)
        def _():
            o_ref[:] = acc[:].astype(o_ref.dtype)

    return kernel


def run_variant(variant, gpb, bn, bm=8):
    kern = make_kernel(variant, gpb, bn)

    def mm(x):
        return pl.pallas_call(
            kern,
            grid=(bm // bm, N // bn, ng // gpb),
            in_specs=[
                pl.BlockSpec((bm, gpb * G), lambda i, j, k: (i, k), memory_space=pltpu.VMEM),
                pl.BlockSpec((gpb * slab, bn), lambda i, j, k: (k, j), memory_space=pltpu.VMEM),
                pl.BlockSpec((gpb, bn), lambda i, j, k: (k, j), memory_space=pltpu.VMEM),
                pl.BlockSpec((gpb, bn), lambda i, j, k: (k, j), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((bm, bn), lambda i, j, k: (i, j), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((bm, N), jnp.bfloat16),
            scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary")),
        )(x, qw, s, zs)

    @functools.partial(jax.jit, static_argnames="n")
    def loop(x0, n):
        def body(i, acc):
            y = mm(jnp.broadcast_to(acc[None, :], (bm, K)).astype(jnp.bfloat16))
            return y[0, :K].astype(jnp.float32) * 1e-6 + x0[:K] if N >= K else acc
        return jax.lax.fori_loop(0, n, body, x0)

    x0 = jnp.zeros((K,), jnp.float32)
    for n in (10, 510):
        np.asarray(loop(x0, n))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter(); np.asarray(loop(x0, 510)); t1 = time.perf_counter()
        np.asarray(loop(x0, 10)); t2 = time.perf_counter()
        ts.append(((t1 - t0) - (t2 - t1)) / 500)
    per = min(ts)
    wb = K * N / 2 + 2 * ng * N * 4
    print(f"{variant:9s} gpb={gpb:3d} bn={bn:5d}: {per*1e6:7.1f} us  "
          f"stream {wb/per/1e9:5.0f} GB/s", flush=True)


variants = sys.argv[1:] or ["base", "noscale", "nozs", "bf16math", "edot"]
for v in variants:
    if v == "tiles":
        for gpb, bn in ((16, 1024), (32, 512), (64, 512), (16, 2048), (8, 4096)):
            if (gpb * slab) % 8 == 0 and ng % gpb == 0 and N % bn == 0:
                run_variant("base", gpb, bn)
    else:
        run_variant(v, 32, 1024)
