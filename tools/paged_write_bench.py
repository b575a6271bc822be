"""Isolate paged_write cost: aliasing through reshape vs native-4D arrays.

python tools/paged_write_bench.py
"""
import sys; sys.path.insert(0, ".")
import functools, time
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

L, P, Hkv, page, D = 32, 257, 8, 64, 128
B, S = 64, 1
rng = np.random.default_rng(0)
kn = jnp.asarray(rng.standard_normal((B, S, Hkv, D)), jnp.bfloat16)
pg = jnp.asarray(rng.integers(1, P, (B, S)), jnp.int32)
off = jnp.asarray(rng.integers(0, page, (B, S)), jnp.int32)


def _kernel(pg_ref, off_ref, kn_ref, vn_ref, kp_any, vp_any, ko_ref, vo_ref):
    del pg_ref, off_ref, kp_any, vp_any
    ko_ref[0, 0] = kn_ref[0, 0]
    vo_ref[0, 0] = vn_ref[0, 0]


def write4(kp, vp, kn, vn, pg, off):
    def out_index(b, s, pg, off):
        return (0, pg[b, s], 0, off[b, s])
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, S),
        in_specs=[
            pl.BlockSpec((1, 1, Hkv, D), lambda b, s, pg, off: (b, s, 0, 0)),
            pl.BlockSpec((1, 1, Hkv, D), lambda b, s, pg, off: (b, s, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, Hkv, D), out_index),
            pl.BlockSpec((1, 1, Hkv, D), out_index),
        ],
    )
    return pl.pallas_call(
        _kernel, grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct(kp.shape, kp.dtype),
                   jax.ShapeDtypeStruct(vp.shape, vp.dtype)],
        input_output_aliases={4: 0, 5: 1},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
    )(pg, off, kn, vn, kp, vp)


@functools.partial(jax.jit, static_argnames=("n", "mode"), donate_argnums=(0, 1))
def loop(kp, vp, kn, pg, off, n, mode):
    def body(i, carry):
        kp, vp = carry
        if mode == "native4d":
            kp, vp = write4(kp, vp, kn, kn, pg, off)
        else:  # reshape5d: the production wrapper shape
            from quick_tpu.ops.paged_write import paged_write
            kp5 = kp.reshape(L, P, Hkv, page, D)
            vp5 = vp.reshape(L, P, Hkv, page, D)
            kp5, vp5 = paged_write(kp5, vp5, kn, kn, pg, off, layer=0)
            kp, vp = (kp5.reshape(L, P, Hkv, page * D),
                      vp5.reshape(L, P, Hkv, page * D))
        return kp, vp
    kp, vp = jax.lax.fori_loop(0, n, body, (kp, vp))
    return kp, vp


def run(mode, n):
    kp = jnp.zeros((L, P, Hkv, page * D), jnp.bfloat16)
    vp = jnp.zeros((L, P, Hkv, page * D), jnp.bfloat16)
    out = loop(kp, vp, kn, pg, off, n, mode)
    np.asarray(out[0][:1, :1, :1, :8])
    best = np.inf
    for _ in range(3):
        kp = jnp.zeros((L, P, Hkv, page * D), jnp.bfloat16)
        vp = jnp.zeros((L, P, Hkv, page * D), jnp.bfloat16)
        t0 = time.perf_counter()
        out = loop(kp, vp, kn, pg, off, n, mode)
        np.asarray(out[0][:1, :1, :1, :8])
        best = min(best, time.perf_counter() - t0)
    return best


for mode in ("native4d", "reshape5d"):
    per = (run(mode, 210) - run(mode, 10)) / 200
    print(f"{mode}: {per*1e6:8.1f} us/write-pair", flush=True)
