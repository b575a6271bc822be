"""Experiment: pre-scaled deep-dot W4A16 kernel variant vs the group-dot
kernel at M>=64.

Hypothesis: at M>=64 the group-dot kernel is bound by per-dot MXU overhead
(16 shallow K=128 dots per k-step). Scaling the unpacked weights in-VPU and
issuing ONE [bm, gpb*G] x [gpb*G, bn] dot per k-step trades G*bn VPU muls
per group for 15 fewer MXU dispatches. Zero-point stays factored via a
single [bm, gpb] @ [gpb, bn] correction dot.

Usage: python tools/kernel_exp_deepdot.py M K N [bn] [gpb]
"""
import sys; sys.path.insert(0, ".")
import functools, time
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from quick_tpu.ops.quantized_matmul import _quantized_matmul_2d
from quick_tpu.quantize.packing import pack_qtpu

PACK, G = 8, 128
M, K, N = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
bn = int(sys.argv[4]) if len(sys.argv) > 4 else 1024
gpb = int(sys.argv[5]) if len(sys.argv) > 5 else None
slab = G // PACK
ng = K // G
if gpb is None:
    gpb = 16 if ng % 16 == 0 else 8
bm = M


def make_deepdot_kernel(gpb, slab, bn):
    def kernel(x_ref, qw_ref, s_ref, zs_ref, o_ref, acc):
        k = pl.program_id(2)

        @pl.when(k == 0)
        def _():
            acc[:] = jnp.zeros_like(acc)

        tiles = []
        for g in range(gpb):
            qg = qw_ref[g * slab : (g + 1) * slab, :]
            nib = [(qg >> (4 * j)) & 0xF for j in range(PACK)]
            wg = jnp.concatenate(nib, axis=0).astype(jnp.float32)
            tiles.append((wg * s_ref[g, :, :]).astype(jnp.bfloat16))
        w = jnp.concatenate(tiles, axis=0)  # [gpb*G, bn] scaled bf16
        xg = x_ref[:, : gpb * G]
        y = jnp.dot(xg, w, preferred_element_type=jnp.float32)
        # factored zero point: rowsum per group -> one small dot
        xs = jnp.sum(
            x_ref[:].astype(jnp.float32).reshape(bm, gpb, G), axis=2
        )  # [bm, gpb]
        zcorr = jnp.dot(
            xs.astype(jnp.bfloat16),
            zs_ref[:, 0, :].astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )
        acc[:] += y - zcorr

        @pl.when(k == pl.num_programs(2) - 1)
        def _():
            o_ref[:] = acc[:].astype(o_ref.dtype)

    return kernel


@functools.partial(jax.jit, static_argnames=("out_dtype",))
def deepdot_matmul(x, qweight, scales, zeros_x_scales, out_dtype=jnp.bfloat16):
    Mx, Kx = x.shape
    Nx = qweight.shape[1]
    s3 = scales.reshape(ng, 1, Nx)
    zs3 = zeros_x_scales.reshape(ng, 1, Nx)
    return pl.pallas_call(
        make_deepdot_kernel(gpb, slab, bn),
        grid=(Mx // bm, Nx // bn, ng // gpb),
        in_specs=[
            pl.BlockSpec((bm, gpb * G), lambda i, j, k: (i, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((gpb * slab, bn), lambda i, j, k: (k, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((gpb, 1, bn), lambda i, j, k: (k, 0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((gpb, 1, bn), lambda i, j, k: (k, 0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, k: (i, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Mx, Nx), out_dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")
        ),
    )(x.astype(jnp.bfloat16), qweight, s3, zs3)


rng = np.random.default_rng(0)
q = rng.integers(0, 16, (K, N), dtype=np.uint8)
qw = jnp.asarray(pack_qtpu(q, G))
s = jnp.asarray(rng.random((K // G, N), dtype=np.float32) * 0.02 + 0.01)
zs = jnp.asarray((rng.integers(0, 16, (K // G, N))).astype(np.float32)) * s
x = jnp.asarray(rng.standard_normal((M, K)) * 0.1, jnp.bfloat16)

# correctness vs baseline kernel
y_base = np.asarray(_quantized_matmul_2d(x, qw, s, zs, group_size=G), np.float32)
y_deep = np.asarray(deepdot_matmul(x, qw, s, zs), np.float32)
rel = np.abs(y_deep - y_base).max() / (np.abs(y_base).max() + 1e-9)
print(f"deepdot vs group-dot rel err: {rel:.2e}", flush=True)


def timeit(fn, tag):
    @functools.partial(jax.jit, static_argnames="n")
    def loop(qw, s, zs, x, n):
        def body(i, xx):
            y = fn(xx, qw, s, zs)
            if y.shape[1] >= K:
                return (xx + 0.0 * y[:, :K]).astype(xx.dtype)
            return (xx + 0.0 * jnp.pad(y, ((0, 0), (0, K - y.shape[1])))).astype(xx.dtype)
        return jax.lax.fori_loop(0, n, body, x)

    def run(n):
        np.asarray(loop(qw, s, zs, x, n)[:1, :1])
        best = np.inf
        for _ in range(4):
            t0 = time.perf_counter()
            np.asarray(loop(qw, s, zs, x, n)[:1, :1])
            best = min(best, time.perf_counter() - t0)
        return best

    n1, n2 = (10, 310) if M <= 64 else (4, 104)
    per = (run(n2) - run(n1)) / (n2 - n1)
    wb = K * N / 2 + 2 * (K // G) * N * 4
    print(f"{tag}: {per*1e6:7.1f} us  {wb/per/1e9:5.0f} GB/s(wt)  "
          f"{2*M*K*N/per/1e12:6.1f} TFLOPS", flush=True)


timeit(lambda xx, qw, s, zs: _quantized_matmul_2d(xx, qw, s, zs, group_size=G),
       "group-dot (baseline)")
timeit(lambda xx, qw, s, zs: deepdot_matmul(xx, qw, s, zs), "deep-dot")
