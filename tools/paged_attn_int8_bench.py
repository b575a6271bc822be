"""Isolated paged decode attention: bf16 vs INT8 KV (7B shapes).

Quantifies the INT8 kernel's overhead vs its byte count (engine-level
gap: 32.4 ms/step int8 vs 22.9 bf16 at 128 slots despite half the KV
bytes). Run from repo root on TPU:

    python tools/paged_attn_int8_bench.py [--slots 128] [--ctx 192] [--page 64]
"""
import argparse, functools, sys, time
import numpy as np, jax, jax.numpy as jnp

sys.path.insert(0, ".")
from quick_tpu.ops.paged_attention import paged_decode_attention

ap = argparse.ArgumentParser()
ap.add_argument("--slots", type=int, default=128)
ap.add_argument("--ctx", type=int, default=192)
ap.add_argument("--page", type=int, default=64)
ap.add_argument("--layers", type=int, default=4)
ap.add_argument("--npt", type=int, default=0, help="force table width (pages)")
args = ap.parse_args()

B, page, L = args.slots, args.page, args.layers
Hq, Hkv, D = 32, 8, 128
npt = args.npt or (-(-args.ctx // page) + 1)
P = B * npt + 8
rng = np.random.default_rng(0)

bt = jnp.asarray(
    rng.permutation(B * npt).reshape(B, npt) + 1, jnp.int32)
lengths = jnp.asarray(
    rng.integers(args.ctx - 32, args.ctx + 32, (B,)), jnp.int32)
q = jnp.asarray(rng.standard_normal((B, Hq, D)) * 0.1, jnp.bfloat16)

kf = rng.standard_normal((L, P, Hkv, page, D)).astype(np.float32) * 0.1
vf = rng.standard_normal((L, P, Hkv, page, D)).astype(np.float32) * 0.1


def bench(tag, k_pages, v_pages, ks, vs):
    quant = ks is not None

    # page stacks ride as jit ARGUMENTS (closure constants >100s MB hit
    # the axon remote-compile body limit, HTTP 413 — see CLAUDE.md)
    @functools.partial(jax.jit, static_argnames=("n", "quant"))
    def loop(q, k_pages, v_pages, ks, vs, n, quant=True):
        def body(i, qq):
            out = paged_decode_attention(
                qq, k_pages, v_pages, bt, lengths, layer=0,
                kv_scales=ks if quant else None,
                interpret=jax.default_backend() == "cpu")
            return (qq + out * jnp.bfloat16(1e-3)).astype(qq.dtype)
        return jax.lax.fori_loop(0, n, body, q)

    z = jnp.zeros((1,), jnp.float32)
    args = (k_pages, v_pages, ks if quant else z, vs if quant else z)
    for n in (10, 210):
        np.asarray(loop(q, *args, n, quant=quant))
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter(); np.asarray(loop(q, *args, 210, quant=quant)); t1 = time.perf_counter()
        np.asarray(loop(q, *args, 10, quant=quant)); t2 = time.perf_counter()
        best = min(best, ((t1 - t0) - (t2 - t1)) / 200)
    ctx_pages = np.ceil(np.asarray(lengths) / page).sum()
    bytes_kv = 2 * ctx_pages * Hkv * page * D * k_pages.dtype.itemsize
    if ks is not None:
        bytes_kv += 2 * ctx_pages * Hkv * page * 4
    print(f"{tag}: {best*1e6:7.1f} us/step  KV {bytes_kv/best/1e9:5.0f} GB/s "
          f"({bytes_kv/1e6:.0f} MB live)", flush=True)


bench("bf16 KV",
      jnp.asarray(kf, jnp.bfloat16), jnp.asarray(vf, jnp.bfloat16),
      None, None)

amax_k = np.abs(kf).max(-1, keepdims=True) + 1e-8  # per row (L,P,Hkv,page,1)
amax_v = np.abs(vf).max(-1, keepdims=True) + 1e-8
k8 = jnp.asarray(np.clip(np.round(kf / amax_k * 127), -127, 127), jnp.int8)
v8 = jnp.asarray(np.clip(np.round(vf / amax_v * 127), -127, 127), jnp.int8)
# shared per-page scale tile: row 0 = k, row 1 = v
sc = jnp.zeros((L, P, 8, Hkv * page), jnp.float32)
sc = sc.at[:, :, 0].set(jnp.asarray((amax_k / 127).reshape(L, P, -1)))
sc = sc.at[:, :, 1].set(jnp.asarray((amax_v / 127).reshape(L, P, -1)))
bench("int8 KV", k8, v8, sc, None)
