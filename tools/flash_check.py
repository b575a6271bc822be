"""Flash kernel TPU check: correctness vs the jnp dense path + S=2048 timing.

Run from repo root: python tools/flash_check.py
"""
import sys; sys.path.insert(0, ".")
import functools, os, time
import numpy as np, jax, jax.numpy as jnp

os.environ["QUICK_TPU_FLASH"] = "0"
from quick_tpu.ops.attention import causal_attention
from quick_tpu.ops.flash_attention import flash_attention

B, S, Hq, Hkv, D = 1, 1024, 32, 8, 128
rng = np.random.default_rng(0)
q = jnp.asarray(rng.standard_normal((B, S, Hq, D)) * 0.3, jnp.bfloat16)
k = jnp.asarray(rng.standard_normal((B, S, Hkv, D)) * 0.3, jnp.bfloat16)
v = jnp.asarray(rng.standard_normal((B, S, Hkv, D)) * 0.3, jnp.bfloat16)

dense = np.asarray(causal_attention(q, k, v), np.float32)
flash = np.asarray(flash_attention(q, k, v), np.float32)
err = np.abs(dense - flash).max()
print(f"flash vs dense (S={S}) max abs err: {err:.2e}", flush=True)

# decode path (fused-heads, S=1 from head-major cache) vs numpy
Bd, T = 4, 256
qd = jnp.asarray(rng.standard_normal((Bd, 1, Hq, D)) * 0.3, jnp.bfloat16)
kc = jnp.asarray(rng.standard_normal((Bd, Hkv, T, D)) * 0.3, jnp.bfloat16)
vc = jnp.asarray(rng.standard_normal((Bd, Hkv, T, D)) * 0.3, jnp.bfloat16)
lens = jnp.asarray([T, 100, 7, 181], jnp.int32)
od = np.asarray(
    causal_attention(qd, kc, vc, q_offset=lens - 1, kv_len=lens,
                     kv_heads_major=True),
    np.float32,
)
gq = Hq // Hkv
ref = np.zeros((Bd, Hq, D), np.float32)
for b in range(Bd):
    L = int(lens[b])
    for h in range(Hq):
        kk = np.asarray(kc[b, h // gq, :L], np.float32)
        vv = np.asarray(vc[b, h // gq, :L], np.float32)
        s = (np.asarray(qd[b, 0, h], np.float32) @ kk.T) * (D ** -0.5)
        p = np.exp(s - s.max()); p /= p.sum()
        ref[b, h] = p @ vv
err_d = np.abs(od[:, 0] - ref).max()
print(f"decode fused-heads vs numpy max abs err: {err_d:.2e}", flush=True)

# timing at 7B prefill shapes
S2 = 2048
q2 = jnp.asarray(rng.standard_normal((B, S2, Hq, D)) * 0.3, jnp.bfloat16)
k2 = jnp.asarray(rng.standard_normal((B, S2, Hkv, D)) * 0.3, jnp.bfloat16)
v2 = jnp.asarray(rng.standard_normal((B, S2, Hkv, D)) * 0.3, jnp.bfloat16)


@functools.partial(jax.jit, static_argnames="n")
def loop(q, k, v, n):
    def body(i, qq):
        out = flash_attention(qq, k, v)
        return (qq + 0.0 * out).astype(qq.dtype)
    return jax.lax.fori_loop(0, n, body, q)


def run(n):
    np.asarray(loop(q2, k2, v2, n)[:1, :1, :1])
    best = np.inf
    for _ in range(4):
        t0 = time.perf_counter()
        np.asarray(loop(q2, k2, v2, n)[:1, :1, :1])
        best = min(best, time.perf_counter() - t0)
    return best


per = (run(510) - run(10)) / 500
fl = 4 * S2 * S2 * D * Hq / 2  # causal-adjusted
print(f"flash S={S2} (7B shapes): {per*1e6:.1f} us  "
      f"{fl/per/1e12:.1f} TFLOPS (causal-adj)", flush=True)
