"""Compile a small paged decode step for TPU and count full-cache copies.

python tools/hlo_copy_check.py [0|1]   # QUICK_TPU_PAGED_WRITE
"""
import sys; sys.path.insert(0, ".")
import os
os.environ["QUICK_TPU_PAGED_WRITE"] = sys.argv[1] if len(sys.argv) > 1 else "1"
import dataclasses, re
import numpy as np, jax, jax.numpy as jnp
from quick_tpu import ModelConfig
from quick_tpu.models import init_quant_params
from quick_tpu.models.model import model_forward
from quick_tpu.modules.paged_cache import PagedKVCache

cfg = ModelConfig(
    vocab_size=32000, hidden_size=4096, intermediate_size=14336,
    num_hidden_layers=2, num_attention_heads=32,
    num_key_value_heads=8, max_position_embeddings=4096,
    model_type="mistral")
B, page, max_seq = 64, 64, 256
params = init_quant_params(cfg, jax.random.PRNGKey(0))
pps = max_seq // page
cache = PagedKVCache.create(2, B * pps + 1, page, B, max_seq, 8, 128)
bt = (1 + np.arange(B)[:, None] * pps + np.arange(pps)[None, :]).astype(np.int32)
cache = dataclasses.replace(
    cache, block_table=jnp.asarray(bt),
    length=jnp.full((B,), 128, jnp.int32),
)
tokens = jnp.zeros((B, 1), jnp.int32)


def loop(params, tokens, cache):
    def body(i, carry):
        tokens, cache = carry
        logits, cache = model_forward(params, cfg, tokens, cache)
        nxt = jnp.argmax(logits[:, -1], -1).astype(jnp.int32)[:, None]
        return nxt, cache
    tokens, cache = jax.lax.fori_loop(0, 20, body, (tokens, cache))
    return tokens


compiled = jax.jit(loop).lower(params, tokens, cache).compile()
txt = compiled.as_text()
# cache page buffers are bf16[129,8,64,128] per layer slice or
# bf16[2,129,8,64,128] whole — count copy/fusion ops producing that shape
pat = re.compile(r"copy[^\n]*bf16\[2,129,8,64,128\]|bf16\[2,129,8,64,128\][^\n]*copy")
lines = [l for l in txt.splitlines() if "copy" in l and "129,8,64,128" in l]
print(f"PAGED_WRITE={os.environ['QUICK_TPU_PAGED_WRITE']}: "
      f"{len(lines)} full-cache copy lines", flush=True)
for l in lines[:10]:
    print("  ", l.strip()[:160], flush=True)
mem = compiled.memory_analysis()
print("temp alloc:", getattr(mem, "temp_size_in_bytes", None), flush=True)

# time it: two loop lengths, differential
import functools, time


@functools.partial(jax.jit, static_argnames="n")
def tloop(params, tokens, cache, n):
    def body(i, carry):
        tokens, cache = carry
        logits, cache = model_forward(params, cfg, tokens, cache)
        nxt = jnp.argmax(logits[:, -1], -1).astype(jnp.int32)[:, None]
        return nxt, cache
    tokens, cache = jax.lax.fori_loop(0, n, body, (tokens, cache))
    return tokens


def run(n):
    np.asarray(tloop(params, tokens, cache, n)[:1, :1])
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(tloop(params, tokens, cache, n)[:1, :1])
        best = min(best, time.perf_counter() - t0)
    return best


per = (run(110) - run(10)) / 100
print(f"2-layer paged step: {per*1e6:.1f} us", flush=True)
