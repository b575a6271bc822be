"""Compile a small dense decode step for TPU and count full-cache copies
around the dense-decode Pallas kernel.

python tools/dense_copy_check.py [0|1]   # QUICK_TPU_DENSE_KERNEL
"""
import sys; sys.path.insert(0, ".")
import os
os.environ["QUICK_TPU_DENSE_KERNEL"] = sys.argv[1] if len(sys.argv) > 1 else "1"
import numpy as np, jax, jax.numpy as jnp
from quick_tpu import ModelConfig
from quick_tpu.models import init_quant_params
from quick_tpu.models.model import model_forward
from quick_tpu.runtime import make_cache

cfg = ModelConfig(
    vocab_size=32000, hidden_size=4096, intermediate_size=14336,
    num_hidden_layers=2, num_attention_heads=32,
    num_key_value_heads=8, max_position_embeddings=4096,
    model_type="mistral")
B, max_seq = 64, 256
params = init_quant_params(cfg, jax.random.PRNGKey(0))
cache = make_cache(cfg, B, max_seq).with_length(jnp.int32(128))
tokens = jnp.zeros((B, 1), jnp.int32)


def loop(params, tokens, cache):
    def body(i, carry):
        tokens, cache = carry
        logits, cache = model_forward(params, cfg, tokens, cache)
        nxt = jnp.argmax(logits[:, -1], -1).astype(jnp.int32)[:, None]
        return nxt, cache.with_length(jnp.int32(128))
    tokens, cache = jax.lax.fori_loop(0, 20, body, (tokens, cache))
    return tokens


compiled = jax.jit(loop).lower(params, tokens, cache).compile()
txt = compiled.as_text()
lines = [l for l in txt.splitlines()
         if "copy" in l and ("64,8,256,128" in l or "2,64,8,256,128" in l)]
print(f"DENSE_KERNEL={os.environ['QUICK_TPU_DENSE_KERNEL']}: "
      f"{len(lines)} cache-sized copy lines", flush=True)
for l in lines[:10]:
    print("  ", l.strip()[:160], flush=True)
mem = compiled.memory_analysis()
print("temp alloc:", getattr(mem, "temp_size_in_bytes", None), flush=True)
