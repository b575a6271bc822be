"""Mixtral-shape MoE dispatch benchmark (sparse cond path vs dense): python tools/moe_bench.py sparse|dense"""
import sys, time, functools
import sys; sys.path.insert(0, ".")
import numpy as np, jax, jax.numpy as jnp
from quick_tpu import ModelConfig
from quick_tpu.models import init_quant_params
from quick_tpu.modules.blocks import moe_forward

cfg = ModelConfig(
    vocab_size=1024, hidden_size=4096, intermediate_size=14336,
    num_hidden_layers=1, num_attention_heads=32, num_key_value_heads=8,
    max_position_embeddings=64, num_local_experts=8,
    num_experts_per_tok=2, model_type="mixtral",
)
import time as _t
_t0=_t.time()
params = init_quant_params(cfg, jax.random.PRNGKey(0))
jax.tree_util.tree_leaves(params)[0].block_until_ready()
print(f"init {_t.time()-_t0:.0f}s", flush=True)
moe = params.blocks[0].mlp
mode = sys.argv[1]
x = jax.random.normal(jax.random.PRNGKey(1), (1, 1, 4096), jnp.bfloat16)
if mode == "dense":
    x = jnp.tile(x, (33, 1, 1))

@functools.partial(jax.jit, static_argnames="n")
def loop(moe, xx, n):
    def body(i, h):
        y = moe_forward(moe, cfg, h)
        return h + 0.0 * y.astype(h.dtype)
    return jax.lax.fori_loop(0, n, body, xx)

def run(n):
    np.asarray(loop(moe, x, n)[:1,:1,:1]); best=np.inf
    for _ in range(4):
        t0=time.perf_counter(); np.asarray(loop(moe, x, n)[:1,:1,:1]); best=min(best,time.perf_counter()-t0)
    return best
print("compiling...", flush=True)
n1, n2 = (10, 60) if mode == "sparse" else (4, 24)
per = (run(n2) - run(n1)) / (n2 - n1)
print(f"{mode}: {per*1e6:.0f} us/step", flush=True)
