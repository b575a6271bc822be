"""MLA prefill: expanded (flash) vs absorbed at DeepSeek-V2-Lite shapes.

Times one layer's mla_attention_forward at S=2048, B=1, comparing the
expanded path (latent re-projected to per-head K/V + flash attention)
against the absorbed MQA form (full [B,hq,S,T] f32 score block). Run
from repo root on TPU:

    python tools/mla_prefill_bench.py [S]
"""
import sys, time, functools, os
import numpy as np, jax, jax.numpy as jnp

sys.path.insert(0, ".")
from quick_tpu import ModelConfig
from quick_tpu.modules.mla import MLAParams, mla_attention_forward
from quick_tpu.modules.linear import Linear
from quick_tpu.ops.rope import rope_table

S = int(sys.argv[1]) if len(sys.argv) > 1 else 2048

# DeepSeek-V2-Lite attention shapes (16 heads, R=512, no q-LoRA)
cfg = ModelConfig(
    vocab_size=1024, hidden_size=2048, intermediate_size=4096,
    num_hidden_layers=1, num_attention_heads=16, num_key_value_heads=16,
    max_position_embeddings=4096, model_type="deepseek_v2",
    kv_lora_rank=512, qk_nope_head_dim=128, qk_rope_head_dim=64,
    v_head_dim=128, q_lora_rank=None)

rng = np.random.default_rng(0)
D, hq = cfg.hidden_size, cfg.num_attention_heads
dn, dr, dv, R = (cfg.qk_nope_head_dim, cfg.qk_rope_head_dim,
                 cfg.v_head_dim, cfg.kv_lora_rank)
def lin(k, n):
    return Linear(jnp.asarray(rng.standard_normal((k, n)) * 0.02, jnp.bfloat16))
p = MLAParams(
    q_proj=lin(D, hq * (dn + dr)), q_b_proj=None, q_a_norm=None,
    kv_a_proj=lin(D, R + dr), kv_a_norm=jnp.ones((R,), jnp.float32),
    kv_b_proj=lin(R, hq * (dn + dv)), o_proj=lin(hq * dv, D))
cos, sin = rope_table(cfg.max_position_embeddings, dr, 10000.0)
x = jnp.asarray(rng.standard_normal((1, S, D)) * 0.1, jnp.bfloat16)
positions = jnp.arange(S, dtype=jnp.int32)[None]


def bench(tag):
    @functools.partial(jax.jit, static_argnames="n")
    def loop(x, n):
        def body(i, xx):
            out, _ = mla_attention_forward(
                p, cfg, xx, cos, sin, None, 0, positions)
            return (xx + 0.0 * out).astype(xx.dtype)
        return jax.lax.fori_loop(0, n, body, x)

    for n in (2, 52):
        np.asarray(loop(x, n))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter(); np.asarray(loop(x, 52)); t1 = time.perf_counter()
        np.asarray(loop(x, 2)); t2 = time.perf_counter()
        ts.append(((t1 - t0) - (t2 - t1)) / 50)
    print(f"{tag}: {min(ts)*1e3:.2f} ms/layer-prefill (S={S})", flush=True)


os.environ["QUICK_TPU_MLA_EXPANDED"] = "1"
bench("expanded (flash) ")
os.environ["QUICK_TPU_MLA_EXPANDED"] = "0"
bench("absorbed (scores)")
os.environ.pop("QUICK_TPU_MLA_EXPANDED")
