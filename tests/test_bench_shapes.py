"""tools/e2e_bench.py SHAPES stay importable and forward-valid.

Importing the tool must not run the benchmark (it once called main() at
module scope — importing SHAPES hung for minutes), and every geometry
must construct and forward at tiny overrides so the TPU bench never
discovers a broken config on a 90-second init."""
import sys

import jax
import jax.numpy as jnp
import pytest

sys.path.insert(0, ".")

from quick_tpu import ModelConfig
from quick_tpu.models import init_quant_params
from quick_tpu.models.auto import apply_model_type
from quick_tpu.runtime import decode_loop, make_cache, prefill
from quick_tpu.runtime.generate import SamplingParams

TINY_OVERRIDES = dict(
    hidden_size=256, intermediate_size=512, num_hidden_layers=2,
    num_attention_heads=4, num_key_value_heads=2, vocab_size=512,
)
PER_SHAPE = {
    "gemma2_9b": dict(head_dim=64, query_pre_attn_scalar=64.0),
    "bloom7b": dict(num_key_value_heads=4),
    "llama13b": dict(num_key_value_heads=4),
    "qwen15moe": dict(num_local_experts=8, num_experts_per_tok=2,
                      moe_intermediate_size=128,
                      shared_intermediate_size=256),
    "dsv2lite": dict(num_local_experts=8, num_experts_per_tok=2,
                     moe_intermediate_size=128, kv_lora_rank=64,
                     head_dim=192, num_key_value_heads=4),
}


def _shapes():
    from tools.e2e_bench import SHAPES

    return SHAPES


@pytest.mark.parametrize("name", sorted(PER_SHAPE) + ["mistral7b", "tiny"])
def test_bench_shape_forwards(name):
    s = dict(_shapes()[name])
    s.update(TINY_OVERRIDES)
    s.update(PER_SHAPE.get(name, {}))
    cfg = apply_model_type(ModelConfig(**s))
    params = init_quant_params(
        cfg, jax.random.PRNGKey(0),
        group_size=64 if cfg.is_moe or name == "dsv2lite" else 128,
    )
    toks = jnp.zeros((1, 16), jnp.int32)
    cache = make_cache(cfg, 1, 32)
    logits, cache = prefill(params, cfg, toks, cache)
    assert bool(jnp.isfinite(logits).all())
    first = jnp.argmax(logits, -1).astype(jnp.int32).reshape(1)
    out = decode_loop(
        params, cfg, first, cache, 4,
        SamplingParams(temperature=0.0), jax.random.PRNGKey(0),
    )
    toks_out = out[0] if isinstance(out, tuple) else out
    assert bool(jnp.isfinite(0 + toks_out).all())
