"""Sequence/context-parallel prefill vs single-device forward (CPU mesh)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quick_tpu import ModelConfig
from quick_tpu.models import init_float_params, model_forward, quantize_params
from quick_tpu.parallel.context_parallel import (
    context_parallel_forward_fn,
    create_seq_mesh,
)

TINY = ModelConfig(
    vocab_size=128, hidden_size=64, intermediate_size=128,
    num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
    max_position_embeddings=64,
)


@pytest.mark.parametrize("n", [2, 4])
def test_cp_matches_reference(cpu_mesh_devices, n):
    params = init_float_params(TINY, jax.random.PRNGKey(0))
    toks = jax.random.randint(jax.random.PRNGKey(1), (2, 16), 0, 128)
    ref, _ = model_forward(params, TINY, toks)
    fn = context_parallel_forward_fn(TINY, create_seq_mesh(n, cpu_mesh_devices))
    out = fn(params, toks)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=6e-2, rtol=6e-2
    )


def test_cp_alibi(cpu_mesh_devices):
    import dataclasses

    cfg = dataclasses.replace(
        TINY, use_alibi=True, use_rope=False, num_key_value_heads=4,
        layernorm="layernorm", act_fn="gelu", gated_mlp=False,
    )
    params = init_float_params(cfg, jax.random.PRNGKey(0))
    toks = jax.random.randint(jax.random.PRNGKey(1), (1, 16), 0, 128)
    ref, _ = model_forward(params, cfg, toks)
    fn = context_parallel_forward_fn(cfg, create_seq_mesh(2, cpu_mesh_devices))
    out = fn(params, toks)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=6e-2, rtol=6e-2
    )


def test_cp_quantized(cpu_mesh_devices):
    params = quantize_params(
        init_float_params(TINY, jax.random.PRNGKey(0)), TINY, group_size=32
    )
    toks = jax.random.randint(jax.random.PRNGKey(1), (1, 16), 0, 128)
    ref, _ = model_forward(params, TINY, toks)
    fn = context_parallel_forward_fn(TINY, create_seq_mesh(2, cpu_mesh_devices))
    out = fn(params, toks)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=6e-2, rtol=6e-2
    )
