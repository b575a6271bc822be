"""Pipeline-parallel forward vs the single-device forward (CPU mesh)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quick_tpu import ModelConfig
from quick_tpu.models import init_float_params, model_forward, quantize_params
from quick_tpu.parallel.pipeline import (
    create_pipe_mesh,
    pipeline_forward_fn,
    shard_stacked_blocks,
    stack_blocks,
)

TINY = ModelConfig(
    vocab_size=128, hidden_size=64, intermediate_size=128,
    num_hidden_layers=4, num_attention_heads=4, num_key_value_heads=2,
    max_position_embeddings=64,
)


@pytest.mark.parametrize("n_stages,n_micro", [(2, 2), (4, 4), (2, 1)])
def test_pipeline_matches_reference(cpu_mesh_devices, n_stages, n_micro):
    params = init_float_params(TINY, jax.random.PRNGKey(0))
    toks = jax.random.randint(jax.random.PRNGKey(1), (4, 8), 0, 128)
    ref, _ = model_forward(params, TINY, toks)

    mesh = create_pipe_mesh(n_stages, cpu_mesh_devices)
    stacked = shard_stacked_blocks(stack_blocks(params.blocks), mesh)
    fn = pipeline_forward_fn(TINY, mesh, n_micro)
    out = fn(params, stacked, toks)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=6e-2, rtol=6e-2
    )


def test_pipeline_quantized(cpu_mesh_devices):
    params = quantize_params(
        init_float_params(TINY, jax.random.PRNGKey(0)), TINY, group_size=32
    )
    toks = jax.random.randint(jax.random.PRNGKey(1), (2, 8), 0, 128)
    ref, _ = model_forward(params, TINY, toks)
    mesh = create_pipe_mesh(2, cpu_mesh_devices)
    stacked = shard_stacked_blocks(stack_blocks(params.blocks), mesh)
    fn = pipeline_forward_fn(TINY, mesh, 2)
    out = fn(params, stacked, toks)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=6e-2, rtol=6e-2
    )


@pytest.mark.parametrize("n_stages,n_micro", [(2, 2), (4, 4), (2, 4)])
def test_pipeline_generate_matches_reference(cpu_mesh_devices, n_stages, n_micro):
    """PP greedy generation (per-stage KV caches, ppermute token-feedback
    ring) must produce the same tokens as the single-device greedy loop."""
    from quick_tpu.parallel.pipeline import pipeline_generate_fn
    from quick_tpu.runtime import make_cache, prefill

    params = init_float_params(TINY, jax.random.PRNGKey(0))
    B, S, T = 4, 8, 5
    toks = jax.random.randint(jax.random.PRNGKey(1), (B, S), 0, 128)

    # single-device greedy reference
    cache = make_cache(TINY, B, S + T, dtype=jnp.float32)
    logits, cache = model_forward(params, TINY, toks, cache)
    cur = jnp.argmax(logits[:, -1], -1).astype(jnp.int32)
    ref = [cur]
    for _ in range(T - 1):
        logits, cache = model_forward(params, TINY, cur[:, None], cache)
        cur = jnp.argmax(logits[:, -1], -1).astype(jnp.int32)
        ref.append(cur)
    ref = np.asarray(jnp.stack(ref, 1))

    mesh = create_pipe_mesh(n_stages, cpu_mesh_devices)
    stacked = shard_stacked_blocks(stack_blocks(params.blocks), mesh)
    fn = pipeline_generate_fn(TINY, mesh, n_micro, max_new_tokens=T)
    out = np.asarray(fn(params, stacked, toks))
    np.testing.assert_array_equal(out, ref)


def test_pipeline_generate_requires_enough_microbatches(cpu_mesh_devices):
    from quick_tpu.parallel.pipeline import pipeline_generate_fn

    mesh = create_pipe_mesh(4, cpu_mesh_devices)
    with pytest.raises(ValueError, match="n_micro"):
        pipeline_generate_fn(TINY, mesh, 2, max_new_tokens=4)
