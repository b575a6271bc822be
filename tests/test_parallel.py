"""TP/DP/EP sharding correctness on the 8-device virtual CPU mesh.

Property under test: the shard_map-parallelized forward must produce the
same logits as the single-device forward (the reference has no distributed
path at all — this capability is new, SURVEY.md section 2.3)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quick_tpu import ModelConfig
from quick_tpu.models import init_float_params, model_forward, quantize_params
from quick_tpu.parallel import (
    create_mesh,
    prepare_params_for_tp,
    shard_params,
    sharded_forward_fn,
    tp_permutation,
)
from quick_tpu.runtime import make_cache

CFG = ModelConfig(
    vocab_size=128, hidden_size=128, intermediate_size=256,
    num_hidden_layers=2, num_attention_heads=8, num_key_value_heads=4,
    max_position_embeddings=64,
)


@pytest.fixture(scope="module")
def fparams():
    return init_float_params(CFG, jax.random.PRNGKey(0))


def _reference_logits(params, tokens, cfg=CFG):
    cache = make_cache(cfg, tokens.shape[0], 32)
    logits, _ = model_forward(params, cfg, tokens, cache)
    return np.asarray(logits)


def _parallel_logits(params, tokens, tp, dp, cfg=CFG):
    mesh = create_mesh(tp=tp, dp=dp)
    sharded = shard_params(params, cfg, mesh)
    fn = sharded_forward_fn(cfg, mesh)(params)
    cache = make_cache(cfg, tokens.shape[0], 32)
    logits, _ = jax.jit(fn)(sharded, tokens, cache)
    return np.asarray(logits)


def test_tp_permutation_is_permutation():
    perm = tp_permutation([64, 32, 32], 4)
    assert sorted(perm.tolist()) == list(range(128))
    # shard 0's slice contains the first quarter of each section
    shard0 = perm[:32]
    assert set(shard0) == set(range(0, 16)) | set(range(64, 72)) | set(range(96, 104))


@pytest.mark.parametrize("tp,dp", [(2, 1), (4, 1), (4, 2), (1, 4)])
def test_float_tp_matches_single(fparams, tp, dp):
    tokens = jax.random.randint(jax.random.PRNGKey(1), (4, 8), 0, 128)
    ref = _reference_logits(fparams, tokens)
    par = _parallel_logits(fparams, tokens, tp, dp)
    np.testing.assert_allclose(par, ref, atol=0.05, rtol=0.05)


def test_tp_sequence_scatter_collective_schedule(fparams):
    """SURVEY section 2.3 mandate: row-parallel o/down outputs must
    REDUCE_SCATTER (not plain psum) with the pre-GEMM norms all_gather-ing
    back (Megatron sequence-parallel TP, parallel/context.py::tp_seq) so
    XLA can overlap the gather with the following quantized GEMM. Asserts
    (a) the compiled HLO actually contains reduce-scatter + all-gather ops
    and (b) numerics still match single-chip."""
    tokens = jax.random.randint(jax.random.PRNGKey(1), (2, 16), 0, 128)
    mesh = create_mesh(tp=4, dp=1)
    sharded = shard_params(fparams, CFG, mesh)
    fn = jax.jit(sharded_forward_fn(CFG, mesh)(fparams))
    cache = make_cache(CFG, 2, 32)
    txt = fn.lower(sharded, tokens, cache).compile().as_text()
    assert "reduce-scatter" in txt, "o/down outputs should psum_scatter"
    assert "all-gather" in txt, "pre-GEMM norms should all_gather"
    par, _ = fn(sharded, tokens, cache)
    ref = _reference_logits(fparams, tokens)
    np.testing.assert_allclose(np.asarray(par), ref, atol=0.05, rtol=0.05)
    # decode (S=1 < tp) must fall back to plain psum — no scatter possible
    txt1 = fn.lower(
        sharded, tokens[:, :1], make_cache(CFG, 2, 32).with_length(16)
    ).compile().as_text()
    assert "reduce-scatter" not in txt1


def test_tp_seq_scatter_alibi_layernorm_family(cpu_mesh_devices):
    """The sequence-scatter TP path must stay correct for the MPT-like
    shape class: ALiBi (per-shard head slopes), LayerNorm with biases
    (norm bias folds divide with the scale), non-gated gelu MLP."""
    import dataclasses

    cfg = dataclasses.replace(
        CFG, use_alibi=True, use_rope=False, layernorm="layernorm",
        act_fn="gelu", gated_mlp=False, num_key_value_heads=4,
        attention_bias=True,
    )
    params = init_float_params(cfg, jax.random.PRNGKey(2))
    tokens = jax.random.randint(jax.random.PRNGKey(3), (2, 16), 0, 128)
    ref = _reference_logits(params, tokens, cfg)
    par = _parallel_logits(params, tokens, 4, 1, cfg)
    np.testing.assert_allclose(par, ref, atol=0.05, rtol=0.05)


def test_tp_with_row_parallel_biases(fparams):
    """o_proj/down_proj biases are added per-shard BEFORE the model-axis
    psum: prepare_params_for_tp must pre-divide them by tp or the output
    gains (tp-1) extra copies of every bias (phi/opt/bloom-style
    checkpoints carry these)."""
    import dataclasses

    from quick_tpu.modules.linear import Linear

    rng = np.random.default_rng(9)

    def add_bias(lin):
        b = jnp.asarray(
            rng.standard_normal(lin.weight.shape[1]) * 0.5, lin.weight.dtype
        )
        return dataclasses.replace(lin, bias=b)

    blocks = []
    for blk in fparams.blocks:
        blocks.append(dataclasses.replace(
            blk,
            attn=dataclasses.replace(blk.attn, o_proj=add_bias(blk.attn.o_proj)),
            mlp=dataclasses.replace(blk.mlp, down_proj=add_bias(blk.mlp.down_proj)),
        ))
    biased = dataclasses.replace(fparams, blocks=blocks)
    tokens = jax.random.randint(jax.random.PRNGKey(3), (2, 8), 0, 128)
    ref = _reference_logits(biased, tokens)
    par = _parallel_logits(biased, tokens, tp=4, dp=1)
    np.testing.assert_allclose(par, ref, atol=0.05, rtol=0.05)


def test_quant_tp_matches_single(fparams):
    qp = quantize_params(fparams, CFG, group_size=32)
    tokens = jax.random.randint(jax.random.PRNGKey(2), (2, 8), 0, 128)
    ref = _reference_logits(qp, tokens)
    par = _parallel_logits(qp, tokens, tp=4, dp=2)
    np.testing.assert_allclose(par, ref, atol=0.05, rtol=0.05)


def test_moe_ep_matches_single():
    cfg = ModelConfig(
        vocab_size=64, hidden_size=64, intermediate_size=128,
        num_hidden_layers=1, num_attention_heads=4, num_key_value_heads=4,
        max_position_embeddings=32, num_local_experts=4, num_experts_per_tok=2,
        model_type="mixtral",
    )
    p = init_float_params(cfg, jax.random.PRNGKey(3))
    tokens = jax.random.randint(jax.random.PRNGKey(4), (2, 4), 0, 64)
    ref = _reference_logits(p, tokens, cfg)
    par = _parallel_logits(p, tokens, tp=4, dp=2, cfg=cfg)
    np.testing.assert_allclose(par, ref, atol=0.05, rtol=0.05)


def test_decode_with_cache_tp(fparams):
    """Parallel prefill+decode must match single-device prefill+decode."""
    mesh = create_mesh(tp=4, dp=1)
    sharded = shard_params(fparams, CFG, mesh)
    fn = jax.jit(sharded_forward_fn(CFG, mesh)(fparams))
    tokens = jax.random.randint(jax.random.PRNGKey(5), (2, 6), 0, 128)

    cache_s = make_cache(CFG, 2, 16)
    logits_s, cache_s = fn(sharded, tokens, cache_s)
    step_s, cache_s = fn(sharded, tokens[:, -1:] * 0 + 3, cache_s)

    cache_r = make_cache(CFG, 2, 16)
    lr, cache_r = model_forward(fparams, CFG, tokens, cache_r)
    sr, cache_r = model_forward(fparams, CFG, tokens[:, -1:] * 0 + 3, cache_r)

    np.testing.assert_allclose(
        np.asarray(step_s), np.asarray(sr), atol=0.05, rtol=0.05
    )


def test_hybrid_mesh_single_slice(cpu_mesh_devices):
    from quick_tpu.parallel.multihost import create_hybrid_mesh

    mesh = create_hybrid_mesh(tp=4, devices=cpu_mesh_devices)
    assert mesh.shape == {"data": 2, "model": 4}
    mesh2 = create_hybrid_mesh(tp=2, dp=2, devices=cpu_mesh_devices[:4])
    assert mesh2.shape == {"data": 2, "model": 2}


def test_initialize_runtime_single_process_noop():
    from quick_tpu.parallel.multihost import initialize_runtime

    assert initialize_runtime() is False  # no coordinator -> single process


def test_process_local_batch():
    from quick_tpu.parallel.multihost import process_local_batch

    local, idx = process_local_batch(8)
    assert local == 8 and idx == 0  # single process


def test_llama70b_tp8_lowering(cpu_mesh_devices):
    """AOT-lower a Llama-2-70B-shaped TP=8 sharded forward with abstract
    params: validates shardings/shapes at full scale without materializing
    140GB of weights (BASELINE north star: 70B on >=2 hosts)."""
    import jax.numpy as jnp

    from quick_tpu import ModelConfig
    from quick_tpu.models.model import init_quant_params
    from quick_tpu.modules.cache import KVCache
    from quick_tpu.parallel import create_mesh, param_specs, sharded_forward_fn

    cfg = ModelConfig(
        vocab_size=32000, hidden_size=8192, intermediate_size=28672,
        num_hidden_layers=80, num_attention_heads=64, num_key_value_heads=8,
        max_position_embeddings=4096,
    )
    mesh = create_mesh(tp=8, dp=1, devices=cpu_mesh_devices)

    # abstract quantized params (eval_shape: no memory allocated)
    params = jax.eval_shape(
        lambda k: init_quant_params(cfg, k), jax.random.PRNGKey(0)
    )
    fn = sharded_forward_fn(cfg, mesh)(params)
    cache = jax.eval_shape(
        lambda: KVCache.create(
            cfg.num_hidden_layers, 1, 256,
            cfg.num_key_value_heads, cfg.head_dim,
        )
    )
    tokens = jax.ShapeDtypeStruct((1, 128), jnp.int32)
    lowered = jax.jit(fn).lower(params, tokens, cache)  # raises on bad shardings
    assert lowered is not None
