"""Layer-tail megakernel (ops/fused_layer_tail.py) vs the composed ops.

The kernel is an OPT-IN experiment (QUICK_TPU_LAYER_TAIL=1; measured
slightly slower than the unfused chain on v5e — see the gate docstring in
modules/blocks.py), but its numerics must stay exact vs the unfused path
so the switch is always safe to flip.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from quick_tpu.ops.fused_layer_tail import fused_layer_tail
from quick_tpu.ops.norms import rms_norm
from quick_tpu.ops.quantized_matmul import _glu_fallback, _quantized_matmul_2d
from quick_tpu.quantize.packing import pack_qtpu

G = 128


def _mk(rng, K, N, s=0.02):
    q = rng.integers(0, 16, (K, N), dtype=np.uint8)
    return (
        jnp.asarray(pack_qtpu(q, G)),
        jnp.asarray(rng.random((K // G, N), dtype=np.float32) * s),
        jnp.asarray(rng.random((K // G, N), dtype=np.float32) * s * 0.5),
    )


@pytest.mark.parametrize("M", [1, 3, 8])
def test_layer_tail_matches_composed(M):
    rng = np.random.default_rng(0)
    K1, D, I = 512, 384, 768
    o_w, gu_w, dn_w = _mk(rng, K1, D), _mk(rng, D, 2 * I), _mk(rng, I, D)
    nw = jnp.asarray(rng.standard_normal(D) * 0.1 + 1.0, jnp.float32)
    ao = jnp.asarray(rng.standard_normal((M, K1)) * 0.1, jnp.bfloat16)
    xr = jnp.asarray(rng.standard_normal((M, D)) * 0.1, jnp.bfloat16)

    y = fused_layer_tail(ao, xr, nw, *o_w, *gu_w, *dn_w, interpret=True)

    o = _quantized_matmul_2d(ao, *o_w, group_size=G)
    h = (xr + o).astype(jnp.bfloat16)
    xn = rms_norm(h, nw, 1e-6).astype(jnp.bfloat16)
    gu = _quantized_matmul_2d(xn, *gu_w, group_size=G)
    x2 = _glu_fallback(gu)
    dn = _quantized_matmul_2d(x2, *dn_w, group_size=G)
    ref = (h + dn).astype(jnp.bfloat16)

    yf = np.asarray(y, np.float32)
    rf = np.asarray(ref, np.float32)
    # bf16-output-precision agreement (f32 accumulators reassociate
    # between the fused phases and the standalone kernels)
    denom = max(1e-6, np.abs(rf).max())
    assert np.abs(yf - rf).max() / denom < 8e-3, np.abs(yf - rf).max()


def test_layer_tail_model_path(monkeypatch):
    """QUICK_TPU_LAYER_TAIL=1 decode step == the default path on a tiny
    llama (interpret mode on CPU)."""
    monkeypatch.setenv("QUICK_TPU_LAYER_TAIL", "1")
    from quick_tpu import ModelConfig
    from quick_tpu.models import init_quant_params
    from quick_tpu.models.model import model_forward
    from quick_tpu.runtime import make_cache

    cfg = ModelConfig(
        vocab_size=128, hidden_size=256, intermediate_size=384,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64, model_type="mistral",
    )
    params = init_quant_params(cfg, jax.random.PRNGKey(0))
    toks = jax.random.randint(jax.random.PRNGKey(1), (1, 1), 0, 128)
    cache = make_cache(cfg, 1, 32).with_length(jnp.int32(5))
    lt, _ = model_forward(params, cfg, toks, cache)
    monkeypatch.setenv("QUICK_TPU_LAYER_TAIL", "0")
    cache2 = make_cache(cfg, 1, 32).with_length(jnp.int32(5))
    ref, _ = model_forward(params, cfg, toks, cache2)
    np.testing.assert_allclose(
        np.asarray(lt, np.float32), np.asarray(ref, np.float32),
        atol=0.05, rtol=0.05,
    )
