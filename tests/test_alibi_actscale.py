"""ALiBi attention bias + ScaledActivation-analog (act_scale) tests.

Covers the MPT/Bloom/Falcon-family switches: ALiBi slopes (reference
fused/attn.py:67-98), bias application in attention, and the post-activation
scale divisor the AWQ pipeline emits for non-gated MLPs (reference
ScaledActivation, modules/act.py:3-10)."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quick_tpu import ModelConfig
from quick_tpu.models import init_float_params, model_forward, quantize_params
from quick_tpu.modules.blocks import MLPParams, mlp_forward
from quick_tpu.modules.linear import Linear
from quick_tpu.ops.alibi import alibi_slopes
from quick_tpu.ops.attention import causal_attention
from quick_tpu.runtime import make_cache, prefill

MPTISH = ModelConfig(
    vocab_size=256, hidden_size=128, intermediate_size=256,
    num_hidden_layers=2, num_attention_heads=8, num_key_value_heads=8,
    max_position_embeddings=64,
    use_alibi=True, use_rope=False, layernorm="layernorm",
    act_fn="gelu", gated_mlp=False,
)


def test_slopes_power_of_two():
    s = alibi_slopes(8)
    # paper: for 8 heads, slopes are 2^-1 .. 2^-8
    np.testing.assert_allclose(s, [2.0 ** -(i + 1) for i in range(8)], rtol=1e-6)


def test_slopes_non_power_of_two():
    s = alibi_slopes(12)
    assert s.shape == (12,)
    # first 8 are the pow2(8) slopes, the rest interleave from pow2(16)
    np.testing.assert_allclose(s[:8], alibi_slopes(8), rtol=1e-6)
    s16 = alibi_slopes(16)
    np.testing.assert_allclose(s[8:], s16[0::2][:4], rtol=1e-6)
    assert np.all(s > 0) and np.all(s < 1.0)


def test_alibi_bias_in_attention(rng):
    """ALiBi attention must equal a hand-built softmax with bias m*(j-i)."""
    B, S, H, D = 1, 6, 2, 8
    q = jnp.asarray(rng.standard_normal((B, S, H, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, S, H, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, S, H, D)), jnp.float32)
    slopes = alibi_slopes(H)
    out = causal_attention(q, k, v, alibi_slopes=jnp.asarray(slopes))

    scores = np.einsum("bshd,bthd->bhst", np.asarray(q), np.asarray(k)) / np.sqrt(D)
    i = np.arange(S)[:, None]
    j = np.arange(S)[None, :]
    bias = slopes[:, None, None] * (j - i)[None]  # [H, S, T]
    scores = scores + bias[None]
    scores = np.where((j <= i)[None, None], scores, -1e9)
    p = np.exp(scores - scores.max(-1, keepdims=True))
    p /= p.sum(-1, keepdims=True)
    ref = np.einsum("bhst,bthd->bshd", p, np.asarray(v))
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-4)


def test_alibi_shift_invariance(rng):
    """ALiBi bias differences are constant per query row under a uniform
    offset shift, so softmax output must be invariant to the absolute
    q_offset as long as the kv window is the same."""
    B, H, D, T = 1, 4, 8, 8
    q = jnp.asarray(rng.standard_normal((B, 1, H, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, T, H, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, T, H, D)), jnp.float32)
    sl = jnp.asarray(alibi_slopes(H))
    o1 = causal_attention(q, k, v, q_offset=T - 1, kv_len=T, alibi_slopes=sl)
    # genuinely different absolute offset; same full kv window attended
    o2 = causal_attention(
        q, k, v, q_offset=T - 1 + 37, kv_len=T, alibi_slopes=sl
    )
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), atol=1e-5)


def test_mpt_like_model_forward_and_cache():
    params = init_float_params(MPTISH, jax.random.PRNGKey(0))
    toks = jax.random.randint(jax.random.PRNGKey(1), (1, 10), 0, 256)
    full, _ = model_forward(params, MPTISH, toks)
    assert bool(jnp.isfinite(full).all())
    # incremental decode with ALiBi must match the full forward
    cache = make_cache(MPTISH, 1, 16)
    _, cache = prefill(params, MPTISH, toks[:, :6], cache)
    outs = []
    for t in range(6, 10):
        logits, cache = model_forward(params, MPTISH, toks[:, t : t + 1], cache)
        outs.append(logits[:, 0])
    inc = jnp.stack(outs, axis=1)
    np.testing.assert_allclose(
        np.asarray(inc), np.asarray(full[:, 6:]), atol=0.05, rtol=0.05
    )


def test_alibi_is_actually_applied():
    """Turning ALiBi off must change logits (guards against silent unwiring)."""
    params = init_float_params(MPTISH, jax.random.PRNGKey(0))
    cfg_off = dataclasses.replace(MPTISH, use_alibi=False)
    toks = jax.random.randint(jax.random.PRNGKey(1), (1, 10), 0, 256)
    la, _ = model_forward(params, MPTISH, toks)
    lb, _ = model_forward(params, cfg_off, toks)
    assert float(jnp.abs(la - lb).max()) > 1e-4


def test_act_scale_identity(rng):
    """Scaling down_proj rows by s and dividing post-act by s must be exact
    (float): the ScaledActivation invariance the AWQ pipeline relies on."""
    D, F = 16, 32
    gu = Linear(jnp.asarray(rng.standard_normal((D, F)), jnp.float32))
    dn = Linear(jnp.asarray(rng.standard_normal((F, D)), jnp.float32))
    x = jnp.asarray(rng.standard_normal((2, 3, D)), jnp.float32)
    cfg = dataclasses.replace(MPTISH, hidden_size=D, intermediate_size=F)
    base = mlp_forward(MLPParams(gu, dn), cfg, x)
    s = jnp.asarray(rng.uniform(0.5, 2.0, F), jnp.float32)
    scaled = MLPParams(
        gu, Linear(dn.weight * s[:, None]), act_scale=s
    )
    out = mlp_forward(scaled, cfg, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(base), atol=1e-5)


def test_awq_nongated_mlp_numerics():
    """AWQ on a non-gated (gelu) model must produce act_scale entries and
    keep the quantized model close to float — the path that was impossible
    without the ScaledActivation analog."""
    from quick_tpu.quantize.awq import awq_quantize_model
    from quick_tpu.config import QuantConfig

    cfg = MPTISH
    params = init_float_params(cfg, jax.random.PRNGKey(0))
    calib = jax.random.randint(jax.random.PRNGKey(2), (2, 32), 0, 256)
    qcfg = QuantConfig(q_group_size=32)
    scaled = awq_quantize_model(params, cfg, calib, qcfg)
    assert any(
        isinstance(b.mlp, MLPParams) and b.mlp.act_scale is not None
        for b in scaled.blocks
    )
    qparams = scaled  # awq_quantize_model returns packed QuantLinear blocks
    toks = jax.random.randint(jax.random.PRNGKey(3), (1, 16), 0, 256)
    lf, _ = model_forward(params, cfg, toks)
    lq, _ = model_forward(qparams, cfg, toks)
    pf = jax.nn.log_softmax(lf[:, -1])
    pq = jax.nn.log_softmax(lq[:, -1])
    kl = float(jnp.sum(jnp.exp(pf) * (pf - pq), axis=-1).mean())
    assert np.isfinite(kl) and kl < 0.5
