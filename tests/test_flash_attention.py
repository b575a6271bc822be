"""Flash attention kernel vs the einsum reference (Pallas interpret mode)."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quick_tpu.ops.alibi import alibi_slopes
from quick_tpu.ops.attention import causal_attention
from quick_tpu.ops.flash_attention import flash_attention


def _ref(q, k, v, **kw):
    os.environ["QUICK_TPU_FLASH"] = "0"
    try:
        return causal_attention(q, k, v, **kw)
    finally:
        os.environ.pop("QUICK_TPU_FLASH", None)


def _mk(rng, B, S, T, Hq, Hkv, D, dtype=jnp.float32):
    q = jnp.asarray(rng.standard_normal((B, S, Hq, D)), dtype)
    k = jnp.asarray(rng.standard_normal((B, T, Hkv, D)), dtype)
    v = jnp.asarray(rng.standard_normal((B, T, Hkv, D)), dtype)
    return q, k, v


@pytest.mark.parametrize(
    "B,S,T,Hq,Hkv,D",
    [
        (1, 256, 256, 4, 4, 64),    # MHA prefill
        (2, 128, 128, 8, 2, 64),    # GQA prefill
        (1, 100, 100, 4, 1, 32),    # MQA, ragged S (padding path)
        (1, 8, 256, 4, 4, 64),      # chunk attending into a longer cache
    ],
)
def test_flash_matches_reference(rng, B, S, T, Hq, Hkv, D):
    q, k, v = _mk(rng, B, S, T, Hq, Hkv, D)
    ref = _ref(q, k, v)
    out = flash_attention(q, k, v, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-3)


def test_flash_offset_and_kvlen(rng):
    """Per-batch query offsets + kv lengths (the paged/chunked serving view)."""
    B, S, T, H, D = 2, 8, 256, 4, 64
    q, k, v = _mk(rng, B, S, T, H, H, D)
    qoff = jnp.asarray([16, 100], jnp.int32)
    klen = jnp.asarray([24, 108], jnp.int32)
    ref = _ref(q, k, v, q_offset=qoff, kv_len=klen)
    out = flash_attention(q, k, v, q_offset=qoff, kv_len=klen, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-3)


def test_flash_alibi(rng):
    B, S, H, D = 1, 128, 8, 64
    q, k, v = _mk(rng, B, S, S, H, H, D)
    sl = jnp.asarray(alibi_slopes(H))
    ref = _ref(q, k, v, alibi_slopes=sl)
    out = flash_attention(q, k, v, alibi_slopes=sl, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-3)


def test_flash_bf16(rng):
    B, S, H, D = 1, 128, 4, 64
    q, k, v = _mk(rng, B, S, S, H, H, D, jnp.bfloat16)
    ref = _ref(q, k, v)
    out = flash_attention(q, k, v, interpret=True)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), atol=2e-2
    )


def test_flash_numerical_stability(rng):
    """Large score magnitudes must not overflow (online softmax rescaling)."""
    B, S, H, D = 1, 128, 2, 64
    q = jnp.asarray(rng.standard_normal((B, S, H, D)) * 30, jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, S, H, D)) * 30, jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, S, H, D)), jnp.float32)
    out = flash_attention(q, k, v, interpret=True)
    assert bool(jnp.isfinite(out).all())
    ref = _ref(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-3)
