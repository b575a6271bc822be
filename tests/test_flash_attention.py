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


def test_window_and_softcap_golden(rng):
    """Sliding-window mask and tanh logit softcap vs a hand-built numpy
    reference (gemma2/mistral semantics: key t visible iff
    s - W < t <= s; cap applied to raw scaled scores pre-mask)."""
    B, S, H, D, W, CAP = 2, 12, 2, 8, 5, 4.0
    q = jnp.asarray(rng.standard_normal((B, S, H, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, S, H, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, S, H, D)), jnp.float32)
    out = causal_attention(q, k, v, window=W, logit_softcap=CAP)
    qn, kn, vn = (np.asarray(t, np.float64) for t in (q, k, v))
    scale = D ** -0.5
    ref = np.zeros((B, S, H, D))
    for b in range(B):
        for h in range(H):
            s_ = (qn[b, :, h] @ kn[b, :, h].T) * scale
            s_ = CAP * np.tanh(s_ / CAP)
            for i in range(S):
                for j in range(S):
                    if j > i or j <= i - W:
                        s_[i, j] = -np.inf
            p = np.exp(s_ - s_.max(-1, keepdims=True))
            p /= p.sum(-1, keepdims=True)
            ref[b, :, h] = p @ vn[b, :, h]
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5)


def test_window_decode_matches_prefill(rng):
    """Chunked decode through the dense cache must reproduce full windowed
    prefill (q_offset/kv_len path with the window mask)."""
    B, S, H, D, W = 1, 10, 2, 8, 4
    q = jnp.asarray(rng.standard_normal((B, S, H, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, S, H, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, S, H, D)), jnp.float32)
    full = causal_attention(q, k, v, window=W)
    for t in range(6, S):
        step = causal_attention(
            q[:, t : t + 1], k[:, : t + 1], v[:, : t + 1],
            q_offset=t, kv_len=t + 1, window=W,
        )
        np.testing.assert_allclose(
            np.asarray(step[:, 0]), np.asarray(full[:, t]), atol=2e-5
        )


@pytest.mark.parametrize("W,cap", [(64, None), (None, 4.0), (64, 4.0), (200, None)])
def test_flash_window_softcap_matches_reference(rng, W, cap):
    """Flash kernel window/softcap vs the einsum path (incl. the
    window-side block-skip: W=64 < bk exercises tiles fully below the
    window)."""
    q, k, v = _mk(rng, 2, 256, 256, 4, 2, 64)
    ref = _ref(q, k, v, window=W, logit_softcap=cap)
    out = flash_attention(
        q, k, v, window=W, logit_softcap=cap, bq=128, bk=128, interpret=True
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-3)


def test_flash_window_with_offset(rng):
    """Windowed chunk attending into a longer cache (decode-style offsets)."""
    q, k, v = _mk(rng, 1, 8, 512, 4, 4, 64)
    ref = _ref(q, k, v, q_offset=400, kv_len=408, window=128)
    out = flash_attention(
        q, k, v, q_offset=400, kv_len=408, window=128,
        bq=8, bk=128, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-3)
