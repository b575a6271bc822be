"""Quantization numerics: grid semantics, round trips, error bounds."""
import jax.numpy as jnp
import numpy as np
import pytest

from quick_tpu.quantize import (
    dequantize_tensor,
    pseudo_quantize_tensor,
    quantize_tensor,
)


@pytest.mark.parametrize("group_size", [32, 64, 128])
def test_quantize_round_trip_error(rng, group_size):
    w = rng.standard_normal((256, 64)).astype(np.float32)
    qt = quantize_tensor(jnp.asarray(w), group_size=group_size)
    wq = np.asarray(dequantize_tensor(qt, group_size=group_size))
    # max error bounded by half a quantization step per group
    ng = 256 // group_size
    steps = np.asarray(qt.scales)  # [ng, N]
    err = np.abs(wq - w).reshape(ng, group_size, 64).max(axis=1)
    assert (err <= steps * 0.5 + 1e-6).all()


def test_codes_in_range(rng):
    w = rng.standard_normal((256, 32)).astype(np.float32) * 10
    qt = quantize_tensor(jnp.asarray(w))
    q = np.asarray(qt.q)
    assert q.min() >= 0 and q.max() <= 15
    z = np.asarray(qt.zeros)
    assert np.allclose(z, np.round(z))  # integer zero points


def test_extremes_are_representable(rng):
    """min/max of each group must map near code 0 / 15 (asymmetric grid)."""
    w = rng.standard_normal((128, 16)).astype(np.float32)
    qt = quantize_tensor(jnp.asarray(w), group_size=128)
    q = np.asarray(qt.q)
    assert (q.max(axis=0) == 15).all()
    assert (q.min(axis=0) == 0).all()


def test_symmetric_mode(rng):
    w = rng.standard_normal((128, 16)).astype(np.float32)
    qt = quantize_tensor(jnp.asarray(w), zero_point=False)
    z = np.asarray(qt.zeros)
    assert (z == 8.0).all()
    wq = np.asarray(dequantize_tensor(qt))
    assert np.abs(wq - w).max() < np.abs(w).max() / 7 + 1e-6


def test_pseudo_quantize_idempotent(rng):
    w = rng.standard_normal((256, 32)).astype(np.float32)
    w1 = pseudo_quantize_tensor(jnp.asarray(w))
    w2 = pseudo_quantize_tensor(w1)
    np.testing.assert_allclose(np.asarray(w1), np.asarray(w2), atol=1e-5)


def test_constant_group_does_not_nan():
    # Reference-exact degenerate behavior (quantizer.py:57-59): a constant
    # group has range 0, so scale clamps to 1e-5/15 and the zero point
    # clamps into [0, 15] — the group dequantizes to ~1e-5, NOT back to 1.0.
    # That quirk is AutoAWQ's; parity (tests/test_reference_parity.py)
    # matters more than round-tripping a degenerate input that real
    # weights never contain.
    w = jnp.ones((128, 8), jnp.float32)
    qt = quantize_tensor(w)
    wq = np.asarray(dequantize_tensor(qt))
    assert np.isfinite(wq).all()
    np.testing.assert_allclose(wq, 15.0 * 1e-5 / 15.0, atol=1e-7)
