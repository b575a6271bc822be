"""Fused W4A16 kernel vs the golden dequant-matmul (interpret mode on CPU)."""
import jax.numpy as jnp
import numpy as np
import pytest

from quick_tpu.ops import quantized_matmul, quantized_matmul_reference
from quick_tpu.quantize import quantize_tensor
from quick_tpu.quantize.packing import pack_qtpu


@pytest.fixture(autouse=True)
def _force_interpret(monkeypatch):
    """Exercise the real Pallas kernel body (interpret mode) on CPU."""
    monkeypatch.setenv("QUICK_TPU_PALLAS_INTERPRET", "1")


def _make_case(rng, M, K, N, G=128):
    w = (rng.standard_normal((K, N)) * 0.05).astype(np.float32)
    qt = quantize_tensor(jnp.asarray(w), group_size=G)
    qw = pack_qtpu(np.asarray(qt.q), G)
    x = (rng.standard_normal((M, K)) * 0.5).astype(np.float32)
    s = np.asarray(qt.scales)
    z = np.asarray(qt.zeros)
    ref = np.asarray(
        quantized_matmul_reference(jnp.asarray(x), qt.q, qt.scales, qt.zeros, G)
    )
    return x, qw, s, z * s, ref


@pytest.mark.parametrize("M", [1, 4, 8, 16, 33, 128, 200])
def test_matches_reference_over_M(rng, M):
    x, qw, s, zs, ref = _make_case(rng, M, 512, 256)
    out = np.asarray(
        quantized_matmul(jnp.asarray(x, jnp.bfloat16), jnp.asarray(qw),
                         jnp.asarray(s), jnp.asarray(zs))
    ).astype(np.float32)
    scale = np.abs(ref).max() + 1e-6
    assert np.abs(out - ref).max() / scale < 2e-2  # bf16 activations


@pytest.mark.parametrize("K,N", [(256, 128), (384, 640), (1024, 512)])
def test_matches_reference_over_shapes(rng, K, N):
    x, qw, s, zs, ref = _make_case(rng, 16, K, N)
    out = np.asarray(
        quantized_matmul(jnp.asarray(x, jnp.bfloat16), jnp.asarray(qw),
                         jnp.asarray(s), jnp.asarray(zs))
    ).astype(np.float32)
    scale = np.abs(ref).max() + 1e-6
    assert np.abs(out - ref).max() / scale < 2e-2


def test_batched_leading_dims(rng):
    x, qw, s, zs, ref = _make_case(rng, 12, 256, 128)
    x3 = x.reshape(3, 4, 256)
    out = np.asarray(
        quantized_matmul(jnp.asarray(x3, jnp.bfloat16), jnp.asarray(qw),
                         jnp.asarray(s), jnp.asarray(zs))
    ).astype(np.float32)
    assert out.shape == (3, 4, 128)
    scale = np.abs(ref).max() + 1e-6
    assert np.abs(out.reshape(12, 128) - ref).max() / scale < 2e-2


def test_bias(rng):
    x, qw, s, zs, ref = _make_case(rng, 8, 256, 128)
    b = rng.standard_normal(128).astype(np.float32)
    out = np.asarray(
        quantized_matmul(jnp.asarray(x, jnp.bfloat16), jnp.asarray(qw),
                         jnp.asarray(s), jnp.asarray(zs),
                         bias=jnp.asarray(b))
    ).astype(np.float32)
    scale = np.abs(ref + b).max() + 1e-6
    assert np.abs(out - (ref + b)).max() / scale < 2e-2


def test_exactness_fp32_activations(rng):
    """With activations exactly representable in bf16 and tiny K the kernel
    should be near machine precision (no systematic bias)."""
    K, N, G = 128, 128, 128
    q = rng.integers(0, 16, (K, N), dtype=np.uint8)
    s = np.ones((1, N), np.float32) * 0.5
    z = np.full((1, N), 8.0, np.float32)
    qw = pack_qtpu(q, G)
    x = rng.integers(-2, 3, (8, K)).astype(np.float32)  # exact in bf16
    ref = x @ ((q.astype(np.float32) - 8.0) * 0.5)
    out = np.asarray(
        quantized_matmul(jnp.asarray(x, jnp.bfloat16), jnp.asarray(qw),
                         jnp.asarray(s), jnp.asarray(z * s))
    ).astype(np.float32)
    np.testing.assert_allclose(out, ref, atol=1e-1, rtol=1e-2)


# ---------------------------------------------------------------------------
# W4A8 (dynamic per-row INT8 activations)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("M", [16, 33, 64, 128])
def test_a8_matches_reference_over_M(rng, M):
    """A8 kernel (interpret) vs golden dequant: the extra error budget is
    the activations' per-row int8 rounding (~0.8% of row absmax)."""
    x, qw, s, zs, ref = _make_case(rng, M, 512, 256)
    out = np.asarray(
        quantized_matmul(jnp.asarray(x, jnp.bfloat16), jnp.asarray(qw),
                         jnp.asarray(s), jnp.asarray(zs), a8=True)
    ).astype(np.float32)
    scale = np.abs(ref).max() + 1e-6
    assert np.abs(out - ref).max() / scale < 3e-2


def test_a8_jnp_matches_kernel(rng, monkeypatch):
    """The jnp fallback and the interpret-mode A8 kernel share numerics
    bit-for-bit up to f32 reassociation (same int codes, same factoring)."""
    x, qw, s, zs, _ = _make_case(rng, 32, 512, 256)
    args = (jnp.asarray(x, jnp.bfloat16), jnp.asarray(qw),
            jnp.asarray(s), jnp.asarray(zs))
    monkeypatch.setenv("QUICK_TPU_PALLAS_INTERPRET", "1")
    k = np.asarray(quantized_matmul(*args, a8=True)).astype(np.float32)
    monkeypatch.setenv("QUICK_TPU_PALLAS_INTERPRET", "0")
    j = np.asarray(quantized_matmul(*args, a8=True)).astype(np.float32)
    np.testing.assert_allclose(k, j, atol=2e-2, rtol=2e-2)


def test_a8_decode_m_routes_to_a16(rng):
    """Small M (decode) must keep the W4A16 path even with a8=True —
    identical output to a8=False."""
    x, qw, s, zs, _ = _make_case(rng, 4, 256, 128)
    args = (jnp.asarray(x, jnp.bfloat16), jnp.asarray(qw),
            jnp.asarray(s), jnp.asarray(zs))
    a = np.asarray(quantized_matmul(*args, a8=True))
    b = np.asarray(quantized_matmul(*args, a8=False))
    np.testing.assert_array_equal(a, b)


# ---------------------------------------------------------------------------
# small-group (GGUF g=32) dequant-in-kernel variant
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("M,G2", [(1, 32), (16, 32), (64, 32), (16, 64)])
def test_small_group_kernel_matches_reference(rng, M, G2):
    """group_size != 128 routes to the whole-block dequant kernel (no
    sub-tile slices) — must match the golden dequant like the main
    kernel."""
    x, qw, s, zs, ref = _make_case(rng, M, 256, 128, G=G2)
    out = np.asarray(
        quantized_matmul(jnp.asarray(x, jnp.bfloat16), jnp.asarray(qw),
                         jnp.asarray(s), jnp.asarray(zs), group_size=G2)
    ).astype(np.float32)
    scale = np.abs(ref).max() + 1e-6
    assert np.abs(out - ref).max() / scale < 2e-2


def test_small_group_kernel_vs_jnp_fallback(rng, monkeypatch):
    x, qw, s, zs, _ = _make_case(rng, 8, 256, 128, G=32)
    args = (jnp.asarray(x, jnp.bfloat16), jnp.asarray(qw),
            jnp.asarray(s), jnp.asarray(zs))
    monkeypatch.setenv("QUICK_TPU_PALLAS_INTERPRET", "1")
    k = np.asarray(quantized_matmul(*args, group_size=32)).astype(np.float32)
    monkeypatch.setenv("QUICK_TPU_PALLAS_INTERPRET", "0")
    j = np.asarray(quantized_matmul(*args, group_size=32)).astype(np.float32)
    np.testing.assert_allclose(k, j, atol=2e-2, rtol=2e-2)


# ---------------------------------------------------------------------------
# bf16 scale streaming (QUICK_TPU_BF16_SCALES=1)
# ---------------------------------------------------------------------------

def test_bf16_scales_close_to_f32(rng):
    """Casting scales/zeros_x_scales to bf16 (the decode HBM-stream
    optimization, modules/linear.py::cast_scales) must stay within bf16
    rounding of the f32-scale result — the added error is one rounding of
    s and z*s, small next to the int4 step itself."""
    for M, G in ((1, 128), (16, 128), (8, 32)):
        x, qw, s, zs, ref = _make_case(rng, M, 512, 256, G=G)
        xb = jnp.asarray(x, jnp.bfloat16)
        y32 = np.asarray(
            quantized_matmul(xb, jnp.asarray(qw), jnp.asarray(s),
                             jnp.asarray(zs), group_size=G)
        ).astype(np.float32)
        y16 = np.asarray(
            quantized_matmul(xb, jnp.asarray(qw),
                             jnp.asarray(s, np.float32).astype(jnp.bfloat16),
                             jnp.asarray(zs, np.float32).astype(jnp.bfloat16),
                             group_size=G)
        ).astype(np.float32)
        scale = np.abs(ref).max() + 1e-6
        # bf16 scales track the f32-scale output to well under a percent
        assert np.abs(y16 - y32).max() / scale < 1e-2
        # and both still match the golden dequant
        assert np.abs(y16 - ref).max() / scale < 3e-2


def test_cast_scales_env_roundtrip(rng, monkeypatch):
    from quick_tpu.modules.linear import (QuantLinear, cast_scales,
                                          scales_dtype_env)
    w = jnp.asarray(rng.standard_normal((256, 128)) * 0.05, jnp.float32)
    ql = QuantLinear.from_float(w)
    monkeypatch.setenv("QUICK_TPU_BF16_SCALES", "1")
    ql16 = cast_scales(ql, scales_dtype_env())
    assert ql16.scales.dtype == jnp.bfloat16
    assert ql16.zeros_x_scales.dtype == jnp.bfloat16
    assert ql16.qweight.dtype == jnp.int32
    monkeypatch.delenv("QUICK_TPU_BF16_SCALES")
    assert scales_dtype_env() is None
    x = jnp.asarray(rng.standard_normal((4, 256)), jnp.bfloat16)
    a = np.asarray(ql(x), np.float32)
    b = np.asarray(ql16(x), np.float32)
    assert np.abs(a - b).max() / (np.abs(a).max() + 1e-6) < 1e-2


def test_dense_route_matches_reference(rng, monkeypatch):
    """QUICK_TPU_DENSE_M routes large-M calls through dequant + dense dot
    (off by default — v5e measurement in _dense_m_threshold's docstring);
    numerics must match the golden dequant like every other route."""
    x, qw, s, zs, ref = _make_case(rng, 16, 512, 256)
    monkeypatch.setenv("QUICK_TPU_DENSE_M", "16")
    out = np.asarray(
        quantized_matmul(jnp.asarray(x, jnp.bfloat16), jnp.asarray(qw),
                         jnp.asarray(s), jnp.asarray(zs))
    ).astype(np.float32)
    scale = np.abs(ref).max() + 1e-6
    assert np.abs(out - ref).max() / scale < 2e-2


def test_small_g_perm_matches_transpose():
    """The caller's reshape/transpose x-permutation must equal the
    documented _small_g_perm mapping (kept as the ground-truth spec of
    the copy-major unpack order)."""
    from quick_tpu.ops.quantized_matmul import PACK, _small_g_perm
    K, G, gpb = 512, 32, 8
    slab = G // PACK
    ng = K // G
    x = np.arange(K, dtype=np.int32)[None, :]
    via_transpose = (
        x.reshape(1, ng // gpb, gpb, PACK, slab)
        .transpose(0, 1, 3, 2, 4)
        .reshape(1, K)
    )
    perm = _small_g_perm(K, G, gpb)
    np.testing.assert_array_equal(via_transpose[0], x[0][perm])


@pytest.mark.parametrize("M", [1, 8])
def test_fused_norm_matches_separate(rng, M):
    """fuse_norm=(w, eps) inside the decode kernel prologue must equal
    rms_norm -> quantized_matmul (the decode glue fusion)."""
    from quick_tpu.ops.norms import rms_norm

    x, qw, s, zs, _ = _make_case(rng, M, 512, 256)
    nw = (rng.standard_normal(512) * 0.1 + 1.0).astype(np.float32)
    xb = jnp.asarray(x, jnp.bfloat16)
    sep = np.asarray(
        quantized_matmul(
            rms_norm(xb, jnp.asarray(nw), 1e-6),
            jnp.asarray(qw), jnp.asarray(s), jnp.asarray(zs),
        )
    ).astype(np.float32)
    fused = np.asarray(
        quantized_matmul(
            xb, jnp.asarray(qw), jnp.asarray(s), jnp.asarray(zs),
            fuse_norm=(jnp.asarray(nw), 1e-6),
        )
    ).astype(np.float32)
    scale = np.abs(sep).max() + 1e-6
    assert np.abs(fused - sep).max() / scale < 1e-2


def test_fused_norm_large_m_falls_back(rng):
    """M > 8 routes pre-norm then the plain kernel — numerics identical."""
    from quick_tpu.ops.norms import rms_norm

    x, qw, s, zs, _ = _make_case(rng, 64, 512, 256)
    nw = (rng.standard_normal(512) * 0.1 + 1.0).astype(np.float32)
    xb = jnp.asarray(x, jnp.bfloat16)
    sep = np.asarray(quantized_matmul(
        rms_norm(xb, jnp.asarray(nw), 1e-6),
        jnp.asarray(qw), jnp.asarray(s), jnp.asarray(zs)))
    fused = np.asarray(quantized_matmul(
        xb, jnp.asarray(qw), jnp.asarray(s), jnp.asarray(zs),
        fuse_norm=(jnp.asarray(nw), 1e-6)))
    np.testing.assert_allclose(fused, sep, atol=1e-6)


@pytest.mark.parametrize("M", [128, 200])
def test_a8_fused_quant_matches_external(rng, M, monkeypatch):
    """QUICK_TPU_A8_FUSED: in-kernel activation quantization must match the
    external quantize_activations + a8 kernel path."""
    from quick_tpu.ops.quantized_matmul import _quantized_matmul_2d_a8

    x, qw, s, zs, _ = _make_case(rng, M, 512, 256)
    args = (jnp.asarray(x, jnp.bfloat16), jnp.asarray(qw),
            jnp.asarray(s), jnp.asarray(zs))
    ext = np.asarray(_quantized_matmul_2d_a8(*args))
    monkeypatch.setenv("QUICK_TPU_A8_FUSED", "1")
    fused = np.asarray(_quantized_matmul_2d_a8(*args, bm=64))
    # same int8 codes, same integer dots -> tiny float diffs only
    scale = np.abs(ext).max() + 1e-6
    assert np.abs(fused.astype(np.float32) - ext.astype(np.float32)).max() / scale < 1e-3
