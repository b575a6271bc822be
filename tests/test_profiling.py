"""Roofline accounting and memory observability tests."""
import numpy as np
import pytest

from quick_tpu.utils.profiling import (
    CHIP_SPECS,
    chip_specs,
    device_memory_stats,
    memory_used_pct,
    roofline,
    w4a16_gemm_counters,
)


def test_roofline_memory_bound():
    """Decode-shape GEMM (M=1) is memory bound on every chip."""
    c = w4a16_gemm_counters(1, 8192, 8192)
    spec = CHIP_SPECS["v5e"]
    r = roofline(c["flops"], c["hbm_bytes"], elapsed_s=100e-6, spec=spec)
    assert r["bound"] == "memory"
    assert r["intensity_flops_per_byte"] < 10


def test_roofline_compute_bound():
    """Large-M GEMM is compute bound."""
    c = w4a16_gemm_counters(4096, 8192, 8192)
    spec = CHIP_SPECS["v5e"]
    r = roofline(c["flops"], c["hbm_bytes"], elapsed_s=1e-3, spec=spec)
    assert r["bound"] == "compute"


def test_roofline_fraction_of_light():
    """At exactly speed of light, fraction == 1."""
    spec = CHIP_SPECS["v5e"]
    c = w4a16_gemm_counters(1, 8192, 8192)
    t_light = c["hbm_bytes"] / (spec.hbm_gbps * 1e9)
    r = roofline(c["flops"], c["hbm_bytes"], elapsed_s=t_light, spec=spec)
    np.testing.assert_allclose(r["fraction_of_light"], 1.0, rtol=1e-6)
    assert r["hbm_utilization"] <= 1.0 + 1e-9


def test_w4a16_counters_dominated_by_weights():
    c = w4a16_gemm_counters(1, 8192, 8192, group_size=128)
    assert c["hbm_bytes"] < 8192 * 8192  # well under 1 byte/weight
    assert c["hbm_bytes"] > 8192 * 8192 / 2  # at least the packed int4s


def test_chip_specs_lookup_never_fails():
    spec = chip_specs()
    assert spec.peak_bf16_tflops > 0 and spec.hbm_gbps > 0


def test_memory_stats_shape():
    stats = device_memory_stats()
    assert isinstance(stats, dict)
    pct = memory_used_pct()
    assert pct is None or 0 <= pct <= 100
