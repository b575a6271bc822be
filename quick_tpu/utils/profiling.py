"""Profiling, roofline accounting, and memory observability.

The reference's only measurement tools are CUDA events around forwards and a
VRAM percentage helper (examples/benchmark.py:42-65, utils/utils.py:64-67;
SURVEY.md section 5 "Tracing/profiling: none as a subsystem"). The TPU build
makes this a subsystem:

- ``trace``: context manager around ``jax.profiler`` writing an xplane trace
  viewable in TensorBoard/XProf.
- ``roofline``: analytic per-kernel counters — given a kernel's FLOPs and
  HBM bytes and the measured time, reports achieved TFLOPS, achieved GB/s,
  arithmetic intensity, the roofline-predicted bound, and utilization
  against chip peaks.
- ``device_memory_stats`` / ``memory_used_pct``: live HBM accounting
  (the ``compute_memory_used_pct`` analog).
- ``chip_specs``: peak numbers per TPU generation used for utilization.
"""
from __future__ import annotations

import contextlib
import dataclasses
from typing import Dict, Iterator, Optional

import jax


@dataclasses.dataclass(frozen=True)
class ChipSpec:
    name: str
    peak_bf16_tflops: float
    hbm_gbps: float
    hbm_gib: float


#: Public peak numbers (cloud.google.com/tpu/docs/system-architecture).
CHIP_SPECS = {
    "v4": ChipSpec("v4", 275.0, 1228.0, 32.0),
    "v5e": ChipSpec("v5e", 197.0, 819.0, 16.0),
    "v5p": ChipSpec("v5p", 459.0, 2765.0, 95.0),
    "v6e": ChipSpec("v6e", 918.0, 1640.0, 32.0),
}


def chip_specs(device: Optional[jax.Device] = None) -> ChipSpec:
    """Best-effort spec lookup for the attached TPU (defaults to v5e)."""
    device = device or jax.devices()[0]
    kind = getattr(device, "device_kind", "").lower()
    for key, spec in CHIP_SPECS.items():
        if key in kind:
            return spec
    if "v5 lite" in kind or "v5lite" in kind:
        return CHIP_SPECS["v5e"]
    return CHIP_SPECS["v5e"]


@contextlib.contextmanager
def trace(log_dir: str, host_tracer_level: int = 2) -> Iterator[None]:
    """``with trace("/tmp/trace"):`` — captures an XLA/XProf trace."""
    jax.profiler.start_trace(
        log_dir, create_perfetto_link=False, create_perfetto_trace=False
    )
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def roofline(
    flops: float,
    hbm_bytes: float,
    elapsed_s: float,
    spec: Optional[ChipSpec] = None,
) -> Dict[str, float]:
    """Roofline accounting for one kernel invocation.

    Returns achieved tflops/gbps, arithmetic intensity, the bound predicted
    by the roofline model ("memory" or "compute"), the speed-of-light time,
    and fraction-of-light (how close the kernel is to its own bound)."""
    spec = spec or chip_specs()
    intensity = flops / max(hbm_bytes, 1.0)
    ridge = spec.peak_bf16_tflops * 1e12 / (spec.hbm_gbps * 1e9)
    bound = "memory" if intensity < ridge else "compute"
    t_mem = hbm_bytes / (spec.hbm_gbps * 1e9)
    t_comp = flops / (spec.peak_bf16_tflops * 1e12)
    t_light = max(t_mem, t_comp)
    return {
        "tflops": flops / elapsed_s / 1e12,
        "gbps": hbm_bytes / elapsed_s / 1e9,
        "intensity_flops_per_byte": intensity,
        "bound": bound,
        "speed_of_light_s": t_light,
        "fraction_of_light": t_light / max(elapsed_s, 1e-12),
        "mxu_utilization": (flops / elapsed_s) / (spec.peak_bf16_tflops * 1e12),
        "hbm_utilization": (hbm_bytes / elapsed_s) / (spec.hbm_gbps * 1e9),
    }


def w4a16_gemm_counters(
    M: int, K: int, N: int, group_size: int = 128
) -> Dict[str, float]:
    """FLOPs and HBM bytes for one fused W4A16 GEMM (the bench.py cost model:
    int4 weights + f32 scale/zero rows + bf16 activations in/out)."""
    return {
        "flops": 2.0 * M * K * N,
        "hbm_bytes": (
            K * N / 2                       # packed int4 weights
            + (K // group_size) * N * 8.0   # scales + zeros_x_scales f32
            + M * K * 2.0 + M * N * 2.0     # bf16 activations in/out
        ),
    }


def device_memory_stats(device: Optional[jax.Device] = None) -> Dict[str, float]:
    """Live HBM stats in bytes ({} when the backend doesn't report them)."""
    device = device or jax.devices()[0]
    stats = getattr(device, "memory_stats", lambda: None)()
    return dict(stats) if stats else {}


def memory_used_pct(device: Optional[jax.Device] = None) -> Optional[float]:
    """Percent of HBM in use (reference compute_memory_used_pct,
    quick/awq/utils/utils.py:64-67)."""
    stats = device_memory_stats(device)
    used = stats.get("bytes_in_use")
    limit = stats.get("bytes_limit")
    if used is None or not limit:
        return None
    return 100.0 * used / limit
