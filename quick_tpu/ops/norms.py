"""Normalization ops.

The reference routes RMSNorm through a CUDA extension because torch eager
can't fuse it (quick/awq/modules/fused/norm.py:10-19). Under ``jit`` XLA
fuses the jnp expression into a single VPU pass, so the jnp form IS the
fused kernel; a Pallas variant is provided for the benchmark harness to
verify that claim (see tests/bench).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def rms_norm(x: jax.Array, weight: jax.Array, eps: float = 1e-5) -> jax.Array:
    """RMSNorm in f32 with cast back to x.dtype (matches HF Llama numerics)."""
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    y = xf * jax.lax.rsqrt(var + eps)
    return (y * weight.astype(jnp.float32)).astype(x.dtype)


def layer_norm(
    x: jax.Array, weight: jax.Array, bias: jax.Array | None, eps: float = 1e-5
) -> jax.Array:
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y * weight.astype(jnp.float32)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(x.dtype)


def _rms_norm_kernel(x_ref, w_ref, o_ref, *, eps: float):
    x = x_ref[:].astype(jnp.float32)
    var = jnp.mean(x * x, axis=-1, keepdims=True)
    o_ref[:] = (x * jax.lax.rsqrt(var + eps) * w_ref[:].astype(jnp.float32)).astype(
        o_ref.dtype
    )


def rms_norm_pallas(x: jax.Array, weight: jax.Array, eps: float = 1e-5) -> jax.Array:
    """Single-pass Pallas RMSNorm over the last dim (rows blocked)."""
    import functools

    lead = x.shape[:-1]
    D = x.shape[-1]
    x2 = x.reshape(-1, D)
    M = x2.shape[0]
    bm = M if M <= 256 else 256
    pad = (-M) % bm
    if pad:
        x2 = jnp.pad(x2, ((0, pad), (0, 0)))
    out = pl.pallas_call(
        functools.partial(_rms_norm_kernel, eps=eps),
        grid=((M + pad) // bm,),
        in_specs=[
            pl.BlockSpec((bm, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((D,), lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M + pad, D), x.dtype),
        interpret=jax.default_backend() == "cpu",
    )(x2, weight)
    return out[:M].reshape(*lead, D)
