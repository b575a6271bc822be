"""Fused decode-step attention: RoPE + cache write + attention, one kernel.

At bs=1 decode the per-layer GEMMs already stream weights at ~99% of HBM
light (tools/decode_breakdown.py), leaving ~38 us/layer of fusion-boundary
glue: the rope fusions, two cache dynamic-update-slices, and the attention
einsum chain each cost a kernel launch + layout round-trips that XLA cannot
merge across the quantized-GEMM custom calls. This kernel swallows the
whole post-qkv attention step for the S=1 dense-cache path:

- RoPE applied in-kernel as ``x*cc + (x @ P_rot)*ss`` — the rotate-half is
  a STATIC [D, D] permutation-with-sign matrix, so it rides the MXU (lane
  slicing/concat at D/2 has no clean Mosaic lowering).
- The new k/v row is written into the cache by an aliased group RMW (same
  pattern as ops/paged_write.py); attention reads the full [Hkv, S, D]
  cache block and OVERLAYS the new token's contribution via tiny
  [hq, hkv]-shaped side dots (the stale cache row is masked out), so the
  write-back stays one 8/16-row group, not the whole block.
- Online mask/softmax over the block-diagonal [hq, Hkv*S] score matrix
  (the paged kernel's all-heads-one-dot trick on the dense cache).

Replaces ~6 XLA fusions per layer with one pallas_call. Llama-family
decode shapes only: full rotate-half rotary OR no rotary (use_rope=False
for bloom/mpt/opt-class models; ALiBi bias, sliding window and logit
softcap all supported), B <= 8, cache small enough for VMEM-resident K/V
blocks.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _group_for(dtype) -> int:
    return max(8, 32 // jnp.dtype(dtype).itemsize)


def _kernel(len_ref, q_ref, kn_ref, vn_ref, cs_ref, rot_ref, slope_ref,
            kfull_ref, vfull_ref,
            o_ref, kg_out, vg_out,
            *, hq: int, hkv: int, S: int, D: int, scale: float,
            group: int, window: int, softcap: float, use_rope: bool,
            use_alibi: bool):
    ln = len_ref[0]  # tokens already cached; the new token sits at ln
    gq = hq // hkv
    T = hkv * S

    cc = cs_ref[0, 0:1, :].astype(jnp.float32)  # [1, D]
    ss = cs_ref[0, 1:2, :].astype(jnp.float32)
    rot = rot_ref[...]  # [D, D] static rotate-half matrix (f32)

    def rope(x):  # [H, D] f32
        return x * cc + jax.lax.dot_general(
            x, rot, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * ss

    # rope results round back to the activation dtype exactly like the
    # unfused apply_rope (ops/rope.py casts to x.dtype) — numerics parity.
    # ALiBi/learned-position models (bloom/mpt/opt-class, use_rope=False)
    # skip the rotation: q/k pass through in their storage dtype, exactly
    # like the unfused path that never calls apply_rope
    in_dt = q_ref.dtype
    if use_rope:
        q = rope(q_ref[0].astype(jnp.float32)).astype(in_dt).astype(
            jnp.float32
        ) * scale                                           # [hq, D]
        k_new = rope(kn_ref[0].astype(jnp.float32)).astype(in_dt).astype(
            jnp.float32
        )                                                   # [hkv, D]
    else:
        q = q_ref[0].astype(jnp.float32) * scale
        k_new = kn_ref[0].astype(jnp.float32)
    v_new = vn_ref[0].astype(jnp.float32)

    # ---- cache RMW: write the rope'd k / raw v row at position ln --------
    # the group SOURCE is the full block's slice (the group output aliases
    # the same buffer, so untouched rows keep their values; only the
    # 8/16-row group is written back)
    row = ln % group
    g0 = (ln // group) * group
    sel = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, group, 1), 3) == row
    kg_src = kfull_ref[:, :, :, pl.ds(g0, group), :]
    vg_src = vfull_ref[:, :, :, pl.ds(g0, group), :]
    kg_out[...] = jnp.where(
        sel, k_new[None, None, :, None, :].astype(kg_out.dtype), kg_src
    )
    vg_out[...] = jnp.where(
        sel, v_new[None, None, :, None, :].astype(vg_out.dtype), vg_src
    )

    # ---- attention over the cached prefix + the new token ----------------
    kf = kfull_ref[0, 0].reshape(T, D)  # leading-dim merge: free
    vf = vfull_ref[0, 0].reshape(T, D)
    qb = q.astype(kf.dtype)
    s = jax.lax.dot_general(
        qb, kf, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [hq, T]
    if softcap:
        # gemma2 logit cap on the scaled scores (q carries scale), BEFORE
        # mask — ops/attention.py:87-89's order
        s = softcap * jnp.tanh(s * (1.0 / softcap))
    head_q = jax.lax.broadcasted_iota(jnp.int32, (hq, T), 0) // gq
    head_k = jax.lax.broadcasted_iota(jnp.int32, (hq, T), 1) // S
    pos_k = jax.lax.broadcasted_iota(jnp.int32, (hq, T), 1) % S
    if use_alibi:
        # bias m_h*(pos_k - q_pos) with the query at position ln; the
        # new token's own bias is 0, so the side scores stay unbiased
        s = s + slope_ref[:] * (pos_k - ln).astype(jnp.float32)
    mask = jnp.logical_and(head_q == head_k, pos_k < ln)  # strict: the new
    # token's (stale) cache column is masked; its contribution comes from
    # the exact side dot below
    if window:
        mask = jnp.logical_and(mask, pos_k > ln - window)
    s = jnp.where(mask, s, NEG_INF)

    # new-token scores: q . k_new per (q-head, kv-head), valid only on the
    # diagonal head group
    s_new = jax.lax.dot_general(
        q, k_new, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [hq, hkv]
    if softcap:
        s_new = softcap * jnp.tanh(s_new * (1.0 / softcap))
    own = (
        jax.lax.broadcasted_iota(jnp.int32, (hq, hkv), 0) // gq
        == jax.lax.broadcasted_iota(jnp.int32, (hq, hkv), 1)
    )
    s_new = jnp.where(own, s_new, NEG_INF)

    m = jnp.maximum(
        jnp.max(s, axis=-1, keepdims=True),
        jnp.max(s_new, axis=-1, keepdims=True),
    )  # [hq, 1] — the new token guarantees m is finite
    p = jnp.where(mask, jnp.exp(s - m), 0.0)
    p_new = jnp.where(own, jnp.exp(s_new - m), 0.0)  # [hq, hkv]
    denom = jnp.sum(p, axis=-1, keepdims=True) + jnp.sum(
        p_new, axis=-1, keepdims=True
    )
    ctx = jax.lax.dot_general(
        p.astype(vf.dtype), vf, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + jax.lax.dot_general(
        p_new, v_new, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[0] = (ctx / denom).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=(
        "layer", "scale", "window", "interpret", "logit_softcap", "use_rope",
    ),
)
def fused_decode_attention(
    q: jax.Array,        # [B, hq, D] post-norm, PRE-rope queries
    k_new: jax.Array,    # [B, hkv, D] pre-rope keys
    v_new: jax.Array,    # [B, hkv, D]
    k_cache: jax.Array,  # [L, B, Hkv, S, D] dense cache planes
    v_cache: jax.Array,
    cos_row: jax.Array,  # [B, D] f32 — full-width (duplicated-half) cos at
    sin_row: jax.Array,  # the new token's position
    length: jax.Array,   # scalar int32: tokens already cached
    layer: int,
    scale: Optional[float] = None,
    window: Optional[int] = None,
    logit_softcap: Optional[float] = None,  # gemma2 cap*tanh(s/cap)
    alibi_slopes: Optional[jax.Array] = None,  # [hq] per-head slopes
    use_rope: bool = True,  # False: bloom/mpt/opt-class models — q/k pass
    # through unrotated (cos/sin rows ignored, pass zeros)
    interpret: bool = False,
):
    """Returns (attn_out [B, hq, D], k_cache', v_cache')."""
    L, B, Hkv, S, D = k_cache.shape
    hq = q.shape[1]
    scale = D ** -0.5 if scale is None else float(scale)
    group = _group_for(k_cache.dtype)
    if S % group:
        raise ValueError(f"max_seq {S} must be a multiple of group {group}")
    win = int(window) if window else 0

    # static rotate-half matrix: (x @ rot)[i] = -x[i + D/2] | x[i - D/2]
    half = D // 2
    rot = np.zeros((D, D), np.float32)
    rot[half:, :half] = np.eye(half, dtype=np.float32)      # x2 -> o1: -x2
    rot[:half, half:] = np.eye(half, dtype=np.float32)      # x1 -> o2: +x1
    rot[half:, :half] *= -1.0
    cs = jnp.stack([cos_row, sin_row], axis=1).astype(jnp.float32)
    cs = jnp.pad(cs, ((0, 0), (0, 6), (0, 0)))  # [B, 8, D]: legal sublanes
    slopes = (
        jnp.asarray(alibi_slopes, jnp.float32).reshape(hq, 1)
        if alibi_slopes is not None else jnp.zeros((hq, 1), jnp.float32)
    )

    lens = jnp.reshape(length, (1,)).astype(jnp.int32)

    def grp_index(b, ln):
        return (layer, b, 0, ln[0] // group, 0)

    def full_index(b, ln):
        return (layer, b, 0, 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, hq, D), lambda b, ln: (b, 0, 0)),
            pl.BlockSpec((1, Hkv, D), lambda b, ln: (b, 0, 0)),
            pl.BlockSpec((1, Hkv, D), lambda b, ln: (b, 0, 0)),
            pl.BlockSpec((1, 8, D), lambda b, ln: (b, 0, 0)),
            pl.BlockSpec((D, D), lambda b, ln: (0, 0)),
            pl.BlockSpec((hq, 1), lambda b, ln: (0, 0)),
            pl.BlockSpec((1, 1, Hkv, S, D), full_index),
            pl.BlockSpec((1, 1, Hkv, S, D), full_index),
        ],
        out_specs=[
            pl.BlockSpec((1, hq, D), lambda b, ln: (b, 0, 0)),
            pl.BlockSpec((1, 1, Hkv, group, D), grp_index),
            pl.BlockSpec((1, 1, Hkv, group, D), grp_index),
        ],
        scratch_shapes=[],
    )
    out, kg, vg = pl.pallas_call(
        functools.partial(
            _kernel, hq=hq, hkv=Hkv, S=S, D=D, scale=scale, group=group,
            window=win,
            softcap=float(logit_softcap) if logit_softcap else 0.0,
            use_rope=bool(use_rope), use_alibi=alibi_slopes is not None,
        ),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B, hq, D), q.dtype),
            jax.ShapeDtypeStruct(k_cache.shape, k_cache.dtype),
            jax.ShapeDtypeStruct(v_cache.shape, v_cache.dtype),
        ],
        # (lens | q, kn, vn, cs, rot, slopes, kfull, vfull): the FULL cache
        # operands alias the (group-block) outputs — buffer-level alias,
        # block-level partial writes
        input_output_aliases={7: 1, 8: 2},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)
        ),
        interpret=interpret,
    )(lens, q, k_new, v_new, cs, jnp.asarray(rot), slopes, k_cache, v_cache)
    return out, kg, vg
