"""AWQ: activation-aware weight quantization pipeline (functional JAX).

Re-implements the reference's search semantics
(quick/awq/quantize/quantizer.py):

- scale search (quantizer.py:181-282): 20-point grid over
  ``s = x_mean^r / w_mean^(1-r)`` (duo scaling), normalized by
  sqrt(max*min); objective = MSE of the inspected module's output with
  weights pseudo-quantized as Q(W*s)/s. The module-level objective (whole
  attention / whole MLP, not just the linear) matches the reference's
  ``module2inspect`` choice.
- clip search (quantizer.py:284-350): per-(group, out-channel) grid shrink
  of the clipping range, objective = MSE of per-group partial products over
  sampled tokens; q/k projections are never clipped (quantizer.py:287).
- scale application (quick/awq/quantize/scale.py:27-137): fold ``1/s`` into
  the previous op (norm weight or previous linear's output channels), ``s``
  into the target weights.

Differences from the reference by design: no hooks (the block forward is
re-run functionally to capture intermediate activations), no device
round-robin (one jit program), and fused QKV / gate-up are searched jointly
(the reference also scales those groups jointly, models/llama.py:37-73).
"""
from __future__ import annotations

import dataclasses
from typing import Callable, List, Optional, Tuple

import jax
import jax.numpy as jnp

from quick_tpu.config import ModelConfig, QuantConfig
from quick_tpu.modules.blocks import (
    AttentionParams,
    BlockParams,
    MLPParams,
    MoEParams,
)
from quick_tpu.modules.linear import Linear, QuantLinear
from quick_tpu.ops.attention import causal_attention
from quick_tpu.ops.norms import layer_norm, rms_norm
from quick_tpu.ops.rope import apply_rope
from quick_tpu.quantize.numerics import pseudo_quantize_tensor

N_GRID = 20


# ---------------------------------------------------------------------------
# Scale search
# ---------------------------------------------------------------------------

def _w_mean_score(ws: List[jax.Array], group_size: int) -> jax.Array:
    """Per-input-channel weight magnitude score (reference STEP 1,
    quantizer.py:193-199): |w| normalized by per-group amax, then averaged
    over all output channels of all layers in the group."""
    parts = []
    for w in ws:
        K, N = w.shape
        wg = jnp.abs(w.astype(jnp.float32)).reshape(K // group_size, group_size, N)
        wn = wg / (jnp.max(wg, axis=1, keepdims=True) + 1e-6)
        parts.append(wn.reshape(K, N))
    cat = jnp.concatenate(parts, axis=1)
    return jnp.mean(cat, axis=1)  # [K]


def search_scale(
    x: jax.Array,  # [T, K] inputs to the group
    ws: List[jax.Array],  # weights [K, N_i] sharing the input
    loss_forward: Callable[[List[jax.Array]], jax.Array],
    group_size: int,
    zero_point: bool = True,
    duo_scaling: bool = True,
) -> jax.Array:
    """Grid-search the per-input-channel scale vector s [K].

    loss_forward(scaled_ws) -> module output; MSE against the fp output is
    minimized (reference _compute_best_scale, quantizer.py:221-282)."""
    x_mean = jnp.mean(jnp.abs(x.astype(jnp.float32)), axis=0)  # [K]
    w_mean = _w_mean_score(ws, group_size)
    fp_out = loss_forward(ws).astype(jnp.float32)

    def candidate(ratio):
        # reference-exact candidate (quantizer.py:249-253): clamp the
        # QUOTIENT at 1e-4 (not an epsilon in the denominator) so the two
        # implementations pick identical grid points on identical inputs
        if duo_scaling:
            s = jnp.power(x_mean, ratio) / jnp.power(w_mean, 1 - ratio)
        else:
            s = jnp.power(x_mean, ratio)
        s = jnp.clip(s, 1e-4, None)
        s = s / jnp.sqrt(jnp.max(s) * jnp.min(s))
        return s

    def loss_for(s):
        scaled = []
        for w in ws:
            wq = pseudo_quantize_tensor(
                w.astype(jnp.float32) * s[:, None], group_size,
                zero_point=zero_point,
            ) / s[:, None]
            scaled.append(wq.astype(w.dtype))
        out = loss_forward(scaled).astype(jnp.float32)
        return jnp.mean((fp_out - out) ** 2)

    best_s = None
    best_loss = jnp.inf
    for i in range(N_GRID):
        s = candidate(i / N_GRID)
        l = loss_for(s)
        if best_s is None:
            best_s, best_loss = s, l
        else:
            pick = l < best_loss
            best_s = jnp.where(pick, s, best_s)
            best_loss = jnp.where(pick, l, best_loss)
    return best_s


# ---------------------------------------------------------------------------
# Clip search
# ---------------------------------------------------------------------------

def search_clip(
    w: jax.Array,  # [K, N]
    x: jax.Array,  # [T, K]
    group_size: int,
    zero_point: bool = True,
    n_grid: int = N_GRID,
    max_shrink: float = 0.5,
    n_sample_token: int = 512,
) -> jax.Array:
    """Best per-(group, out-channel) |w| clipping bound [ng, N]
    (reference _compute_best_clip, quantizer.py:302-350)."""
    K, N = w.shape
    ng = K // group_size
    T = x.shape[0]
    stride = max(T // n_sample_token, 1)
    xs = x[::stride].astype(jnp.float32)  # [Ts, K]
    xg = xs.reshape(-1, ng, group_size)  # [Ts, ng, G]
    wg = w.astype(jnp.float32).reshape(ng, group_size, N)
    org_max = jnp.max(jnp.abs(wg), axis=1, keepdims=True)  # [ng, 1, N]
    org_out = jnp.einsum("tgk,gkn->tgn", xg, wg)  # [Ts, ng, N]

    best_max = org_max
    min_err = jnp.full((ng, 1, N), jnp.inf, jnp.float32)
    for i_s in range(int(max_shrink * n_grid)):
        maxv = org_max * (1 - i_s / n_grid)
        cw = jnp.clip(wg, -maxv, maxv)
        qw = pseudo_quantize_tensor(
            cw.reshape(K, N), group_size, zero_point=zero_point
        ).reshape(ng, group_size, N)
        out = jnp.einsum("tgk,gkn->tgn", xg, qw)
        err = jnp.mean((out - org_out) ** 2, axis=0)[:, None, :]  # [ng,1,N]
        pick = err < min_err
        min_err = jnp.where(pick, err, min_err)
        best_max = jnp.where(pick, maxv, best_max)
    return best_max[:, 0, :]  # [ng, N]


def apply_clip(w: jax.Array, max_val: jax.Array, group_size: int) -> jax.Array:
    K, N = w.shape
    wg = w.astype(jnp.float32).reshape(K // group_size, group_size, N)
    wc = jnp.clip(wg, -max_val[:, None, :], max_val[:, None, :])
    return wc.reshape(K, N).astype(w.dtype)


# ---------------------------------------------------------------------------
# Block-level pipeline (Llama-like family + MoE)
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class AwqBlockResult:
    block: BlockParams  # quantized
    x_next: jax.Array   # activations for the next block (float, scaled)


def awq_quantize_block(
    blk: BlockParams,
    cfg: ModelConfig,
    x: jax.Array,           # [B, S, D] float activations entering the block
    positions: jax.Array,   # [B, S]
    rope_cos: jax.Array,
    rope_sin: jax.Array,
    qcfg: QuantConfig,
    apply_clips: bool = True,
    skip: frozenset = frozenset(),
    sliding: bool = False,  # this layer attends through a sliding window
) -> AwqBlockResult:
    """Search + apply AWQ scales/clips for one block, then quantize+pack.

    Mirrors the per-layer hot loop of AwqQuantizer.quantize
    (reference quantizer.py:87-146) with the Llama scaling groups
    (reference models/llama.py:37-73). ``skip`` holds canonical linear names
    ('qkv'/'o'/'gate_up'/'down') to leave float (modules_to_not_convert,
    reference utils/module.py:44-54; AWQ scales are still applied — an exact
    float transform)."""
    G = qcfg.q_group_size
    zp = qcfg.zero_point
    B, S, D = x.shape
    hq, hkv, hd = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim

    def flat(a):  # [B,S,D] -> [T,D]
        return a.reshape(-1, a.shape[-1])

    def attn_fwd(qkv_w: jax.Array, attn_in: jax.Array) -> jax.Array:
        """Attention output (pre-o_proj input) given a qkv weight —
        mirrors blocks.attention_forward's numerics (q/k norms,
        query_pre_attn_scalar, sliding window, logit softcap) so the
        scale/clip search optimizes against the REAL activation
        distributions for qwen3/gemma2/gemma3/olmo2/cohere/mistral."""
        from quick_tpu.ops.norms import layer_norm as _ln

        qkv = attn_in @ qkv_w.astype(attn_in.dtype)
        if blk.attn.qkv_proj.bias is not None:
            qkv = qkv + blk.attn.qkv_proj.bias.astype(qkv.dtype)
        q, k, v = jnp.split(qkv, [hq * hd, (hq + hkv) * hd], axis=-1)
        qn, kn = blk.attn.q_norm, blk.attn.k_norm
        if cfg.use_qk_norm and cfg.qk_norm_full:
            q = rms_norm(q, qn, cfg.rms_norm_eps)
            k = rms_norm(k, kn, cfg.rms_norm_eps)
        q = q.reshape(B, S, hq, hd)
        k = k.reshape(B, S, hkv, hd)
        v = v.reshape(B, S, hkv, hd)
        if cfg.use_qk_norm and not cfg.qk_norm_full:
            if cfg.layernorm == "rmsnorm":
                q = rms_norm(q, qn, cfg.rms_norm_eps)
                k = rms_norm(k, kn, cfg.rms_norm_eps)
            else:
                q = _ln(q, qn, None, cfg.rms_norm_eps)
                k = _ln(k, kn, None, cfg.rms_norm_eps)
        if cfg.query_pre_attn_scalar is not None:
            q = q * jnp.asarray(
                cfg.query_pre_attn_scalar ** -0.5 * hd ** 0.5, q.dtype
            )
        if cfg.use_rope:
            q = apply_rope(q, positions, rope_cos, rope_sin)
            k = apply_rope(k, positions, rope_cos, rope_sin)
        slopes = None
        if cfg.use_alibi:
            from quick_tpu.ops.alibi import alibi_slopes

            slopes = jnp.asarray(alibi_slopes(hq))
        window = cfg.sliding_window if sliding else None
        if window is not None and S <= window:
            window = None
        out = causal_attention(
            q, k, v, alibi_slopes=slopes, window=window,
            logit_softcap=cfg.attn_logit_softcap,
        )
        return out.reshape(B, S, hq * hd)

    def norm_fwd(h, w, b):
        if cfg.layernorm == "rmsnorm":
            return rms_norm(h, w, cfg.rms_norm_eps)
        return layer_norm(h, w, b, cfg.rms_norm_eps)

    # ---------------- attention: norm -> qkv group --------------------------
    qkv_w = blk.attn.qkv_proj.weight
    if blk.attn_norm is not None:
        attn_norm = blk.attn_norm.astype(jnp.float32)
        attn_norm_bias = (
            None if blk.attn_norm_bias is None
            else blk.attn_norm_bias.astype(jnp.float32)
        )
        attn_in = norm_fwd(x, blk.attn_norm, blk.attn_norm_bias)

        s_qkv = search_scale(
            flat(attn_in), [qkv_w],
            loss_forward=lambda ws: attn_fwd(ws[0], attn_in),
            group_size=G, zero_point=zp,
        )
        # apply: norm (weight AND bias) /= s, qkv *= s (reference
        # scale_ln_fcs, scale.py:71-98 divides both ln.weight and ln.bias)
        attn_norm = attn_norm / s_qkv
        if attn_norm_bias is not None:
            attn_norm_bias = attn_norm_bias / s_qkv
        qkv_w = (qkv_w.astype(jnp.float32) * s_qkv[:, None]).astype(qkv_w.dtype)
        attn_in = attn_in / s_qkv.astype(attn_in.dtype)
    else:
        # olmo2 (pre_norms=False): the qkv input is the raw residual
        # stream — no preceding op to fold a scale into, so the qkv group
        # keeps unit scales (clip search still applies below); the
        # reference's apply_scale has the same prev-op requirement
        # (quick/awq/quantize/scale.py:27-54)
        attn_norm = attn_norm_bias = None
        attn_in = x

    # o_proj group: prev_op = v section (only when shapes match, i.e. MHA —
    # reference models/llama.py:52-58 guard)
    o_w = blk.attn.o_proj.weight
    qkv_b = blk.attn.qkv_proj.bias
    o_in = attn_fwd(qkv_w, attn_in)
    if hq == hkv:
        s_o = search_scale(
            flat(o_in), [o_w],
            loss_forward=lambda ws: o_in @ ws[0].astype(o_in.dtype),
            group_size=G, zero_point=zp,
        )
        # v-section output channels /= s_o (weight AND bias — reference
        # scale_fc_fc divides prev_op.bias, scale.py:100-117); o rows *= s_o
        v_cols = slice((hq + hkv) * hd, (hq + 2 * hkv) * hd)
        qkv_w = qkv_w.at[:, v_cols].divide(s_o[None, :].astype(qkv_w.dtype))
        if qkv_b is not None:
            qkv_b = qkv_b.at[v_cols].divide(s_o.astype(qkv_b.dtype))
        o_w = (o_w.astype(jnp.float32) * s_o[:, None]).astype(o_w.dtype)
        o_in = o_in / s_o.astype(o_in.dtype)

    # clips (skip q/k sections — reference avoid_clipping, quantizer.py:287)
    if apply_clips:
        v_cols = slice((hq + hkv) * hd, (hq + 2 * hkv) * hd)
        v_clip = search_clip(qkv_w[:, v_cols], flat(attn_in), G, zp)
        qkv_w = qkv_w.at[:, v_cols].set(
            apply_clip(qkv_w[:, v_cols], v_clip, G)
        )
        o_clip = search_clip(o_w, flat(o_in), G, zp)
        o_w = apply_clip(o_w, o_clip, G)

    attn_out = o_in @ o_w.astype(o_in.dtype)
    if blk.attn.o_proj.bias is not None:
        attn_out = attn_out + blk.attn.o_proj.bias.astype(attn_out.dtype)
    if blk.attn_post_norm is not None:  # gemma2/olmo2 output norm
        attn_out = norm_fwd(attn_out, blk.attn_post_norm, None)
    if cfg.residual_multiplier is not None:  # granite / minicpm
        attn_out = attn_out * jnp.asarray(
            cfg.residual_multiplier, attn_out.dtype
        )
    x_mid = x + attn_out if not cfg.parallel_residual else x

    # ---------------- MLP ---------------------------------------------------
    if blk.mlp_norm is not None:
        mlp_norm = blk.mlp_norm.astype(jnp.float32)
        mlp_norm_bias = (
            None if blk.mlp_norm_bias is None
            else blk.mlp_norm_bias.astype(jnp.float32)
        )
        mlp_in = norm_fwd(x_mid, blk.mlp_norm, blk.mlp_norm_bias)
        ones = jnp.ones_like(mlp_norm)
    else:
        # olmo2: raw residual stream feeds the MLP — gate_up keeps unit
        # scales (no preceding op), mirroring the attention side
        mlp_norm = mlp_norm_bias = None
        mlp_in = x_mid
        ones = None

    if isinstance(blk.mlp, MoEParams):
        new_mlp, mlp_out, mlp_norm_scale = _awq_moe(
            blk.mlp, cfg, mlp_in, ones, qcfg, apply_clips, skip=skip
        )
    else:
        new_mlp, mlp_out, mlp_norm_scale = _awq_mlp(
            blk.mlp, cfg, mlp_in, ones, qcfg, apply_clips
        )
        # pack dense mlp
        def pack(name, lin):
            if name in skip:
                return lin
            return QuantLinear.from_float(lin.weight, lin.bias, G, zp)

        new_mlp = MLPParams(
            gate_up_proj=pack("gate_up", new_mlp.gate_up_proj),
            down_proj=pack("down", new_mlp.down_proj),
            act_scale=new_mlp.act_scale,
        )
    # _awq_mlp/_awq_moe return the multiplicative norm adjustment (1/s_gu);
    # apply it to weight AND bias
    if mlp_norm is not None:
        mlp_norm = mlp_norm * mlp_norm_scale
        if mlp_norm_bias is not None:
            mlp_norm_bias = mlp_norm_bias * mlp_norm_scale

    if blk.mlp_post_norm is not None:  # gemma2 sandwich norm
        mlp_out = norm_fwd(mlp_out, blk.mlp_post_norm, None)
    if cfg.residual_multiplier is not None:
        mlp_out = mlp_out * jnp.asarray(
            cfg.residual_multiplier, mlp_out.dtype
        )
    if cfg.parallel_residual:
        x_next = x + attn_out + mlp_out
    else:
        x_next = x_mid + mlp_out

    new_attn = AttentionParams(
        qkv_proj=(
            Linear(qkv_w.astype(blk.attn.qkv_proj.weight.dtype), qkv_b)
            if "qkv" in skip
            else QuantLinear.from_float(qkv_w, qkv_b, G, zp)
        ),
        o_proj=(
            Linear(o_w.astype(blk.attn.o_proj.weight.dtype),
                   blk.attn.o_proj.bias)
            if "o" in skip
            else QuantLinear.from_float(o_w, blk.attn.o_proj.bias, G, zp)
        ),
        q_norm=blk.attn.q_norm,
        k_norm=blk.attn.k_norm,
    )
    new_block = BlockParams(
        attn_norm=(
            None if attn_norm is None
            else attn_norm.astype(blk.attn_norm.dtype)
        ),
        attn=new_attn,
        mlp_norm=(
            None if mlp_norm is None
            else mlp_norm.astype(blk.mlp_norm.dtype)
        ),
        mlp=new_mlp,
        attn_norm_bias=(
            None if attn_norm_bias is None
            else attn_norm_bias.astype(blk.attn_norm_bias.dtype)
        ),
        mlp_norm_bias=(
            None if mlp_norm_bias is None
            else mlp_norm_bias.astype(blk.mlp_norm_bias.dtype)
        ),
        # gemma2 sandwich norms act on sub-layer outputs — no AWQ scale
        # folds into them; carried through unchanged
        attn_post_norm=blk.attn_post_norm,
        mlp_post_norm=blk.mlp_post_norm,
    )
    return AwqBlockResult(block=new_block, x_next=x_next)


def _awq_mlp(mlp: MLPParams, cfg, mlp_in, mlp_norm, qcfg, apply_clips):
    """Dense SwiGLU MLP: norm->gate_up group, up->down group."""
    G, zp = qcfg.q_group_size, qcfg.zero_point
    F = cfg.intermediate_size
    gu_w = mlp.gate_up_proj.weight
    gu_b = mlp.gate_up_proj.bias
    dn_w = mlp.down_proj.weight
    flat = lambda a: a.reshape(-1, a.shape[-1])

    from quick_tpu.modules.blocks import _act

    def mlp_fwd(gu, dn, h, b=None):
        z = h @ gu.astype(h.dtype)
        if b is not None:
            z = z + b.astype(z.dtype)
        if cfg.gated_mlp:
            gate, up = jnp.split(z, 2, axis=-1)
            z = _act(gate, cfg) * up
        else:
            z = _act(z, cfg)  # silu/gelu/RELU — must match blocks._act
        return z @ dn.astype(h.dtype)

    if mlp_norm is not None:
        s_gu = search_scale(
            flat(mlp_in), [gu_w],
            loss_forward=lambda ws: mlp_fwd(ws[0], dn_w, mlp_in, gu_b),
            group_size=G, zero_point=zp,
        )
        mlp_norm = mlp_norm / s_gu
        gu_w = (gu_w.astype(jnp.float32) * s_gu[:, None]).astype(gu_w.dtype)
        mlp_in = mlp_in / s_gu.astype(mlp_in.dtype)

    # down group: prev_op = up half (reference models/llama.py:64-71)
    z = mlp_in @ gu_w.astype(mlp_in.dtype)
    if gu_b is not None:
        z = z + gu_b.astype(z.dtype)
    if cfg.gated_mlp:
        gate, up = jnp.split(z, 2, axis=-1)
        dn_in = _act(gate, cfg) * up
    else:
        dn_in = _act(z, cfg)
    s_dn = search_scale(
        flat(dn_in), [dn_w],
        loss_forward=lambda ws: dn_in @ ws[0].astype(dn_in.dtype),
        group_size=G, zero_point=zp,
    )
    act_scale = None
    if cfg.gated_mlp:
        # up half (weight AND bias) /= s_dn — reference scale_fc_fc divides
        # prev_op.bias too (scale.py:100-117)
        up_cols = slice(F, 2 * F)
        gu_w = gu_w.at[:, up_cols].divide(s_dn[None, :].astype(gu_w.dtype))
        if gu_b is not None:
            gu_b = gu_b.at[up_cols].divide(s_dn.astype(gu_b.dtype))
    else:
        # the scale cannot be folded through the nonlinearity — record it as
        # a post-activation divisor (reference inserts ScaledActivation here,
        # quick/awq/quantize/scale.py:56-68, models/base.py:443-457)
        act_scale = s_dn.astype(jnp.float32)
    dn_w = (dn_w.astype(jnp.float32) * s_dn[:, None]).astype(dn_w.dtype)
    dn_in = dn_in / s_dn.astype(dn_in.dtype)

    if apply_clips:
        gu_clip = search_clip(gu_w, flat(mlp_in), G, zp)
        gu_w = apply_clip(gu_w, gu_clip, G)
        dn_clip = search_clip(dn_w, flat(dn_in), G, zp)
        dn_w = apply_clip(dn_w, dn_clip, G)

    mlp_out = dn_in @ dn_w.astype(dn_in.dtype)
    if mlp.down_proj.bias is not None:
        mlp_out = mlp_out + mlp.down_proj.bias.astype(mlp_out.dtype)
    return (
        MLPParams(
            gate_up_proj=Linear(gu_w, gu_b),
            down_proj=Linear(dn_w, mlp.down_proj.bias),
            act_scale=act_scale,
        ),
        mlp_out,
        mlp_norm,
    )


def _awq_moe(moe: MoEParams, cfg, mlp_in, mlp_norm, qcfg, apply_clips,
             skip: frozenset = frozenset()):
    """MoE: all experts' gate_up scaled JOINTLY from the shared input
    (reference models/mixtral.py:58-66), per-expert down scaling (69-74)."""
    from quick_tpu.modules.blocks import _act, moe_forward

    G, zp = qcfg.q_group_size, qcfg.zero_point
    E = cfg.num_local_experts
    flat = lambda a: a.reshape(-1, a.shape[-1])
    gu = moe.gate_up_proj.weight  # [E, D, 2F]
    dn = moe.down_proj.weight     # [E, F, D]
    F = gu.shape[-1] // 2         # expert ffn width (deepseek:
    # moe_intermediate_size != the dense layers' intermediate_size)
    sgu = None if moe.shared_gate_up is None else moe.shared_gate_up.weight
    sdn = None if moe.shared_down is None else moe.shared_down.weight

    def routed(gu_s, dn_s, h, sgu_s=None):
        # the loss forward includes the shared expert when present — its
        # weights are scaled by the SAME joint s_gu, so the search must
        # measure its quantization error too
        return moe_forward(
            MoEParams(moe.router, Linear(gu_s), Linear(dn_s),
                      shared_gate_up=(
                          None if sgu_s is None else Linear(sgu_s)
                      ),
                      shared_down=(
                          None if sgu_s is None else Linear(sdn)
                      ),
                      score_bias=moe.score_bias,
                      shared_gate=moe.shared_gate),
            cfg, h,
        )

    # joint gate_up scale over all experts — INCLUDING the deepseek shared
    # experts, which read the same normed input (the reference scales all
    # mixtral experts' w1/w3 jointly the same way, models/mixtral.py:58-66).
    # Skipped when no preceding norm exists (olmo2 pre_norms=False)
    if mlp_norm is not None:
        layers = [gu[e] for e in range(E)] + ([sgu] if sgu is not None else [])
        s_gu = search_scale(
            flat(mlp_in), layers,
            loss_forward=lambda ws: routed(
                jnp.stack(ws[:E]), dn, mlp_in,
                ws[E] if sgu is not None else None,
            ),
            group_size=G, zero_point=zp,
        )
        mlp_norm = mlp_norm / s_gu
        gu = (gu.astype(jnp.float32) * s_gu[None, :, None]).astype(gu.dtype)
        if sgu is not None:
            sgu = (sgu.astype(jnp.float32) * s_gu[:, None]).astype(gu.dtype)
        mlp_in = mlp_in / s_gu.astype(mlp_in.dtype)

    # per-expert down scale + clips
    new_dn = []
    new_gu = []
    for e in range(E):
        z = mlp_in @ gu[e].astype(mlp_in.dtype)
        gate, up = jnp.split(z, 2, axis=-1)
        dn_in = _act(gate, cfg) * up
        s_dn = search_scale(
            flat(dn_in), [dn[e]],
            loss_forward=lambda ws: dn_in @ ws[0].astype(dn_in.dtype),
            group_size=G, zero_point=zp,
        )
        gue = gu[e].at[:, F:].divide(s_dn[None, :].astype(gu.dtype))
        dne = (dn[e].astype(jnp.float32) * s_dn[:, None]).astype(dn.dtype)
        dn_in = dn_in / s_dn.astype(dn_in.dtype)
        if apply_clips:
            gue = apply_clip(gue, search_clip(gue, flat(mlp_in), G, zp), G)
            dne = apply_clip(dne, search_clip(dne, flat(dn_in), G, zp), G)
        new_gu.append(gue)
        new_dn.append(dne)
    gu = jnp.stack(new_gu)
    dn = jnp.stack(new_dn)

    # shared-expert down scale (its own group: up half /= s, down rows *= s)
    if sgu is not None:
        Fs = sgu.shape[-1] // 2
        z = mlp_in @ sgu.astype(mlp_in.dtype)
        gate, up = jnp.split(z, 2, axis=-1)
        sdn_in = _act(gate, cfg) * up
        s_sdn = search_scale(
            flat(sdn_in), [sdn],
            loss_forward=lambda ws: sdn_in @ ws[0].astype(sdn_in.dtype),
            group_size=G, zero_point=zp,
        )
        sgu = sgu.at[:, Fs:].divide(s_sdn[None, :].astype(sgu.dtype))
        sdn = (sdn.astype(jnp.float32) * s_sdn[:, None]).astype(sdn.dtype)
        sdn_in = sdn_in / s_sdn.astype(sdn_in.dtype)
        if apply_clips:
            sgu = apply_clip(sgu, search_clip(sgu, flat(mlp_in), G, zp), G)
            sdn = apply_clip(sdn, search_clip(sdn, flat(sdn_in), G, zp), G)

    scaled = MoEParams(
        moe.router, Linear(gu), Linear(dn),
        shared_gate_up=None if sgu is None else Linear(sgu),
        shared_down=None if sdn is None else Linear(sdn),
        score_bias=moe.score_bias,
        shared_gate=moe.shared_gate,  # [D, 1] sigmoid gate — stays float
    )
    mlp_out = moe_forward(scaled, cfg, mlp_in)

    # quantize+pack stacked experts
    def pack_stacked(w):
        qls = [QuantLinear.from_float(w[e], None, G, zp) for e in range(E)]
        return QuantLinear(
            qweight=jnp.stack([l.qweight for l in qls]),
            scales=jnp.stack([l.scales for l in qls]),
            zeros_x_scales=jnp.stack([l.zeros_x_scales for l in qls]),
            bias=None,
            group_size=G,
        )

    packed = MoEParams(
        router=moe.router,
        gate_up_proj=(
            Linear(gu) if "gate_up" in skip else pack_stacked(gu)
        ),
        down_proj=Linear(dn) if "down" in skip else pack_stacked(dn),
        shared_gate_up=(
            None if sgu is None else (
                Linear(sgu) if "gate_up" in skip
                else QuantLinear.from_float(sgu, None, G, zp)
            )
        ),
        shared_down=(
            None if sdn is None else (
                Linear(sdn) if "down" in skip
                else QuantLinear.from_float(sdn, None, G, zp)
            )
        ),
        score_bias=moe.score_bias,
        shared_gate=moe.shared_gate,
    )
    return packed, mlp_out, mlp_norm


def awq_quantize_mla_block(
    blk: BlockParams,
    cfg: ModelConfig,
    x: jax.Array,
    positions: jax.Array,
    rope_cos: jax.Array,
    rope_sin: jax.Array,
    qcfg: QuantConfig,
    apply_clips: bool = True,
    skip: frozenset = frozenset(),
) -> AwqBlockResult:
    """AWQ for a deepseek MLA block. The attention projections get every
    scale fold the absorbed path (modules/mla.py) exposes — each measured
    material on a v2-lite-shaped outlier model (tools/mla_rtn_kl.py):

    - attn_norm -> (q(_a), kv_a): the standard ln->fcs rule (reference
      scale.py:71-98) — both consume the same normed input.
    - q_a_norm -> q_b (q-LoRA models): ln->fc again.
    - kv_b's W_UV columns -> o: the v->o fc->fc rule (reference
      scale.py:100-117) — kv_b stays FLOAT (absorbed einsum operand), so
      dividing its v-section output channels costs nothing numerically.

    Clip search stays off for q/kv projections (the reference's
    avoid-clipping rule for q/k, quantizer.py:287: per-group output MSE
    misses rope phase error) but ON for o (its pre-projection input is
    exposed via return_pre_o). The MLP (dense or MoE) gets the full AWQ
    scale+clip search, exactly like awq_quantize_block."""
    from quick_tpu.modules.mla import MLAParams, mla_attention_forward

    G, zp = qcfg.q_group_size, qcfg.zero_point
    flat = lambda a: a.reshape(-1, a.shape[-1])

    def norm_fwd(h, w, b):
        if cfg.layernorm == "rmsnorm":
            return rms_norm(h, w, cfg.rms_norm_eps)
        return layer_norm(h, w, b, cfg.rms_norm_eps)

    attn_in = norm_fwd(x, blk.attn_norm, blk.attn_norm_bias)
    a = blk.attn
    hq, dn, dv = cfg.num_attention_heads, cfg.qk_nope_head_dim, cfg.v_head_dim

    # attention output for the residual stream comes from the FLOAT weights
    # (the packed weights' error is what PPL measures downstream); the scale
    # folds below are exact rewrites of the same function
    attn_out, _ = mla_attention_forward(
        a, cfg, attn_in, rope_cos, rope_sin, None, 0, positions
    )
    x_mid = x + attn_out

    attn_norm = blk.attn_norm.astype(jnp.float32)
    attn_norm_bias = (
        None if blk.attn_norm_bias is None
        else blk.attn_norm_bias.astype(jnp.float32)
    )
    q_w = a.q_proj.weight.astype(jnp.float32)
    kva_w = a.kv_a_proj.weight.astype(jnp.float32)
    qb_w = None if a.q_b_proj is None else a.q_b_proj.weight.astype(jnp.float32)
    kvb_w = a.kv_b_proj.weight.astype(jnp.float32)
    o_w = a.o_proj.weight.astype(jnp.float32)
    q_a_norm = None if a.q_a_norm is None else a.q_a_norm.astype(jnp.float32)

    def attn_fwd(qw, kvaw, qbw, kvbw, h, pre_o):
        a2 = dataclasses.replace(
            a,
            q_proj=dataclasses.replace(a.q_proj, weight=qw.astype(x.dtype)),
            kv_a_proj=dataclasses.replace(
                a.kv_a_proj, weight=kvaw.astype(x.dtype)
            ),
            q_b_proj=(
                None if qbw is None
                else dataclasses.replace(a.q_b_proj, weight=qbw.astype(x.dtype))
            ),
            kv_b_proj=dataclasses.replace(
                a.kv_b_proj, weight=kvbw.astype(a.kv_b_proj.weight.dtype)
            ),
        )
        return mla_attention_forward(
            a2, cfg, h, rope_cos, rope_sin, None, 0, positions,
            return_pre_o=pre_o,
        )[0]

    if "qkv" not in skip:
        # -- attn_norm -> (q(_a), kv_a) fold --------------------------------
        s1 = search_scale(
            flat(attn_in), [q_w, kva_w],
            loss_forward=lambda ws: attn_fwd(
                ws[0], ws[1], qb_w, kvb_w, attn_in, False
            ),
            group_size=G, zero_point=zp,
        )
        attn_norm = attn_norm / s1
        if attn_norm_bias is not None:
            attn_norm_bias = attn_norm_bias / s1
        q_w = q_w * s1[:, None]
        kva_w = kva_w * s1[:, None]
        attn_in = attn_in / s1.astype(attn_in.dtype)

        if qb_w is not None:
            # -- q_a_norm -> q_b fold ---------------------------------------
            qb_in = rms_norm(
                (attn_in.astype(jnp.float32) @ q_w).astype(attn_in.dtype),
                q_a_norm, cfg.rms_norm_eps,
            )
            s2 = search_scale(
                flat(qb_in), [qb_w],
                loss_forward=lambda ws: attn_fwd(
                    q_w, kva_w, ws[0], kvb_w, attn_in, False
                ),
                group_size=G, zero_point=zp,
            )
            q_a_norm = q_a_norm / s2
            qb_w = qb_w * s2[:, None]

    if "o" not in skip:
        # -- kv_b W_UV columns -> o fold + o clip ---------------------------
        pre_o = attn_fwd(q_w, kva_w, qb_w, kvb_w, attn_in, True)
        s3 = search_scale(
            flat(pre_o), [o_w],
            loss_forward=lambda ws: flat(pre_o) @ ws[0].astype(pre_o.dtype),
            group_size=G, zero_point=zp,
        )
        # kv_b columns are head-major [dn | dv] sections; divide the v
        # section of head h by s3[h*dv:(h+1)*dv]
        kvb3 = kvb_w.reshape(-1, hq, dn + dv)
        kvb3 = kvb3.at[:, :, dn:].divide(s3.reshape(hq, dv)[None])
        kvb_w = kvb3.reshape(kvb_w.shape)
        o_w = o_w * s3[:, None]
        if apply_clips:
            pre_o = pre_o / s3.astype(pre_o.dtype)
            o_w = apply_clip(o_w, search_clip(o_w, flat(pre_o), G, zp), G)

    def pack_lin(w, lin, name):
        if lin is None:
            return None
        if name in skip:
            return lin
        return QuantLinear.from_float(w.astype(lin.weight.dtype), lin.bias, G, zp)

    new_attn = MLAParams(
        q_proj=pack_lin(q_w, a.q_proj, "qkv"),
        kv_a_proj=pack_lin(kva_w, a.kv_a_proj, "qkv"),
        kv_a_norm=a.kv_a_norm,
        kv_b_proj=dataclasses.replace(
            a.kv_b_proj, weight=kvb_w.astype(a.kv_b_proj.weight.dtype)
        ),  # float: absorbed einsum operand (holds the 1/s3 fold)
        o_proj=pack_lin(o_w, a.o_proj, "o"),
        q_b_proj=pack_lin(qb_w, a.q_b_proj, "qkv") if qb_w is not None
        else a.q_b_proj,
        q_a_norm=(
            None if q_a_norm is None
            else q_a_norm.astype(blk.attn.q_a_norm.dtype)
        ),
    )

    mlp_norm = blk.mlp_norm.astype(jnp.float32)
    mlp_in = norm_fwd(x_mid, blk.mlp_norm, blk.mlp_norm_bias)
    if isinstance(blk.mlp, MoEParams):
        new_mlp, mlp_out, mlp_norm = _awq_moe(
            blk.mlp, cfg, mlp_in, mlp_norm, qcfg, apply_clips, skip=skip
        )
    else:
        new_mlp, mlp_out, mlp_norm = _awq_mlp(
            blk.mlp, cfg, mlp_in, mlp_norm, qcfg, apply_clips
        )

        def pack(name, lin):
            if name in skip:
                return lin
            return QuantLinear.from_float(lin.weight, lin.bias, G, zp)

        new_mlp = MLPParams(
            gate_up_proj=pack("gate_up", new_mlp.gate_up_proj),
            down_proj=pack("down", new_mlp.down_proj),
            act_scale=new_mlp.act_scale,
        )
    x_next = x_mid + mlp_out
    new_block = BlockParams(
        attn_norm=attn_norm.astype(blk.attn_norm.dtype),  # holds the 1/s1 fold
        attn=new_attn,
        mlp_norm=mlp_norm.astype(blk.mlp_norm.dtype),
        mlp=new_mlp,
        attn_norm_bias=(
            None if attn_norm_bias is None
            else attn_norm_bias.astype(blk.attn_norm_bias.dtype)
        ),
        mlp_norm_bias=blk.mlp_norm_bias,
    )
    return AwqBlockResult(block=new_block, x_next=x_next)


# ---------------------------------------------------------------------------
# Model-level pipeline
# ---------------------------------------------------------------------------

def awq_quantize_model(
    params,  # float ModelParams
    cfg: ModelConfig,
    calib_tokens: jax.Array,  # [B, S]
    qcfg: Optional[QuantConfig] = None,
    apply_clips: bool = True,
    verbose: bool = True,
) -> "ModelParams":
    """Full AWQ pipeline: per-block scale/clip search + quantize + pack
    (the analog of BaseAWQForCausalLM.quantize, reference models/base.py:91)."""
    from quick_tpu.models.model import ModelParams  # noqa: F401

    from quick_tpu.models.model import canonical_skips
    from quick_tpu.ops.norms import layer_norm

    qcfg = qcfg or QuantConfig()
    skip = canonical_skips(qcfg.modules_to_not_convert)
    B, S = calib_tokens.shape
    positions = jnp.broadcast_to(jnp.arange(S)[None, :], (B, S))
    x = params.embed[calib_tokens].astype(jnp.bfloat16)
    # mirror model_forward's embedding path (gemma sqrt(D) scale, granite/
    # minicpm multiplier, opt/bigcode positions, bloom embedding layernorm)
    # so calibration activations are faithful
    if cfg.embed_scale:
        x = x * jnp.asarray(cfg.hidden_size ** 0.5).astype(x.dtype)
    if cfg.embed_multiplier is not None:
        x = x * jnp.asarray(cfg.embed_multiplier, x.dtype)
    if params.pos_embed is not None:
        x = x + params.pos_embed[positions].astype(x.dtype)
    if params.embed_norm is not None:
        x = layer_norm(
            x, params.embed_norm, params.embed_norm_bias, cfg.rms_norm_eps
        )
    # One jitted program covers the whole per-block search+pack: 20-point
    # scale grids, clip grids, and packing all trace into a single XLA
    # executable, compiled once and reused for every same-shaped block.
    # (Eager execution would be thousands of dispatches per block — the
    # reference's torch version has the same hot loop, quantizer.py:87-146.)
    import functools

    @functools.lru_cache(maxsize=None)
    def _jitted(mla: bool, sliding: bool):
        fn = awq_quantize_mla_block if mla else awq_quantize_block

        def run(blk, x, positions, rc, rs):
            kw = {} if mla else {"sliding": sliding}
            res = fn(
                blk, cfg, x, positions, rc, rs, qcfg, apply_clips,
                skip=skip, **kw,
            )
            return res.block, res.x_next

        return jax.jit(run)

    use_local = params.rope_cos_local is not None
    new_blocks = []
    for i, blk in enumerate(params.blocks):
        sl = cfg.layer_is_sliding(i)
        # gemma3: sliding layers rope with the LOCAL theta tables — the
        # calibration forward must match model_forward's per-layer choice
        rc = params.rope_cos_local if (use_local and sl) else params.rope_cos
        rs = params.rope_sin_local if (use_local and sl) else params.rope_sin
        new_blk, x = _jitted(cfg.is_mla, sl)(blk, x, positions, rc, rs)
        new_blocks.append(new_blk)
        if verbose:
            print(f"[awq] block {i + 1}/{len(params.blocks)} quantized", flush=True)
    lm_head = params.lm_head
    if qcfg.quantize_lm_head and not isinstance(lm_head, QuantLinear):
        # RTN pack (no scale search: the head has no downstream op to fold
        # a scale out of, and its input is the final-norm output). Measured
        # dNLL ~ +0.006 (see QuantConfig.quantize_lm_head).
        lm_head = QuantLinear.from_float(
            lm_head.weight, lm_head.bias, qcfg.q_group_size, qcfg.zero_point
        )
    return dataclasses.replace(params, blocks=new_blocks, lm_head=lm_head)
