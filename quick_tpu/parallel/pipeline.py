"""Pipeline parallelism: GPipe-style staged forward over a ``pipe`` mesh axis.

The reference's only cross-device execution is accelerate's sequential
layer placement — activations hop devices one layer at a time with NO
overlap (SURVEY.md section 2.3: "a degenerate, non-pipelined pipeline").
This module is the real thing, TPU-native: decoder layers are stacked into
a leading-axis pytree and sharded over the ``pipe`` mesh axis, and a
microbatched schedule keeps all stages busy — stage s processes microbatch
``t - s`` at step ``t``, activations move between neighbor stages with
``lax.ppermute`` over ICI, and each stage runs its local layers with one
``lax.scan``.

Two entry points:
- ``pipeline_forward_fn`` — batch forward / prefill scoring.
- ``pipeline_generate_fn`` — greedy GENERATION under PP: per-stage KV
  caches, a continuously-full decode schedule (with n_micro >= n_stages
  every stage works a different microbatch's token every step — no
  per-token bubble), and sampled tokens ride a ppermute ring from the last
  stage back to stage 0 in time for their microbatch's next turn.

For latency-critical serving TP (+DP) remains the first choice
(quick_tpu/parallel/sharding.py); PP generation is the fit when a model's
layers exceed one chip and TP's collective latency dominates.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from quick_tpu.config import ModelConfig
from quick_tpu.ops.norms import layer_norm, rms_norm

# NOTE: quick_tpu.modules.blocks imports quick_tpu.parallel.context, which
# executes this package's __init__ — so blocks must be imported lazily here
# to avoid a cycle. "BlockParams" below is a forward reference.

PIPE_AXIS = "pipe"


def create_pipe_mesh(n_stages: int, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if n_stages > len(devices):
        raise ValueError(f"need {n_stages} devices, have {len(devices)}")
    return Mesh(np.asarray(devices[:n_stages]), (PIPE_AXIS,))


def stack_blocks(blocks) -> "BlockParams":
    """[BlockParams, ...] -> one BlockParams pytree with a leading layer
    axis on every leaf (requires a homogeneous block structure)."""
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *blocks)


def shard_stacked_blocks(stacked: "BlockParams", mesh: Mesh) -> "BlockParams":
    """Place each stage's layer slice on its pipe device."""
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(
            x, NamedSharding(mesh, P(PIPE_AXIS, *([None] * (x.ndim - 1))))
        ),
        stacked,
    )


def pipeline_forward_fn(cfg: ModelConfig, mesh: Mesh, n_micro: int):
    """Build a jitted pipelined forward:

        fn(params, stacked_blocks, tokens [B, S]) -> logits [B, S, V]

    ``params`` carries embed/final_norm/lm_head/rope tables (replicated);
    ``stacked_blocks`` (from stack_blocks) is sharded over PIPE_AXIS with a
    layer count divisible by the stage count. B must be divisible by
    n_micro."""
    from quick_tpu.modules.blocks import block_forward

    if cfg.rope_local_theta is not None or (
        cfg.sliding_window is not None and cfg.sliding_window_pattern
    ):
        # the stage body is a homogeneous lax.scan over stacked layers —
        # per-layer attention types (gemma2/3 alternating window, dual
        # rope) can't ride it; uniform sliding (mistral) is fine
        raise NotImplementedError(
            "pipeline_forward_fn requires homogeneous layers "
            "(no alternating sliding-window pattern / dual rope)"
        )
    n_stages = mesh.shape[PIPE_AXIS]

    def pipelined(embed, rope_cos, rope_sin, stacked_local, tokens):
        """Under shard_map: tokens [M, mb, S] replicated; stacked_local =
        this stage's layer slice. Returns [M, mb, S, D] hidden states
        (valid on the last stage, psum-replicated)."""
        stage = jax.lax.axis_index(PIPE_AXIS)
        M, mb, S = tokens.shape
        D = embed.shape[1]
        positions = jnp.broadcast_to(jnp.arange(S)[None], (mb, S))

        def run_stage(x):
            def body(h, blk):
                h, _ = block_forward(
                    blk, cfg, h, rope_cos, rope_sin, None, 0, positions
                )
                return h, None

            h, _ = jax.lax.scan(body, x, stacked_local)
            return h

        perm = [(i, i + 1) for i in range(n_stages - 1)]
        y0 = jnp.zeros((mb, S, D), jnp.bfloat16)
        outs0 = jnp.zeros((M, mb, S, D), jnp.bfloat16)

        def step(t, carry):
            y_prev, outs = carry
            x_in = jax.lax.ppermute(y_prev, PIPE_AXIS, perm)
            mb_idx = t - stage
            src = jnp.where(
                stage == 0,
                embed[tokens[jnp.clip(t, 0, M - 1)]].astype(jnp.bfloat16),
                x_in,
            )
            active = jnp.logical_and(mb_idx >= 0, mb_idx < M)
            y = run_stage(src)
            y_prev = jnp.where(active, y, y_prev)
            # the last stage records its finished microbatch
            slot = jnp.clip(mb_idx, 0, M - 1)
            record = jnp.logical_and(active, stage == n_stages - 1)
            outs = jax.lax.dynamic_update_slice(
                outs,
                jnp.where(record, y, outs[slot])[None],
                (slot, 0, 0, 0),
            )
            return y_prev, outs

        _, outs = jax.lax.fori_loop(0, M + n_stages - 1, step, (y0, outs0))
        outs = jnp.where(stage == n_stages - 1, outs, 0).astype(jnp.float32)
        return jax.lax.psum(outs, PIPE_AXIS)

    smapped = shard_map(
        pipelined,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(PIPE_AXIS), P()),
        out_specs=P(),
        check_vma=False,
    )

    @jax.jit
    def fn(params, stacked_blocks, tokens):
        B, S = tokens.shape
        if B % n_micro:
            raise ValueError(f"batch {B} not divisible by n_micro {n_micro}")
        mb = B // n_micro
        toks = tokens.reshape(n_micro, mb, S)
        hidden = smapped(
            params.embed, params.rope_cos, params.rope_sin,
            stacked_blocks, toks,
        )  # [M, mb, S, D] f32
        x = hidden.reshape(B, S, -1).astype(jnp.bfloat16)
        if cfg.layernorm == "rmsnorm":
            x = rms_norm(x, params.final_norm, cfg.rms_norm_eps)
        else:
            x = layer_norm(
                x, params.final_norm, params.final_norm_bias, cfg.rms_norm_eps
            )
        return params.lm_head(x).astype(jnp.float32)

    return fn


def pipeline_generate_fn(
    cfg: ModelConfig, mesh: Mesh, n_micro: int, max_new_tokens: int
):
    """Build a jitted pipelined greedy generator:

        fn(params, stacked_blocks, tokens [B, S]) -> [B, max_new_tokens]

    ``params`` carries embed/final_norm/lm_head/rope (replicated);
    ``stacked_blocks`` is the PIPE-sharded layer stack (shard_stacked_blocks).
    Requires n_micro >= n_stages (the sampled token must complete its ring
    trip from the last stage back to stage 0 before its microbatch's next
    turn — with fewer microbatches the pipeline would stall on feedback),
    uniform prompt length (pad externally) and homogeneous layers.
    """
    from quick_tpu.modules.blocks import block_forward
    from quick_tpu.modules.cache import KVCache

    if cfg.rope_local_theta is not None or (
        cfg.sliding_window is not None and cfg.sliding_window_pattern
    ):
        raise NotImplementedError(
            "pipeline_generate_fn requires homogeneous layers"
        )
    n_stages = mesh.shape[PIPE_AXIS]
    if n_micro < n_stages:
        raise ValueError(
            f"n_micro ({n_micro}) must be >= n_stages ({n_stages}) for a "
            "bubble-free token-feedback schedule"
        )
    T = max_new_tokens

    def pipelined(params, stacked_local, tokens):
        from quick_tpu.ops.norms import layer_norm as _ln, rms_norm as _rms

        stage = jax.lax.axis_index(PIPE_AXIS)
        M, mb, S = tokens.shape
        D = params.embed.shape[1]
        hkv, hd = cfg.num_key_value_heads, cfg.head_dim
        L_local = jax.tree_util.tree_leaves(stacked_local)[0].shape[0]
        Smax = S + T
        perm_fwd = [(i, i + 1) for i in range(n_stages - 1)]
        perm_ring = [(n_stages - 1, 0)]

        def head(h_last):
            """last hidden row [mb, D] -> greedy token [mb]."""
            if cfg.layernorm == "rmsnorm":
                x = _rms(h_last, params.final_norm, cfg.rms_norm_eps)
            else:
                x = _ln(h_last, params.final_norm, params.final_norm_bias,
                        cfg.rms_norm_eps)
            return jnp.argmax(
                params.lm_head(x).astype(jnp.float32), axis=-1
            ).astype(jnp.int32)

        def run_stage(x, ck_m, cv_m, start, positions):
            cache = KVCache(k=ck_m, v=cv_m, length=start)

            def body(carry, xs):
                h, cache = carry
                blk, i = xs
                h, cache = block_forward(
                    blk, cfg, h, params.rope_cos, params.rope_sin,
                    cache, i, positions,
                )
                return (h, cache), None

            (h, cache), _ = jax.lax.scan(
                body, (x, cache),
                (stacked_local, jnp.arange(L_local)),
            )
            return h, cache.k, cache.v

        ck0 = jnp.zeros((L_local, M, mb, hkv, Smax, hd), jnp.bfloat16)
        cv0 = jnp.zeros_like(ck0)

        # ---- pipelined prefill (cache-writing variant of the forward) ----
        pos_p = jnp.broadcast_to(jnp.arange(S)[None], (mb, S))

        def prefill_step(t, carry):
            y_prev, ck, cv, outs = carry
            x_in = jax.lax.ppermute(y_prev, PIPE_AXIS, perm_fwd)
            mb_idx = t - stage
            m = jnp.clip(mb_idx, 0, M - 1)
            src = jnp.where(
                stage == 0,
                params.embed[tokens[jnp.clip(t, 0, M - 1)]].astype(jnp.bfloat16),
                x_in,
            )
            active = jnp.logical_and(mb_idx >= 0, mb_idx < M)
            ck_m = jax.lax.dynamic_index_in_dim(ck, m, 1, keepdims=False)
            cv_m = jax.lax.dynamic_index_in_dim(cv, m, 1, keepdims=False)
            y, ck_m2, cv_m2 = run_stage(
                src, ck_m, cv_m, jnp.zeros((), jnp.int32), pos_p
            )
            y_prev = jnp.where(active, y, y_prev)
            ck = jax.lax.dynamic_update_index_in_dim(
                ck, jnp.where(active, ck_m2, ck_m), m, 1
            )
            cv = jax.lax.dynamic_update_index_in_dim(
                cv, jnp.where(active, cv_m2, cv_m), m, 1
            )
            record = jnp.logical_and(active, stage == n_stages - 1)
            outs = jax.lax.dynamic_update_slice(
                outs, jnp.where(record, y[:, -1], outs[m])[None], (m, 0, 0)
            )
            return y_prev, ck, cv, outs

        y0 = jnp.zeros((mb, S, D), jnp.bfloat16)
        h_last0 = jnp.zeros((M, mb, D), jnp.bfloat16)
        _, ck, cv, h_last = jax.lax.fori_loop(
            0, M + n_stages - 1, prefill_step, (y0, ck0, cv0, h_last0)
        )
        # first sampled token per microbatch, broadcast from the last stage
        tok0 = jnp.where(
            stage == n_stages - 1,
            jax.vmap(head)(h_last),
            0,
        )
        tok_buf = jax.lax.psum(tok0, PIPE_AXIS)  # [M, mb]

        # ---- continuously-full decode -----------------------------------
        # output[0] is the prefill argmax; the decode loop produces
        # output[1..T-1] (input token g -> output token g+1)
        Tdec = T - 1

        def decode_step(t, carry):
            tok_buf, y_prev, ck, cv, outs = carry
            x_in = jax.lax.ppermute(y_prev, PIPE_AXIS, perm_fwd)
            m_here = (t - stage) % M
            g_here = (t - stage) // M  # input-token index this stage works on
            active = jnp.logical_and(t >= stage, g_here < Tdec)
            start = S + g_here
            src = jnp.where(
                stage == 0,
                params.embed[tok_buf[(t % M)]].astype(jnp.bfloat16)[:, None, :],
                x_in,
            )
            pos = jnp.broadcast_to(
                jnp.asarray(start, jnp.int32)[None, None], (mb, 1)
            )
            ck_m = jax.lax.dynamic_index_in_dim(ck, m_here, 1, keepdims=False)
            cv_m = jax.lax.dynamic_index_in_dim(cv, m_here, 1, keepdims=False)
            y, ck_m2, cv_m2 = run_stage(src, ck_m, cv_m, start, pos)
            y_prev = jnp.where(active, y, y_prev)
            ck = jax.lax.dynamic_update_index_in_dim(
                ck, jnp.where(active, ck_m2, ck_m), m_here, 1
            )
            cv = jax.lax.dynamic_update_index_in_dim(
                cv, jnp.where(active, cv_m2, cv_m), m_here, 1
            )
            # last stage: sample, record, and ring the token back to stage 0
            is_last = stage == n_stages - 1
            tok = head(y[:, 0])
            tok_msg = jax.lax.ppermute(tok, PIPE_AXIS, perm_ring)
            m_last = (t - (n_stages - 1)) % M
            # the last stage consumed input token g -> produced output g+1
            g_last = jnp.clip((t - (n_stages - 1)) // M + 1, 0, T - 1)
            last_live = jnp.logical_and(
                t >= n_stages - 1, (t - (n_stages - 1)) // M < Tdec
            )
            row = jax.lax.dynamic_index_in_dim(
                outs, m_last, 0, keepdims=False
            )  # [mb, T]
            row2 = jax.lax.dynamic_update_slice(row, tok[:, None], (0, g_last))
            outs = jax.lax.dynamic_update_index_in_dim(
                outs,
                jnp.where(jnp.logical_and(last_live, is_last), row2, row),
                m_last, 0,
            )
            # stage 0 stores the ring-delivered token for m_last's next turn
            tok_buf = jnp.where(
                jnp.logical_and(stage == 0, last_live),
                tok_buf.at[m_last].set(tok_msg),
                tok_buf,
            )
            return tok_buf, y_prev, ck, cv, outs

        outs0 = jnp.zeros((M, mb, T), jnp.int32).at[:, :, 0].set(tok_buf)
        yd0 = jnp.zeros((mb, 1, D), jnp.bfloat16)
        n_steps = M * Tdec + (n_stages - 1)
        _, _, _, _, outs = jax.lax.fori_loop(
            0, n_steps, decode_step, (tok_buf, yd0, ck, cv, outs0)
        )
        outs = jnp.where(stage == n_stages - 1, outs, 0)
        return jax.lax.psum(outs, PIPE_AXIS)

    smapped = shard_map(
        pipelined,
        mesh=mesh,
        in_specs=(P(), P(PIPE_AXIS), P()),
        out_specs=P(),
        check_vma=False,
    )

    @jax.jit
    def fn(params, stacked_blocks, tokens):
        B, S = tokens.shape
        if B % n_micro:
            raise ValueError(f"batch {B} not divisible by n_micro {n_micro}")
        mb = B // n_micro
        toks = tokens.reshape(n_micro, mb, S)
        outs = smapped(params, stacked_blocks, toks)  # [M, mb, T]
        return outs.reshape(B, T)

    return fn
