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

Scope: batch forward / prefill scoring. Decode-time PP has an inherent
per-token bubble; for generation use TP (+DP) instead — see
quick_tpu/parallel/sharding.py.
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
