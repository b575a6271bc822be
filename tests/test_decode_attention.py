"""Chunked dense-decode kernel vs the einsum path (interpret mode)."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quick_tpu.ops.alibi import alibi_slopes
from quick_tpu.ops.attention import decode_attention
from quick_tpu.ops.decode_attention import (
    dense_decode_attention, _pick_tiles, supports,
)


def _setup(rng, B, Hq, Hkv, T, D):
    q = jnp.asarray(rng.standard_normal((B, 1, Hq, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, Hkv, T, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, Hkv, T, D)), jnp.float32)
    return q, k, v


@pytest.mark.parametrize(
    "B,Hq,Hkv,T,D,nb,c,lengths",
    [
        (4, 8, 2, 64, 64, 2, 16, [13, 64, 1, 27]),   # GQA, ragged, multi-chunk
        (2, 4, 4, 32, 64, 2, 32, [32, 5]),           # MHA, single chunk
        (1, 4, 1, 48, 32, 1, 8, [39]),               # MQA
        (8, 8, 2, 64, 64, 8, 64, [9, 17, 33, 64, 2, 50, 21, 40]),  # fat nb
    ],
)
def test_dense_decode_matches_einsum(rng, B, Hq, Hkv, T, D, nb, c, lengths):
    q, k, v = _setup(rng, B, Hq, Hkv, T, D)
    ln = jnp.asarray(lengths, jnp.int32)
    out = dense_decode_attention(q, k, v, ln, nb=nb, c=c, interpret=True)
    ref = decode_attention(q, k, v, ln, kv_heads_major=True)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=2e-3
    )


def test_dense_decode_alibi(rng):
    B, Hq, Hkv, T, D = 2, 4, 2, 32, 32
    q, k, v = _setup(rng, B, Hq, Hkv, T, D)
    ln = jnp.asarray([19, 30], jnp.int32)
    sl = jnp.asarray(alibi_slopes(Hq))
    out = dense_decode_attention(
        q, k, v, ln, alibi_slopes=sl, nb=2, c=16, interpret=True
    )
    ref = decode_attention(q, k, v, ln, alibi_slopes=sl, kv_heads_major=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-3)


def test_dense_decode_softcap(rng):
    """Gemma2-class logit softcap rides the dense decode kernel (one VPU
    tanh on the scaled scores, same order as ops/attention.py)."""
    from quick_tpu.ops.attention import causal_attention

    B, Hq, Hkv, T, D = 2, 4, 2, 32, 32
    q, k, v = _setup(rng, B, Hq, Hkv, T, D)
    ln = jnp.asarray([19, 30], jnp.int32)
    out = dense_decode_attention(
        q, k, v, ln, logit_softcap=5.0, nb=2, c=16, interpret=True
    )
    ref = causal_attention(
        q, k, v, q_offset=ln - 1, kv_len=ln, kv_heads_major=True,
        logit_softcap=5.0,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-3)


def test_dense_decode_autopick(rng):
    """nb/c auto-selection path + scalar length broadcast."""
    B, Hq, Hkv, T, D = 4, 8, 2, 128, 64
    q, k, v = _setup(rng, B, Hq, Hkv, T, D)
    out = dense_decode_attention(q, k, v, jnp.int32(77), interpret=True)
    ref = decode_attention(q, k, v, jnp.int32(77), kv_heads_major=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-3)


def test_pick_tiles_budget():
    # 7B decode shapes: wants fat steps within the VMEM budget
    nb, c = _pick_tiles(64, 8, 256, 128)
    assert c in (128, 256) and nb * c <= 2048 and 64 % nb == 0
    # odd T with no pow2 chunk divisor <= 256: chunk = a divisor or refuse
    assert supports(4, 8, 2, 64, 64)
    assert not supports(4, 7, 2, 64, 64)  # Hq % Hkv != 0


def test_model_decode_with_dense_kernel(rng):
    """model_forward decode must produce identical logits with the dense
    kernel forced on (interpret) vs the einsum baseline."""
    from quick_tpu import ModelConfig
    from quick_tpu.models import init_float_params
    from quick_tpu.models.model import model_forward
    from quick_tpu.runtime import make_cache

    cfg = ModelConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64,
    )
    params = init_float_params(cfg, jax.random.PRNGKey(0))
    prompt = jnp.asarray(rng.integers(3, 120, (2, 9)), jnp.int32)
    tok = jnp.asarray(rng.integers(3, 120, (2, 1)), jnp.int32)

    def run(env):
        os.environ["QUICK_TPU_DENSE_KERNEL"] = env
        try:
            cache = make_cache(cfg, 2, 64)
            logits, cache = model_forward(params, cfg, prompt, cache)
            cache = cache.with_length(jnp.int32(prompt.shape[1]))
            logits2, _ = model_forward(params, cfg, tok, cache)
            return np.asarray(logits2)
        finally:
            os.environ.pop("QUICK_TPU_DENSE_KERNEL", None)

    # the kernel rounds probabilities to bf16 before the PV dot (like every
    # flash implementation); the einsum baseline keeps f32 probs — a few
    # 1e-2 on bf16-model logits is expected rounding, not a logic bug
    np.testing.assert_allclose(run("1"), run("0"), atol=6e-2)


def test_fused_decode_step_matches_unfused(monkeypatch):
    """The fused rope+cache-write+attention kernel
    (ops/fused_decode_step.py) must reproduce the unfused decode path
    exactly: same logits stream, same cache contents."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from quick_tpu import ModelConfig
    from quick_tpu.models import init_float_params, model_forward
    from quick_tpu.runtime import make_cache

    cfg = ModelConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64,
    )
    params = init_float_params(cfg, jax.random.PRNGKey(0), jnp.float32)
    toks = jax.random.randint(jax.random.PRNGKey(1), (2, 10), 0, 128)

    def run(env):
        monkeypatch.setenv("QUICK_TPU_FUSED_STEP", env)
        cache = make_cache(cfg, 2, 16, dtype=jnp.float32)
        logits, cache = model_forward(params, cfg, toks[:, :6], cache)
        outs = [logits[:, -1]]
        for t in range(6, 10):
            lg, cache = model_forward(params, cfg, toks[:, t : t + 1], cache)
            outs.append(lg[:, 0])
        return np.asarray(jnp.stack(outs, 1)), np.asarray(cache.k)

    ref, kref = run("0")
    out, kout = run("1")
    np.testing.assert_allclose(out, ref, atol=2e-4, rtol=2e-4)
    np.testing.assert_allclose(kout, kref, atol=2e-4, rtol=2e-4)


def test_fused_decode_step_alibi_no_rope(monkeypatch):
    """Bloom/mpt-class models (ALiBi, no rope) ride the fused decode-step
    kernel: fused vs unfused logits + cache identical."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from quick_tpu import ModelConfig
    from quick_tpu.models import init_float_params, model_forward
    from quick_tpu.runtime import make_cache

    cfg = ModelConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        max_position_embeddings=64, use_alibi=True, use_rope=False,
        layernorm="layernorm", act_fn="gelu", gated_mlp=False,
    )
    params = init_float_params(cfg, jax.random.PRNGKey(0), jnp.float32)
    toks = jax.random.randint(jax.random.PRNGKey(1), (2, 10), 0, 128)

    def run(env):
        monkeypatch.setenv("QUICK_TPU_FUSED_STEP", env)
        cache = make_cache(cfg, 2, 16, dtype=jnp.float32)
        logits, cache = model_forward(params, cfg, toks[:, :6], cache)
        outs = [logits[:, -1]]
        for t in range(6, 10):
            lg, cache = model_forward(params, cfg, toks[:, t : t + 1], cache)
            outs.append(lg[:, 0])
        return np.asarray(jnp.stack(outs, 1)), np.asarray(cache.k)

    ref, kref = run("0")
    out, kout = run("1")
    np.testing.assert_allclose(out, ref, atol=2e-4, rtol=2e-4)
    np.testing.assert_allclose(kout, kref, atol=2e-4, rtol=2e-4)


def test_fused_decode_step_learned_pos(monkeypatch):
    """OPT/gpt_bigcode-class models (learned positions, no rope, no
    alibi) ride the fused decode-step kernel: fused == unfused."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from quick_tpu import ModelConfig
    from quick_tpu.models import init_float_params, model_forward
    from quick_tpu.runtime import make_cache

    cfg = ModelConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        max_position_embeddings=64, use_rope=False, learned_pos=True,
        layernorm="layernorm", act_fn="gelu", gated_mlp=False,
    )
    params = init_float_params(cfg, jax.random.PRNGKey(0), jnp.float32)
    toks = jax.random.randint(jax.random.PRNGKey(1), (2, 10), 0, 128)

    def run(env):
        monkeypatch.setenv("QUICK_TPU_FUSED_STEP", env)
        cache = make_cache(cfg, 2, 16, dtype=jnp.float32)
        logits, cache = model_forward(params, cfg, toks[:, :6], cache)
        outs = [logits[:, -1]]
        for t in range(6, 10):
            lg, cache = model_forward(params, cfg, toks[:, t : t + 1], cache)
            outs.append(lg[:, 0])
        return np.asarray(jnp.stack(outs, 1)), np.asarray(cache.k)

    ref, kref = run("0")
    out, kout = run("1")
    np.testing.assert_allclose(out, ref, atol=2e-4, rtol=2e-4)
    np.testing.assert_allclose(kout, kref, atol=2e-4, rtol=2e-4)


def test_fused_decode_step_softcap(monkeypatch):
    """Softcap (gemma2) models keep the fused decode-step kernel: fused
    vs unfused logits + cache stay identical with attn_logit_softcap set."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from quick_tpu import ModelConfig
    from quick_tpu.models import init_float_params, model_forward
    from quick_tpu.runtime import make_cache

    cfg = ModelConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64, attn_logit_softcap=5.0,
    )
    params = init_float_params(cfg, jax.random.PRNGKey(0), jnp.float32)
    toks = jax.random.randint(jax.random.PRNGKey(1), (2, 10), 0, 128)

    def run(env):
        monkeypatch.setenv("QUICK_TPU_FUSED_STEP", env)
        cache = make_cache(cfg, 2, 16, dtype=jnp.float32)
        logits, cache = model_forward(params, cfg, toks[:, :6], cache)
        outs = [logits[:, -1]]
        for t in range(6, 10):
            lg, cache = model_forward(params, cfg, toks[:, t : t + 1], cache)
            outs.append(lg[:, 0])
        return np.asarray(jnp.stack(outs, 1)), np.asarray(cache.k)

    ref, kref = run("0")
    out, kout = run("1")
    np.testing.assert_allclose(out, ref, atol=2e-4, rtol=2e-4)
    np.testing.assert_allclose(kout, kref, atol=2e-4, rtol=2e-4)
