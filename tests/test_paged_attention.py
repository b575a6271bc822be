"""Paged decode attention kernel vs the gather baseline (interpret mode)."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quick_tpu.ops.alibi import alibi_slopes
from quick_tpu.ops.attention import causal_attention
from quick_tpu.ops.paged_attention import paged_decode_attention


def _setup(rng, B, Hq, Hkv, D, page, n_pages, n_pt, lengths):
    q = jnp.asarray(rng.standard_normal((B, Hq, D)), jnp.float32)
    k_pages = jnp.asarray(
        rng.standard_normal((n_pages, Hkv, page, D)), jnp.float32
    )
    v_pages = jnp.asarray(
        rng.standard_normal((n_pages, Hkv, page, D)), jnp.float32
    )
    # random non-overlapping block tables (page 0 = trash)
    perm = rng.permutation(np.arange(1, n_pages))[: B * n_pt]
    bt = jnp.asarray(perm.reshape(B, n_pt), jnp.int32)
    ln = jnp.asarray(lengths, jnp.int32)
    return q, k_pages, v_pages, bt, ln


def _dense_view(pages, bt):
    g = np.asarray(pages)[np.asarray(bt)]  # [B, n_pt, H, page, D]
    B, H, D = bt.shape[0], g.shape[2], g.shape[-1]
    return jnp.asarray(np.moveaxis(g, 2, 3).reshape(B, -1, H, D))


@pytest.mark.parametrize(
    "B,Hq,Hkv,D,page,lengths",
    [
        (2, 4, 4, 64, 8, [13, 27]),      # MHA, ragged lengths
        (2, 8, 2, 64, 8, [32, 5]),       # GQA; one slot exactly page-aligned
        (1, 4, 1, 32, 4, [1]),           # MQA, single token
    ],
)
def test_paged_matches_gather(rng, B, Hq, Hkv, D, page, lengths):
    n_pt = 4
    q, kp, vp, bt, ln = _setup(
        rng, B, Hq, Hkv, D, page, n_pages=1 + B * n_pt, n_pt=n_pt,
        lengths=lengths,
    )
    out = paged_decode_attention(q, kp, vp, bt, ln, interpret=True)
    k_dense = _dense_view(kp, bt)
    v_dense = _dense_view(vp, bt)
    ref = causal_attention(
        q[:, None], k_dense, v_dense,
        q_offset=ln - 1, kv_len=ln,
    )[:, 0]
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-3)


@pytest.mark.parametrize("spb", [2, 4])
def test_paged_multi_slot_blocks(rng, monkeypatch, spb):
    """spb slots per grid step (QUICK_TPU_SPB) must match the spb=1 path —
    ragged lengths land in different slots of one block."""
    monkeypatch.setenv("QUICK_TPU_SPB", str(spb))
    B, Hq, Hkv, D, page, n_pt = 8, 8, 2, 64, 8, 4
    lengths = [13, 27, 32, 5, 1, 19, 8, 30]
    q, kp, vp, bt, ln = _setup(
        rng, B, Hq, Hkv, D, page, n_pages=1 + B * n_pt, n_pt=n_pt,
        lengths=lengths,
    )
    out = np.asarray(paged_decode_attention(q, kp, vp, bt, ln, interpret=True))
    # QUICK_TPU_SPB is read at TRACE time: drop the cached program so the
    # spb=1 reference actually retraces
    paged_decode_attention._clear_cache()
    monkeypatch.setenv("QUICK_TPU_SPB", "1")
    ref = np.asarray(paged_decode_attention(q, kp, vp, bt, ln, interpret=True))
    paged_decode_attention._clear_cache()
    np.testing.assert_allclose(out, ref, atol=1e-5, rtol=1e-5)


def test_paged_alibi(rng):
    B, Hq, Hkv, D, page, n_pt = 1, 4, 2, 32, 8, 3
    q, kp, vp, bt, ln = _setup(
        rng, B, Hq, Hkv, D, page, n_pages=1 + B * n_pt, n_pt=n_pt,
        lengths=[19],
    )
    sl = jnp.asarray(alibi_slopes(Hq))
    out = paged_decode_attention(q, kp, vp, bt, ln, alibi_slopes=sl,
                                 interpret=True)
    ref = causal_attention(
        q[:, None], _dense_view(kp, bt), _dense_view(vp, bt),
        q_offset=ln - 1, kv_len=ln, alibi_slopes=sl,
    )[:, 0]
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-3)


def test_paged_softcap(rng):
    """Gemma2-class logit softcap rides the paged decode kernel — alone
    and composed with a sliding window (gemma2's alternating layers)."""
    B, Hq, Hkv, D, page, n_pt = 2, 4, 2, 32, 8, 3
    q, kp, vp, bt, ln = _setup(
        rng, B, Hq, Hkv, D, page, n_pages=1 + B * n_pt, n_pt=n_pt,
        lengths=[19, 23],
    )
    for win in (None, 12):
        out = paged_decode_attention(
            q, kp, vp, bt, ln, window=win, logit_softcap=30.0,
            interpret=True,
        )
        ref = causal_attention(
            q[:, None], _dense_view(kp, bt), _dense_view(vp, bt),
            q_offset=ln - 1, kv_len=ln, window=win, logit_softcap=30.0,
        )[:, 0]
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=2e-3
        )


def _shared_tile(ks, vs):
    """Build the shared per-page scale tile [P, 8, Hkv*page] from
    per-(page, head, token) k/v scales: row 0 = k, row 1 = v
    (modules/paged_cache.py layout)."""
    P = ks.shape[0]
    t = jnp.zeros((P, 8, ks.reshape(P, -1).shape[-1]), jnp.float32)
    return t.at[:, 0].set(ks.reshape(P, -1)).at[:, 1].set(vs.reshape(P, -1))


def test_paged_int8_kernel_matches_dequant(rng):
    """INT8 pages + per-token scales through the kernel must match the
    float kernel run on the dequantized pages (output-side scale folding)."""
    B, Hq, Hkv, D, page, n_pt = 2, 8, 2, 64, 8, 4
    q, kp, vp, bt, ln = _setup(
        rng, B, Hq, Hkv, D, page, n_pages=1 + B * n_pt, n_pt=n_pt,
        lengths=[21, 9],
    )
    # quantize the float pages per (page, head, token)
    def quant(p):
        amax = jnp.max(jnp.abs(p), axis=-1)
        sc = jnp.maximum(amax / 127.0, 1e-8)
        codes = jnp.clip(jnp.round(p / sc[..., None]), -127, 127).astype(
            jnp.int8
        )
        return codes, sc.astype(jnp.float32)

    kq, ks = quant(kp)
    vq, vs = quant(vp)
    out = paged_decode_attention(
        q, kq, vq, bt, ln, kv_scales=_shared_tile(ks, vs), interpret=True
    )
    kd = kq.astype(jnp.float32) * ks[..., None]
    vd = vq.astype(jnp.float32) * vs[..., None]
    ref = paged_decode_attention(q, kd, vd, bt, ln, interpret=True)
    # the int8 fast path also quantizes q and the attention probabilities
    # to int8 (int8 x int8 MXU dots — ops/paged_attention.py), adding two
    # ~0.8%-of-rowmax roundings on top of the KV codes' own rounding
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2.5e-2)


def test_engine_with_paged_kernel(rng):
    """The serving engine must produce identical tokens with the paged
    kernel forced on (interpret) vs the gather baseline."""
    from quick_tpu import ModelConfig
    from quick_tpu.models import init_float_params
    from quick_tpu.runtime.serving import Engine

    cfg = ModelConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64,
    )
    params = init_float_params(cfg, jax.random.PRNGKey(0))
    prompt = list(range(3, 17))

    def run(env):
        os.environ["QUICK_TPU_PAGED"] = env
        try:
            eng = Engine(params, cfg, max_slots=2, max_seq=64, page_size=4,
                         chunk=8, dtype=jnp.float32)
            uid = eng.submit(prompt, max_new_tokens=6)
            return eng.run()[uid]
        finally:
            os.environ.pop("QUICK_TPU_PAGED", None)

    assert run("1") == run("0")


@pytest.mark.parametrize("window,lengths", [(8, [13, 27]), (12, [32, 5]),
                                            (16, [10, 30])])
def test_paged_sliding_window_matches_gather(rng, window, lengths):
    """window= kernel arg: only keys with pos > len-1-window attend (the
    mistral sliding window); fully-below pages skip."""
    B, Hq, Hkv, D, page, n_pt = 2, 4, 2, 32, 8, 4
    q, kp, vp, bt, ln = _setup(
        rng, B, Hq, Hkv, D, page, n_pages=1 + B * n_pt, n_pt=n_pt,
        lengths=lengths,
    )
    out = paged_decode_attention(q, kp, vp, bt, ln, window=window,
                                 interpret=True)
    ref = causal_attention(
        q[:, None], _dense_view(kp, bt), _dense_view(vp, bt),
        q_offset=ln - 1, kv_len=ln, window=window,
    )[:, 0]
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-3)


def test_paged_sliding_window_engine_matches_dense(rng):
    """Engine serving a sliding-window model (window < max_seq so the mask
    binds) with the paged kernel forced on must match the dense forward."""
    import dataclasses

    from quick_tpu import ModelConfig
    from quick_tpu.models import init_float_params, model_forward
    from quick_tpu.runtime import make_cache
    from quick_tpu.runtime.serving import Engine

    cfg = ModelConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64, sliding_window=16,
    )
    params = init_float_params(cfg, jax.random.PRNGKey(0))
    prompt = list(range(3, 33))  # 30 tokens: decode crosses the window

    # dense greedy reference
    cache = make_cache(cfg, 1, 48, dtype=jnp.float32)
    logits, cache = model_forward(
        params, cfg, jnp.asarray([prompt], jnp.int32), cache
    )
    cur = int(jnp.argmax(logits[0, -1]))
    ref = [cur]
    for _ in range(5):
        logits, cache = model_forward(
            params, cfg, jnp.asarray([[cur]], jnp.int32), cache
        )
        cur = int(jnp.argmax(logits[0, -1]))
        ref.append(cur)

    os.environ["QUICK_TPU_PAGED"] = "1"
    try:
        eng = Engine(params, cfg, max_slots=1, max_seq=48, page_size=8,
                     chunk=8, dtype=jnp.float32)
        uid = eng.submit(prompt, max_new_tokens=6)
        out = eng.run()[uid]
    finally:
        del os.environ["QUICK_TPU_PAGED"]
    assert out == ref


def test_paged_softcap_engine_matches_dense(rng):
    """Engine serving a softcap model (gemma2-class, window+softcap on
    alternating layers was importer-tested; here softcap alone) through
    the paged kernels must match the dense greedy forward — softcap
    models no longer fall off the fast serving path."""
    from quick_tpu import ModelConfig
    from quick_tpu.models import init_float_params, model_forward
    from quick_tpu.runtime import make_cache
    from quick_tpu.runtime.serving import Engine

    cfg = ModelConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64, attn_logit_softcap=5.0,
    )
    params = init_float_params(cfg, jax.random.PRNGKey(0))
    prompt = list(range(3, 33))

    cache = make_cache(cfg, 1, 48, dtype=jnp.float32)
    logits, cache = model_forward(
        params, cfg, jnp.asarray([prompt], jnp.int32), cache
    )
    cur = int(jnp.argmax(logits[0, -1]))
    ref = [cur]
    for _ in range(5):
        logits, cache = model_forward(
            params, cfg, jnp.asarray([[cur]], jnp.int32), cache
        )
        cur = int(jnp.argmax(logits[0, -1]))
        ref.append(cur)

    os.environ["QUICK_TPU_PAGED"] = "1"
    try:
        eng = Engine(params, cfg, max_slots=1, max_seq=48, page_size=8,
                     chunk=8, dtype=jnp.float32)
        uid = eng.submit(prompt, max_new_tokens=6)
        out = eng.run()[uid]
    finally:
        del os.environ["QUICK_TPU_PAGED"]
    assert out == ref


# ---------------------------------------------------------------------------
# Chunked-prefill kernel (paged_chunk_attention)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize(
    "B,Hq,Hkv,D,page,S,starts",
    [
        (2, 4, 4, 64, 8, 8, [13, 0]),    # MHA: one mid-prefill, one fresh
        (2, 8, 2, 64, 8, 4, [21, 5]),    # GQA, ragged starts
        (1, 4, 1, 32, 4, 8, [3]),        # MQA, chunk crosses pages
    ],
)
def test_paged_chunk_matches_causal(rng, B, Hq, Hkv, D, page, S, starts):
    """Chunk kernel == dense causal attention with q_offset=start,
    kv_len=start+S (the serving mixed-step contract)."""
    from quick_tpu.ops.paged_attention import paged_chunk_attention

    n_pt = 6
    _, kp, vp, bt, ln = _setup(
        rng, B, Hq, Hkv, D, page, n_pages=1 + B * n_pt, n_pt=n_pt,
        lengths=starts,
    )
    q = jnp.asarray(rng.standard_normal((B, S, Hq, D)), jnp.float32)
    out = paged_chunk_attention(q, kp, vp, bt, ln, interpret=True)
    ref = causal_attention(
        q, _dense_view(kp, bt), _dense_view(vp, bt),
        q_offset=ln, kv_len=ln + S,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-3)


def test_paged_chunk_window_alibi(rng):
    """Sliding window and alibi ride the chunk kernel's per-row masks."""
    from quick_tpu.ops.paged_attention import paged_chunk_attention

    B, Hq, Hkv, D, page, S, n_pt = 2, 4, 2, 32, 8, 8, 6
    _, kp, vp, bt, ln = _setup(
        rng, B, Hq, Hkv, D, page, n_pages=1 + B * n_pt, n_pt=n_pt,
        lengths=[17, 30],
    )
    q = jnp.asarray(rng.standard_normal((B, S, Hq, D)), jnp.float32)
    out = paged_chunk_attention(q, kp, vp, bt, ln, window=12, interpret=True)
    ref = causal_attention(
        q, _dense_view(kp, bt), _dense_view(vp, bt),
        q_offset=ln, kv_len=ln + S, window=12,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-3)

    sl = jnp.asarray(alibi_slopes(Hq))
    out = paged_chunk_attention(q, kp, vp, bt, ln, alibi_slopes=sl,
                                interpret=True)
    ref = causal_attention(
        q, _dense_view(kp, bt), _dense_view(vp, bt),
        q_offset=ln, kv_len=ln + S, alibi_slopes=sl,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-3)


def test_paged_chunk_softcap(rng):
    """Logit softcap rides the chunk kernel (alone and with a window)."""
    from quick_tpu.ops.paged_attention import paged_chunk_attention

    B, Hq, Hkv, D, page, S, n_pt = 2, 4, 2, 32, 8, 8, 6
    _, kp, vp, bt, ln = _setup(
        rng, B, Hq, Hkv, D, page, n_pages=1 + B * n_pt, n_pt=n_pt,
        lengths=[17, 30],
    )
    q = jnp.asarray(rng.standard_normal((B, S, Hq, D)), jnp.float32)
    for win in (None, 12):
        out = paged_chunk_attention(
            q, kp, vp, bt, ln, window=win, logit_softcap=30.0,
            interpret=True,
        )
        ref = causal_attention(
            q, _dense_view(kp, bt), _dense_view(vp, bt),
            q_offset=ln, kv_len=ln + S, window=win, logit_softcap=30.0,
        )
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=2e-3
        )


def test_paged_chunk_int8_matches_dequant(rng):
    """INT8 pages + per-token scale tiles through the chunk kernel match
    the float kernel on dequantized pages (k converted in-kernel, v scales
    folded into the probabilities)."""
    from quick_tpu.ops.paged_attention import paged_chunk_attention

    B, Hq, Hkv, D, page, S, n_pt = 2, 8, 2, 64, 8, 4, 6
    _, kp, vp, bt, ln = _setup(
        rng, B, Hq, Hkv, D, page, n_pages=1 + B * n_pt, n_pt=n_pt,
        lengths=[21, 9],
    )
    q = jnp.asarray(rng.standard_normal((B, S, Hq, D)), jnp.float32)

    def quant(p):
        amax = jnp.max(jnp.abs(p), axis=-1)
        sc = jnp.maximum(amax / 127.0, 1e-8)
        codes = jnp.clip(jnp.round(p / sc[..., None]), -127, 127).astype(
            jnp.int8
        )
        return codes, sc.astype(jnp.float32)

    kq, ks = quant(kp)
    vq, vs = quant(vp)
    out = paged_chunk_attention(
        q, kq, vq, bt, ln, kv_scales=_shared_tile(ks, vs), interpret=True
    )
    kd = kq.astype(jnp.float32) * ks[..., None]
    vd = vq.astype(jnp.float32) * vs[..., None]
    ref = paged_chunk_attention(q, kd, vd, bt, ln, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-2)
