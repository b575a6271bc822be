"""Paged KV cache + continuous-batching engine tests (CPU, tiny model)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quick_tpu import ModelConfig
from quick_tpu.models import init_float_params, model_forward
from quick_tpu.modules.cache import KVCache
from quick_tpu.modules.paged_cache import PageAllocator, PagedKVCache
from quick_tpu.runtime import SamplingParams, generate, make_cache
from quick_tpu.runtime.serving import Engine

TINY = ModelConfig(
    vocab_size=256, hidden_size=128, intermediate_size=256,
    num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
    max_position_embeddings=128,
)


@pytest.fixture(scope="module")
def params():
    return init_float_params(TINY, jax.random.PRNGKey(0))


# ---------------------------------------------------------------------------
# PagedKVCache
# ---------------------------------------------------------------------------

def test_paged_update_and_gather(rng):
    L, P, page, H, D = 2, 9, 4, 2, 8
    cache = PagedKVCache.create(L, P, page, max_slots=2, max_seq=16,
                                n_kv=H, head_dim=D, dtype=jnp.float32)
    # slot 0 owns pages 1..4, slot 1 owns 5..8
    bt = jnp.asarray([[1, 2, 3, 4], [5, 6, 7, 8]], jnp.int32)
    cache = jax.tree_util.tree_map(lambda x: x, cache)
    import dataclasses
    cache = dataclasses.replace(cache, block_table=bt)
    k = jnp.asarray(rng.standard_normal((2, 6, H, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((2, 6, H, D)), jnp.float32)
    cache = cache.update(0, k, v, jnp.asarray([0, 2]))
    kd, vd = cache.layer(0)  # head-major [B, H, T, D]
    np.testing.assert_allclose(
        np.asarray(kd[0, :, :6]), np.asarray(jnp.moveaxis(k[0], 0, 1))
    )
    np.testing.assert_allclose(
        np.asarray(kd[1, :, 2:8]), np.asarray(jnp.moveaxis(k[1], 0, 1))
    )
    np.testing.assert_allclose(
        np.asarray(vd[1, :, 2:8]), np.asarray(jnp.moveaxis(v[1], 0, 1))
    )


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.int8])
def test_paged_write_kernel_matches_scatter(rng, dtype, monkeypatch):
    """The Pallas page-write kernel (interpret mode) must produce the same
    cache state as the XLA scatter, including trash-page clamping of
    positions past max_seq."""
    import dataclasses, os
    # page=32 so BOTH dtypes' RMW groups divide it (f32: 8, int8: 32)
    L, P, page, H, D = 2, 9, 32, 2, 8
    bt = jnp.asarray([[1, 2, 3, 4], [5, 6, 7, 8]], jnp.int32)
    k = jnp.asarray(rng.standard_normal((2, 6, H, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((2, 6, H, D)), jnp.float32)

    def run(env):
        monkeypatch.setenv("QUICK_TPU_PAGED_WRITE", env)
        cache = PagedKVCache.create(L, P, page, max_slots=2, max_seq=128,
                                    n_kv=H, head_dim=D, dtype=dtype)
        cache = dataclasses.replace(cache, block_table=bt)
        # chunk write (S>1, scatter path in both modes)
        cache = cache.update(1, k[:, :3], v[:, :3], jnp.asarray([0, 9]))
        # decode writes (S=1, kernel path when env=1); slot 1 crosses a
        # page boundary at 32; the last write at 200 (> max_seq) must land
        # on the trash page
        starts = [jnp.asarray([3, 30]), jnp.asarray([4, 31]),
                  jnp.asarray([5, 32]), jnp.asarray([6, 200])]
        for i, st in enumerate(starts):
            cache = cache.update(
                1, k[:, i : i + 1], v[:, i : i + 1], st
            )
        return cache

    a = run("0")
    b = run("1")
    np.testing.assert_array_equal(
        np.asarray(a.k_pages[1, 1:]), np.asarray(b.k_pages[1, 1:])
    )
    np.testing.assert_array_equal(
        np.asarray(a.v_pages[1, 1:]), np.asarray(b.v_pages[1, 1:])
    )
    if dtype == jnp.int8:
        np.testing.assert_array_equal(
            np.asarray(a.kv_scales[1, 1:]), np.asarray(b.kv_scales[1, 1:])
        )


def test_paged_int8_roundtrip(rng):
    """INT8 update/gather: dequantized layer view must match the float
    inputs within int8 quantization error."""
    L, P, page, H, D = 2, 9, 8, 2, 8  # page % 8 == 0: scale tiles are
    # per-page (8, page//8) blocks (modules/paged_cache.py)
    cache = PagedKVCache.create(L, P, page, max_slots=2, max_seq=16,
                                n_kv=H, head_dim=D, dtype=jnp.int8)
    assert cache.quantized
    import dataclasses
    bt = jnp.asarray([[1, 2], [5, 6]], jnp.int32)
    cache = dataclasses.replace(cache, block_table=bt)
    k = jnp.asarray(rng.standard_normal((2, 6, H, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((2, 6, H, D)), jnp.float32)
    cache = cache.update(0, k, v, jnp.asarray([0, 2]))
    kd, vd = cache.layer(0)  # head-major [B, H, T, D], dequantized bf16
    np.testing.assert_allclose(
        np.asarray(kd[0, :, :6], np.float32),
        np.asarray(jnp.moveaxis(k[0], 0, 1)),
        atol=0.04, rtol=0.04,
    )
    np.testing.assert_allclose(
        np.asarray(vd[1, :, 2:8], np.float32),
        np.asarray(jnp.moveaxis(v[1], 0, 1)),
        atol=0.04, rtol=0.04,
    )


def test_paged_int8_forward_close_to_float_kv(params, rng):
    """Prefill+decode with INT8 KV must stay close to the float-KV paged
    forward (per-token absmax int8: ~0.4% weight error on K/V)."""
    import dataclasses
    toks = jax.random.randint(jax.random.PRNGKey(3), (1, 10), 0, 256)
    bt = jnp.asarray([[1, 2, 3, 4]], jnp.int32)

    def run(dtype):
        cache = PagedKVCache.create(
            2, 9, 8, max_slots=1, max_seq=32,
            n_kv=TINY.num_key_value_heads, head_dim=TINY.head_dim,
            dtype=dtype,
        )
        cache = dataclasses.replace(cache, block_table=bt)
        logits, cache = model_forward(params, TINY, toks[:, :6], cache)
        outs = [logits[:, -1]]
        for t in range(6, 10):
            logits, cache = model_forward(
                params, TINY, toks[:, t : t + 1], cache
            )
            outs.append(logits[:, 0])
        return np.asarray(jnp.stack(outs, 1), np.float32)

    ref = run(jnp.bfloat16)
    out = run(jnp.int8)
    np.testing.assert_allclose(out, ref, atol=0.15, rtol=0.15)


def test_engine_int8_kv(params):
    """The engine end-to-end with dtype=int8: completes and produces tokens
    (greedy argmax may legitimately differ from bf16 KV on random weights,
    so assert liveness + shape, not exact ids)."""
    eng = Engine(params, TINY, max_slots=2, max_seq=64, page_size=8,
                 chunk=8, dtype=jnp.int8)
    u1 = eng.submit(list(range(5, 15)), max_new_tokens=6)
    u2 = eng.submit(list(range(40, 44)), max_new_tokens=4)
    outs = eng.run()
    assert len(outs[u1]) == 6 and len(outs[u2]) == 4
    assert all(0 <= t < TINY.vocab_size for t in outs[u1] + outs[u2])


def test_paged_matches_dense_forward(params, rng):
    """Prefill+decode through the paged cache must equal the dense cache."""
    toks = jax.random.randint(jax.random.PRNGKey(2), (1, 10), 0, 256)
    dense = KVCache.create(2, 1, 32, TINY.num_key_value_heads, TINY.head_dim)
    ld, dense = model_forward(params, TINY, toks[:, :6], dense)
    paged = PagedKVCache.create(
        2, 9, 4, max_slots=1, max_seq=32,
        n_kv=TINY.num_key_value_heads, head_dim=TINY.head_dim,
    )
    import dataclasses
    paged = dataclasses.replace(
        paged, block_table=jnp.asarray([[1, 2, 3, 4, 5, 6, 7, 8]], jnp.int32)
    )
    lp, paged = model_forward(params, TINY, toks[:, :6], paged)
    np.testing.assert_allclose(
        np.asarray(ld), np.asarray(lp), atol=1e-3, rtol=1e-3
    )
    for t in range(6, 10):
        ld, dense = model_forward(params, TINY, toks[:, t : t + 1], dense)
        lp, paged = model_forward(params, TINY, toks[:, t : t + 1], paged)
        np.testing.assert_allclose(
            np.asarray(ld), np.asarray(lp), atol=1e-3, rtol=1e-3
        )


def test_allocator():
    a = PageAllocator(8)
    p1 = a.alloc(3)
    p2 = a.alloc(4)
    assert p1 is not None and p2 is not None
    assert 0 not in p1 + p2  # trash page never allocated
    assert a.alloc(1) is None
    a.release(p1)
    assert sorted(a.alloc(3)) == sorted(p1)
    with pytest.raises(ValueError):
        a.release([0])


# ---------------------------------------------------------------------------
# Engine
# ---------------------------------------------------------------------------

def _greedy_reference(params, prompt, n_new):
    toks = jnp.asarray([prompt], jnp.int32)
    out = generate(
        params, TINY, toks, max_new_tokens=n_new,
        sampling=SamplingParams(temperature=0.0),
    )
    return list(np.asarray(out)[0, len(prompt):])


def test_engine_matches_generate(params):
    prompt = list(range(7, 20))
    ref = _greedy_reference(params, prompt, 8)
    eng = Engine(params, TINY, max_slots=2, max_seq=64, page_size=4, chunk=8,
                 dtype=jnp.float32)
    uid = eng.submit(prompt, max_new_tokens=8)
    outs = eng.run()
    assert outs[uid] == ref


def test_engine_moe_matches_generate():
    """A mixtral-class MoE model serves through the paged engine
    (chunked prefill + paged decode + cond-gated expert dispatch) with
    the same greedy stream as the dense generate loop."""
    import dataclasses

    cfg = dataclasses.replace(
        TINY, num_local_experts=4, num_experts_per_tok=2,
    )
    params = init_float_params(cfg, jax.random.PRNGKey(3))
    prompt = list(range(7, 20))
    toks = jnp.asarray([prompt], jnp.int32)
    out = generate(
        params, cfg, toks, max_new_tokens=8,
        sampling=SamplingParams(temperature=0.0),
    )
    ref = list(np.asarray(out)[0, len(prompt):])
    eng = Engine(params, cfg, max_slots=2, max_seq=64, page_size=4, chunk=8,
                 dtype=jnp.float32)
    uid = eng.submit(prompt, max_new_tokens=8)
    assert eng.run()[uid] == ref


def test_engine_capacity_exact_keeps_windows(params):
    """A request with prompt + max_new == max_seq must still decode through
    the decoupled windows (the W_eff ladder shrinks the window for the
    tight tail instead of dragging every turn through the mixed path) and
    match the independent greedy generation."""
    prompt = list(range(7, 27))  # 20 tokens
    want = 44                    # 20 + 44 == max_seq
    ref = _greedy_reference(params, prompt, want)
    eng = Engine(params, TINY, max_slots=2, max_seq=64, page_size=4,
                 chunk=8, decode_window=16, dtype=jnp.float32)
    uid = eng.submit(prompt, max_new_tokens=want)
    outs = eng.run()
    assert outs[uid] == ref
    assert eng.stats["window_steps"] > 0  # windows engaged, not all mixed


def test_engine_continuous_batching(params):
    """Requests submitted at different times, different lengths — each must
    match its independent greedy generation (the continuous-batching
    isolation property)."""
    p1 = list(range(3, 12))
    p2 = list(range(40, 45))
    ref1 = _greedy_reference(params, p1, 6)
    ref2 = _greedy_reference(params, p2, 4)
    eng = Engine(params, TINY, max_slots=2, max_seq=64, page_size=4, chunk=4,
                 dtype=jnp.float32)
    u1 = eng.submit(p1, max_new_tokens=6)
    eng.step()  # p1 mid-prefill
    u2 = eng.submit(p2, max_new_tokens=4)
    outs = eng.run()
    assert outs[u1] == ref1
    assert outs[u2] == ref2


def test_engine_queue_overflow(params):
    """More requests than slots: later requests wait and still finish."""
    eng = Engine(params, TINY, max_slots=2, max_seq=32, page_size=4, chunk=4,
                 dtype=jnp.float32)
    uids = [eng.submit(list(range(5 + i, 10 + i)), max_new_tokens=3)
            for i in range(5)]
    outs = eng.run()
    assert set(outs) == set(uids)
    assert all(len(v) == 3 for v in outs.values())


def test_engine_eos(params):
    """EOS retirement: find the greedy first token, then use it as EOS."""
    prompt = list(range(7, 20))
    ref = _greedy_reference(params, prompt, 1)
    eng = Engine(params, TINY, max_slots=1, max_seq=64, page_size=4, chunk=8,
                 dtype=jnp.float32)
    uid = eng.submit(prompt, max_new_tokens=50, eos_token_id=ref[0])
    outs = eng.run()
    assert outs[uid][-1] == ref[0] and len(outs[uid]) < 50


def test_slot_reuse_no_corruption(params):
    """Regression: a retired slot's stale block table must not scatter
    padding K/V into pages reallocated to later requests. Run enough
    sequential requests to force page reuse across slots and check each
    output still matches independent greedy generation."""
    eng = Engine(params, TINY, max_slots=3, max_seq=32, page_size=4, chunk=4,
                 dtype=jnp.float32)
    prompts = [list(range(5 + 3 * i, 13 + 3 * i)) for i in range(7)]
    refs = [_greedy_reference(params, p, 5) for p in prompts]
    uids = [eng.submit(p, max_new_tokens=5) for p in prompts]
    outs = eng.run()
    for uid, ref in zip(uids, refs):
        assert outs[uid] == ref


def test_table_capacity_overflow_writes_to_trash(params):
    """Regression: padding positions past max_seq must hit the trash page,
    not overwrite the slot's own last page."""
    # prompt+max_new exactly fills the table; chunk writes pad past the end
    prompt = list(range(3, 27))  # 24 tokens
    ref = _greedy_reference(params, prompt, 8)
    eng = Engine(params, TINY, max_slots=1, max_seq=32, page_size=4, chunk=8,
                 dtype=jnp.float32)
    uid = eng.submit(prompt, max_new_tokens=8)
    outs = eng.run()
    assert outs[uid] == ref


def test_engine_tensor_parallel(cpu_mesh_devices):
    """TP-sharded engine (4-way) must generate the same tokens as the
    single-device engine."""
    from quick_tpu.parallel import create_mesh, shard_params

    cfg = ModelConfig(
        vocab_size=256, hidden_size=128, intermediate_size=256,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        max_position_embeddings=128,
    )
    params = init_float_params(cfg, jax.random.PRNGKey(0))
    prompt = list(range(9, 21))

    eng0 = Engine(params, cfg, max_slots=2, max_seq=64, page_size=4,
                  chunk=8, dtype=jnp.float32)
    u0 = eng0.submit(prompt, max_new_tokens=6)
    ref = eng0.run()[u0]

    mesh = create_mesh(tp=4, dp=1, devices=cpu_mesh_devices[:4])
    tp_params = shard_params(params, cfg, mesh)  # permutes + device_puts
    eng = Engine(tp_params, cfg, max_slots=2, max_seq=64, page_size=4,
                 chunk=8, dtype=jnp.float32, mesh=mesh)
    u1 = eng.submit(prompt, max_new_tokens=6)
    out = eng.run()[u1]
    assert out == ref


def test_engine_tp_sampling_logprobs_penalties(cpu_mesh_devices):
    """TP serving feature parity: temperature sampling, per-request
    sampling params, logprobs (+top-K) and history penalties all run under
    a mesh through the SAME programs as single-chip (the forward is the
    only swapped piece — parallel/sharding.py::sharded_row_forward_fn), so
    with the same seed the sampled streams match exactly."""
    from quick_tpu.parallel import create_mesh, shard_params

    cfg = ModelConfig(
        vocab_size=256, hidden_size=128, intermediate_size=256,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        max_position_embeddings=128,
    )
    params = init_float_params(cfg, jax.random.PRNGKey(0))
    prompts = [list(range(9, 21)), list(range(40, 47))]
    sps = [
        SamplingParams(temperature=0.8, top_k=20, repetition_penalty=1.2),
        SamplingParams(temperature=0.0, frequency_penalty=0.5),
    ]

    def run(mesh, p):
        eng = Engine(p, cfg, max_slots=2, max_seq=64, page_size=4, chunk=8,
                     dtype=jnp.float32, mesh=mesh, seed=11, decode_window=2,
                     logprobs_topk=2, enable_penalties=True)
        uids = [eng.submit(pr, max_new_tokens=8, sampling=sp)
                for pr, sp in zip(prompts, sps)]
        outs = eng.run()
        return [(outs[u], eng.requests[u].logprobs,
                 eng.requests[u].top_logprobs) for u in uids]

    ref = run(None, params)
    mesh = create_mesh(tp=4, dp=1, devices=cpu_mesh_devices[:4])
    got = run(mesh, shard_params(params, cfg, mesh))
    for (rt, rl, rk), (gt, gl, gk) in zip(ref, got):
        assert gt == rt
        # bf16 block activations + TP psum reassociation: same ~0.05 noise
        # floor as the TP logit-equivalence tests (test_parallel.py)
        np.testing.assert_allclose(gl, rl, rtol=0.05, atol=0.05)
        assert [[t for t, _ in row] for row in gk] == [
            [t for t, _ in row] for row in rk
        ]


def test_engine_tp_decoupled_prefill_churn(cpu_mesh_devices):
    """TP engine under churn (staggered submissions against decoding
    slots) exercises the decoupled prefill program — cache.select/merge
    around the shard_map'd forward — and must match single-chip greedy."""
    from quick_tpu.parallel import create_mesh, shard_params

    cfg = ModelConfig(
        vocab_size=256, hidden_size=128, intermediate_size=256,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        max_position_embeddings=128,
    )
    params = init_float_params(cfg, jax.random.PRNGKey(0))
    reqs = [(list(range(5 + i, 20 + 2 * i)), 4 + i) for i in range(4)]

    def run(mesh, p):
        eng = Engine(p, cfg, max_slots=3, max_seq=64, page_size=4, chunk=4,
                     dtype=jnp.float32, mesh=mesh, decode_window=3,
                     prefill_rows=2)
        uids = []
        it = iter(reqs)
        for prompt, glen in it:
            uids.append(eng.submit(prompt, max_new_tokens=glen))
            eng.step()  # stagger: decode underway while the next admits
        outs = eng.run()
        assert eng.stats["prefill_substeps"] > 0  # decoupled path engaged
        return [outs[u] for u in uids]

    ref = run(None, params)
    mesh = create_mesh(tp=4, dp=1, devices=cpu_mesh_devices[:4])
    assert run(mesh, shard_params(params, cfg, mesh)) == ref


def test_engine_tp_int8_kv(cpu_mesh_devices):
    """INT8 KV under TP: the per-page scale tiles shard over the head axis
    with the pages (parallel/sharding.py::paged_cache_spec) and the engine
    completes; tokens may legitimately differ from bf16 KV on random
    weights, so assert liveness + count."""
    from quick_tpu.parallel import create_mesh, shard_params

    cfg = ModelConfig(
        vocab_size=256, hidden_size=128, intermediate_size=256,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        max_position_embeddings=128,
    )
    params = init_float_params(cfg, jax.random.PRNGKey(0))
    mesh = create_mesh(tp=4, dp=1, devices=cpu_mesh_devices[:4])
    eng = Engine(shard_params(params, cfg, mesh), cfg, max_slots=2,
                 max_seq=64, page_size=8, chunk=8, dtype=jnp.int8, mesh=mesh)
    uid = eng.submit(list(range(9, 21)), max_new_tokens=5)
    outs = eng.run()
    assert len(outs[uid]) == 5
    assert all(0 <= t < cfg.vocab_size for t in outs[uid])


def test_engine_fuzz_schedule(params):
    """Randomized scheduler fuzz: random prompt lengths, generation lengths
    and arrival times over a small pool — every output must match its
    independent greedy generation despite slot/page churn."""
    rng = np.random.default_rng(7)
    eng = Engine(params, TINY, max_slots=3, max_seq=48, page_size=4, chunk=4,
                 dtype=jnp.float32)
    reqs = []
    for i in range(10):
        plen = int(rng.integers(3, 20))
        glen = int(rng.integers(1, 6))
        prompt = [int(t) for t in rng.integers(0, 256, plen)]
        reqs.append((prompt, glen))
    refs = [_greedy_reference(params, p, g) for p, g in reqs]
    uids = []
    it = iter(reqs)
    # interleave submissions with steps
    for prompt, glen in it:
        uids.append(eng.submit(prompt, max_new_tokens=glen))
        for _ in range(int(rng.integers(0, 3))):
            if eng.has_work:
                eng.step()
    outs = eng.run()
    for uid, ref in zip(uids, refs):
        assert outs[uid] == ref, uid


def test_engine_sampling(params):
    """Non-greedy sampling: runs, respects max_new_tokens, and differs
    across seeds (with overwhelming probability on random logits)."""
    prompt = list(range(7, 20))

    def run(seed):
        eng = Engine(params, TINY, max_slots=1, max_seq=64, page_size=4,
                     chunk=8, dtype=jnp.float32, seed=seed,
                     sampling=SamplingParams(temperature=1.0, top_k=50))
        uid = eng.submit(prompt, max_new_tokens=12)
        return eng.run()[uid]

    a, b = run(0), run(123)
    assert len(a) == 12 and len(b) == 12
    assert a != b


def test_engine_decode_window_equivalence(params):
    """decode_window=8 (fused multi-step dispatch) must produce byte-identical
    greedy outputs to step-at-a-time (window=1), including EOS retirement
    mid-window and slot reuse after a windowed retirement."""
    p1 = list(range(3, 14))
    p2 = list(range(30, 38))
    def run(window):
        eng = Engine(params, TINY, max_slots=2, max_seq=64, page_size=4,
                     chunk=4, dtype=jnp.float32, decode_window=window)
        u1 = eng.submit(p1, max_new_tokens=11)
        u2 = eng.submit(p2, max_new_tokens=5)   # finishes mid-window
        outs = eng.run()
        u3 = eng.submit(p2, max_new_tokens=7)   # reuses a freed slot
        outs.update(eng.run())
        return outs[u1], outs[u2], outs[u3]
    assert run(8) == run(1)


def test_engine_window_respects_capacity(params):
    """A slot near table capacity must fall back to per-step decode (no
    window overrun past the block table)."""
    prompt = list(range(3, 25))
    eng = Engine(params, TINY, max_slots=1, max_seq=32, page_size=4, chunk=8,
                 dtype=jnp.float32, decode_window=8)
    uid = eng.submit(prompt, max_new_tokens=8)
    outs = eng.run()
    assert len(outs[uid]) == 8
    ref = _greedy_reference(params, prompt, 8)
    assert outs[uid] == ref


def test_engine_multi_substep_and_stats(params):
    """prefill_rows=2 with 5 concurrent prefills forces multiple decoupled
    prefill sub-batches per step; outputs must still match independent
    greedy generation, and the scheduler stats must account for every
    token."""
    rng = np.random.default_rng(3)
    reqs = [([int(t) for t in rng.integers(0, 256, int(rng.integers(4, 14)))],
             int(rng.integers(2, 7))) for _ in range(8)]
    refs = [_greedy_reference(params, p, g) for p, g in reqs]
    eng = Engine(params, TINY, max_slots=6, max_seq=48, page_size=4, chunk=4,
                 dtype=jnp.float32, decode_window=4, prefill_rows=2)
    uids = [eng.submit(p, max_new_tokens=g) for p, g in reqs]
    outs = eng.run()
    for uid, ref in zip(uids, refs):
        assert outs[uid] == ref, uid
    st = eng.stats
    assert st["admitted"] == 8 and st["retired"] == 8
    assert st["tokens_out"] == sum(len(v) for v in outs.values())
    assert st["prompt_tokens"] == sum(len(p) for p, _ in reqs)
    assert st["steps"] > 0 and (
        st["window_steps"] + st["mixed_steps"] > 0
    )


def test_prefix_cache_reuse_and_correctness(params):
    """Second request with the same prompt must reuse the first's KV pages
    (skipping their recompute) and still produce identical greedy output;
    a divergent-suffix request must only share the common full pages."""
    prompt = list(range(3, 25))       # 22 tokens, page=4 -> 5 shareable
    div = prompt[:8] + [99, 98, 97]   # shares first 2 pages only
    ref = _greedy_reference(params, prompt, 6)
    ref_div = _greedy_reference(params, div, 6)

    eng = Engine(params, TINY, max_slots=2, max_seq=64, page_size=4, chunk=4,
                 dtype=jnp.float32)
    u1 = eng.submit(prompt, max_new_tokens=6)
    outs = eng.run()
    assert outs[u1] == ref
    assert eng.stats["prefix_hit_tokens"] == 0
    # warm: same prompt -> 5 pages (20 tokens) served from the index
    u2 = eng.submit(prompt, max_new_tokens=6)
    u3 = eng.submit(div, max_new_tokens=6)
    outs = eng.run()
    assert outs[u2] == ref
    assert outs[u3] == ref_div
    assert eng.stats["prefix_hit_tokens"] == 20 + 8
    assert eng.prefix.hits == 5 + 2


def test_prefix_cache_eviction_under_pressure(params):
    """A tiny page pool forces LRU eviction of retained prompts; admission
    must still succeed and outputs stay correct."""
    p1 = list(range(3, 19))
    p2 = list(range(40, 56))
    refs = [_greedy_reference(params, p, 4) for p in (p1, p2)]
    # pool sized so both prompts cannot stay retained at once
    eng = Engine(params, TINY, max_slots=1, max_seq=32, page_size=4, chunk=8,
                 dtype=jnp.float32, n_pages=7)
    for _ in range(2):  # alternate: forces evictions on each re-admit
        for p, ref in zip((p1, p2), refs):
            uid = eng.submit(p, max_new_tokens=4)
            assert eng.run()[uid] == ref


def test_prefix_cache_off_matches_on(params):
    """prefix_cache=False must produce the same outputs (pure perf
    feature)."""
    prompts = [list(range(5, 21)), list(range(5, 21)), list(range(60, 70))]
    def run(flag):
        eng = Engine(params, TINY, max_slots=2, max_seq=64, page_size=4,
                     chunk=4, dtype=jnp.float32, prefix_cache=flag)
        uids = [eng.submit(p, max_new_tokens=5) for p in prompts]
        outs = eng.run()
        return [outs[u] for u in uids]
    assert run(True) == run(False)


def test_optimistic_preemption_equivalence(params):
    """reserve='optimistic' on a pool too small for every request's full
    reservation must preempt (recompute) and still deliver exactly the
    full-reservation greedy outputs, with no duplicate streamed tokens."""
    prompts = [list(range(10 * i + 3, 10 * i + 9)) for i in range(3)]
    refs = [_greedy_reference(params, p, 16) for p in prompts]
    streamed: dict = {}

    # pool: 11 usable pages; full needs 6 pages/request (ceil(22/4)) so
    # "full" serializes, while optimistic admits all three (3 pages each)
    # and must preempt as slots grow toward 6 pages
    eng = Engine(params, TINY, max_slots=3, max_seq=24, page_size=4,
                 chunk=4, dtype=jnp.float32, decode_window=2,
                 prefill_rows=2, n_pages=12, reserve="optimistic")
    uids = [
        eng.submit(
            p, max_new_tokens=16,
            on_token=lambda uid, t: streamed.setdefault(uid, []).append(t),
        )
        for p in prompts
    ]
    outs = eng.run()
    for uid, ref in zip(uids, refs):
        assert outs[uid] == ref, uid
        assert streamed[uid] == ref, uid  # no duplicates across preemption
    assert eng.stats["preemptions"] >= 1
    assert eng.stats["retired"] == 3


def test_optimistic_matches_full_reserve(params):
    """Same submissions through reserve='full' and reserve='optimistic'
    (ample pool: no preemption needed) must be token-identical."""
    rng = np.random.default_rng(17)
    reqs = [([int(t) for t in rng.integers(0, 256, int(rng.integers(3, 12)))],
             int(rng.integers(2, 9))) for _ in range(6)]

    def run(reserve, n_pages):
        eng = Engine(params, TINY, max_slots=3, max_seq=32, page_size=4,
                     chunk=4, dtype=jnp.float32, decode_window=3,
                     n_pages=n_pages, reserve=reserve)
        uids = [eng.submit(p, max_new_tokens=g) for p, g in reqs]
        outs = eng.run()
        return [outs[u] for u in uids]

    assert run("full", None) == run("optimistic", 16)


def test_optimistic_pool_too_small_raises(params):
    """A single request that cannot fit the whole pool even alone must
    raise (not silently corrupt KV past its pages or spin forever)."""
    eng = Engine(params, TINY, max_slots=2, max_seq=32, page_size=4,
                 chunk=4, dtype=jnp.float32, n_pages=4,
                 reserve="optimistic", decode_window=2)
    eng.submit(list(range(3, 9)), max_new_tokens=20)  # full need: 7 > 3
    with pytest.raises(RuntimeError, match="page pool too small"):
        eng.run()


def test_optimistic_preemption_fuzz(params):
    """Churn fuzz on a tight pool: random prompts/lengths with staggered
    submission; every output must match the dense greedy reference."""
    rng = np.random.default_rng(23)
    reqs = [([int(t) for t in rng.integers(0, 256, int(rng.integers(4, 12)))],
             int(rng.integers(4, 14))) for _ in range(10)]
    refs = [_greedy_reference(params, p, g) for p, g in reqs]
    eng = Engine(params, TINY, max_slots=4, max_seq=28, page_size=4,
                 chunk=4, dtype=jnp.float32, decode_window=2,
                 prefill_rows=2, n_pages=14, reserve="optimistic")
    uids = []
    for prompt, glen in reqs:
        uids.append(eng.submit(prompt, max_new_tokens=glen))
        for _ in range(int(rng.integers(0, 3))):
            if eng.has_work:
                eng.step()
    outs = eng.run()
    for uid, ref in zip(uids, refs):
        assert outs[uid] == ref, uid
    assert eng.stats["preemptions"] >= 1  # the tight pool was actually hit


def test_priority_scheduling(params):
    """Higher-priority queued requests admit before earlier-queued lower
    ones (FIFO within a priority); preemption evicts lowest priority
    first."""
    order = []

    def cb(uid, tok):
        if uid not in order:
            order.append(uid)

    eng = Engine(params, TINY, max_slots=1, max_seq=32, page_size=4,
                 chunk=4, dtype=jnp.float32, decode_window=2)
    ua = eng.submit(list(range(3, 9)), 4, on_token=cb, priority=0)
    ub = eng.submit(list(range(13, 19)), 4, on_token=cb, priority=0)
    uc = eng.submit(list(range(23, 29)), 4, on_token=cb, priority=5)
    outs = eng.run()
    # all three were queued before the first admission, so the
    # high-priority request goes FIRST, then FIFO among the rest
    assert order == [uc, ua, ub]
    assert all(len(outs[u]) == 4 for u in (ua, ub, uc))

    # preemption: under page pressure the LOW priority slot is evicted
    eng2 = Engine(params, TINY, max_slots=3, max_seq=24, page_size=4,
                  chunk=4, dtype=jnp.float32, decode_window=2,
                  n_pages=12, reserve="optimistic")
    u_low = eng2.submit(list(range(3, 9)), 16, priority=0)
    u_hi1 = eng2.submit(list(range(13, 19)), 16, priority=5)
    u_hi2 = eng2.submit(list(range(23, 29)), 16, priority=5)
    outs = eng2.run()
    assert eng2.stats["preemptions"] >= 1
    assert all(len(outs[u]) == 16 for u in (u_low, u_hi1, u_hi2))
    low_req = eng2.requests[u_low]
    hi_reqs = [eng2.requests[u_hi1], eng2.requests[u_hi2]]
    # the low-priority request was resumed at least as often as either
    # high one (it is always the first eviction choice)
    low_resumed = low_req.resume_len is not None
    hi_resumed = [r.resume_len is not None for r in hi_reqs]
    assert low_resumed or not any(hi_resumed)


def test_abort_from_on_token_callback(params):
    """Aborting from inside the streaming callback (the EOS-at-N pattern
    tools/serve_bench.py --declared_pad uses) must stop each request at
    exactly N tokens, under pipelined windows and optimistic reservation."""
    want = [3, 7, 5, 9]
    prompts = [list(range(4 * i + 3, 4 * i + 9)) for i in range(4)]
    refs = [_greedy_reference(params, p, n) for p, n in zip(prompts, want)]
    eng = Engine(params, TINY, max_slots=2, max_seq=32, page_size=4,
                 chunk=4, dtype=jnp.float32, decode_window=3,
                 n_pages=12, reserve="optimistic")
    uids = []
    for p, n in zip(prompts, want):
        seen = {"n": 0}

        def cb(uid, tok, _seen=seen, _n=n):
            _seen["n"] += 1
            if _seen["n"] >= _n:
                eng.abort(uid)

        uids.append(eng.submit(p, max_new_tokens=20, on_token=cb))
    outs = eng.run()
    for uid, ref, n in zip(uids, refs, want):
        assert outs[uid] == ref[:n], uid


def test_engine_fuzz_shared_prefixes(params):
    """Fuzz with prompts drawn from a few shared prefix families: prefix
    reuse under slot churn and pipelined windows must not perturb any
    output."""
    rng = np.random.default_rng(11)
    families = [
        [int(t) for t in rng.integers(0, 256, 12)] for _ in range(3)
    ]
    eng = Engine(params, TINY, max_slots=3, max_seq=48, page_size=4, chunk=4,
                 dtype=jnp.float32, decode_window=4, prefill_rows=2)
    reqs = []
    for i in range(12):
        fam = families[int(rng.integers(0, 3))]
        cut = int(rng.integers(0, 13))
        tail = [int(t) for t in rng.integers(0, 256, int(rng.integers(1, 6)))]
        prompt = fam[:cut] + tail
        reqs.append((prompt, int(rng.integers(1, 6))))
    refs = [_greedy_reference(params, p, g) for p, g in reqs]
    uids = []
    for prompt, glen in reqs:
        uids.append(eng.submit(prompt, max_new_tokens=glen))
        for _ in range(int(rng.integers(0, 3))):
            if eng.has_work:
                eng.step()
    outs = eng.run()
    for uid, ref in zip(uids, refs):
        assert outs[uid] == ref, uid
    assert eng.prefix.hits > 0  # families DID share pages


def test_stop_token_ids(params):
    """Generation halts at the first token in stop_token_ids, like at eos."""
    prompt = list(range(5, 17))
    ref = _greedy_reference(params, prompt, 12)
    eng = Engine(params, TINY, max_slots=2, max_seq=64, page_size=4, chunk=4,
                 dtype=jnp.float32)
    stop = ref[4]
    uid = eng.submit(prompt, max_new_tokens=12, stop_token_ids={stop, 9999})
    out = eng.run()[uid]
    first = ref.index(stop)
    assert out == ref[: first + 1]


def test_abort_queued_and_active(params):
    """Aborting a queued request drops it; aborting an active one retires
    it with partial output; untouched requests still match the greedy
    reference."""
    prompts = [list(range(3, 15)), list(range(40, 50)), list(range(90, 99))]
    refs = [_greedy_reference(params, p, 10) for p in prompts]
    eng = Engine(params, TINY, max_slots=2, max_seq=64, page_size=4, chunk=4,
                 dtype=jnp.float32, decode_window=2)
    uids = [eng.submit(p, max_new_tokens=10) for p in prompts]
    # third request queues behind the two slots; abort it before it runs
    assert eng.abort(uids[2])
    assert eng.finished[uids[2]] == []
    # run a few steps, then abort the first mid-generation
    for _ in range(6):
        eng.step()
    assert eng.abort(uids[0])
    partial = eng.finished[uids[0]]
    outs = eng.run()
    assert outs[uids[1]] == refs[1]
    # the partial output is a strict prefix of the full greedy output and
    # never grows after the abort
    assert outs[uids[0]] == partial
    assert partial == refs[0][: len(partial)]
    assert not eng.abort(uids[0])  # already finished
    assert not eng.abort(12345)    # unknown


def test_streaming_callback(params):
    """on_token delivers exactly the output tokens, in order, tagged with
    the right uid."""
    prompts = [list(range(3, 15)), list(range(40, 50))]
    refs = [_greedy_reference(params, p, 6) for p in prompts]
    eng = Engine(params, TINY, max_slots=2, max_seq=64, page_size=4, chunk=4,
                 dtype=jnp.float32, decode_window=2)
    seen = {}
    cb = lambda uid, tok: seen.setdefault(uid, []).append(tok)
    uids = [eng.submit(p, max_new_tokens=6, on_token=cb) for p in prompts]
    outs = eng.run()
    for uid, ref in zip(uids, refs):
        assert outs[uid] == ref
        assert seen[uid] == ref


def test_per_request_sampling(params):
    """Per-request SamplingParams: a greedy request and constrained-sampled
    requests (top_k=1 / tiny top_p with high temperature — both must equal
    greedy) coexist in one batch with a free-sampling request."""
    prompts = [list(range(3, 15)), list(range(40, 50)),
               list(range(90, 99)), list(range(7, 21))]
    refs = [_greedy_reference(params, p, 6) for p in prompts]
    eng = Engine(params, TINY, max_slots=4, max_seq=64, page_size=4, chunk=4,
                 dtype=jnp.float32, decode_window=2, seed=3)
    u_greedy = eng.submit(prompts[0], 6)
    u_topk1 = eng.submit(prompts[1], 6,
                         sampling=SamplingParams(temperature=5.0, top_k=1))
    u_topp0 = eng.submit(prompts[2], 6,
                         sampling=SamplingParams(temperature=5.0, top_p=1e-6))
    u_free = eng.submit(prompts[3], 6,
                        sampling=SamplingParams(temperature=1.0))
    outs = eng.run()
    assert outs[u_greedy] == refs[0]
    assert outs[u_topk1] == refs[1]
    assert outs[u_topp0] == refs[2]
    assert len(outs[u_free]) == 6
    assert all(0 <= t < TINY.vocab_size for t in outs[u_free])


def test_engine_penalties_match_generate(params):
    """Engine(enable_penalties=True) must reproduce generate()'s penalized
    (deterministic, temperature=0) output exactly — the on-device count
    state threaded through prefill/window/mixed programs equals the scan
    carry — while an unpenalized greedy request in the same batch stays on
    the plain reference."""
    sp = SamplingParams(temperature=0.0, repetition_penalty=30.0,
                        frequency_penalty=0.3, presence_penalty=0.2)
    prompt = list(range(3, 15))
    other = list(range(40, 50))
    ref_pen = list(np.asarray(generate(
        params, TINY, jnp.asarray([prompt], jnp.int32), max_new_tokens=24,
        sampling=sp,
    ))[0, len(prompt):])
    ref_plain = _greedy_reference(params, other, 24)

    eng = Engine(params, TINY, max_slots=2, max_seq=64, page_size=4,
                 chunk=4, dtype=jnp.float32, decode_window=3,
                 enable_penalties=True)
    u1 = eng.submit(prompt, max_new_tokens=24, sampling=sp)
    u2 = eng.submit(other, max_new_tokens=24)
    outs = eng.run()
    assert outs[u1] == ref_pen
    assert outs[u2] == ref_plain


def test_engine_penalties_mixed_path(params):
    """decode_window=1 forces the padded mixed path — the emit-flag
    counting there must agree with generate() too."""
    sp = SamplingParams(temperature=0.0, frequency_penalty=1e4)
    prompt = list(range(5, 14))
    ref = list(np.asarray(generate(
        params, TINY, jnp.asarray([prompt], jnp.int32), max_new_tokens=16,
        sampling=sp,
    ))[0, len(prompt):])
    eng = Engine(params, TINY, max_slots=2, max_seq=48, page_size=4,
                 chunk=4, dtype=jnp.float32, decode_window=1,
                 enable_penalties=True)
    uid = eng.submit(prompt, max_new_tokens=16, sampling=sp)
    assert eng.run()[uid] == ref
    assert len(set(ref)) == len(ref)  # the huge penalty forbids repeats


def test_engine_penalties_survive_preemption(params):
    """Preemption rebuilds the count state from the delivered output at
    re-admission: a penalized request preempted mid-generation must still
    match the uninterrupted generate() reference."""
    sp = SamplingParams(temperature=0.0, repetition_penalty=25.0,
                        presence_penalty=0.4)
    prompts = [list(range(10 * i + 3, 10 * i + 9)) for i in range(3)]
    refs = [
        list(np.asarray(generate(
            params, TINY, jnp.asarray([p], jnp.int32), max_new_tokens=16,
            sampling=sp,
        ))[0, len(p):])
        for p in prompts
    ]
    eng = Engine(params, TINY, max_slots=3, max_seq=24, page_size=4,
                 chunk=4, dtype=jnp.float32, decode_window=2,
                 prefill_rows=2, n_pages=12, reserve="optimistic",
                 enable_penalties=True)
    uids = [eng.submit(p, max_new_tokens=16, sampling=sp) for p in prompts]
    outs = eng.run()
    assert eng.stats["preemptions"] >= 1
    for uid, ref in zip(uids, refs):
        assert outs[uid] == ref, uid


def test_engine_logit_bias(params):
    """+100 bias pins every sample to that token; -100 bans a token even
    when it is the greedy choice; an unbiased request in the same batch is
    unaffected."""
    prompt = list(range(3, 12))
    ref = _greedy_reference(params, prompt, 8)
    eng = Engine(params, TINY, max_slots=3, max_seq=48, page_size=4,
                 chunk=4, dtype=jnp.float32, decode_window=2,
                 enable_penalties=True)
    u_pin = eng.submit(prompt, max_new_tokens=8, logit_bias={42: 100.0})
    u_ban = eng.submit(prompt, max_new_tokens=8,
                       logit_bias={int(ref[0]): -100.0})
    u_plain = eng.submit(prompt, max_new_tokens=8)
    outs = eng.run()
    assert outs[u_pin] == [42] * 8
    assert outs[u_ban][0] != ref[0]
    assert outs[u_plain] == ref


def test_engine_penalties_require_flag(params):
    eng = Engine(params, TINY, max_slots=2, max_seq=32, page_size=4,
                 chunk=4, dtype=jnp.float32)
    with pytest.raises(ValueError, match="enable_penalties"):
        eng.submit([1, 2, 3], 4,
                   sampling=SamplingParams(repetition_penalty=2.0))


def test_engine_min_p_row(params):
    """Per-request min_p works without the penalties flag: min_p ~ 1 at
    high temperature pins the row to greedy."""
    prompt = list(range(3, 15))
    ref = _greedy_reference(params, prompt, 8)
    eng = Engine(params, TINY, max_slots=2, max_seq=48, page_size=4,
                 chunk=4, dtype=jnp.float32, decode_window=2, seed=5)
    uid = eng.submit(prompt, max_new_tokens=8,
                     sampling=SamplingParams(temperature=4.0, min_p=0.999))
    assert eng.run()[uid] == ref


def test_engine_logprobs(params):
    """Sampled-token logprobs must equal the dense path's log-softmax at
    each greedy step (exact f32 path), including the prefill-completion
    sample; top-K alternatives are sorted desc and lead with the greedy
    token."""
    from quick_tpu.models import model_forward

    prompt = list(range(3, 15))
    n = 6
    cache = make_cache(TINY, 1, 64, dtype=jnp.float32)
    lg, cache = model_forward(
        params, TINY, jnp.asarray([prompt], jnp.int32), cache
    )
    ref = []
    row = lg[0, -1]
    for _ in range(n):
        t = int(jnp.argmax(row))
        lsm = jax.nn.log_softmax(row.astype(jnp.float32))
        ref.append((t, float(lsm[t])))
        lg, cache = model_forward(
            params, TINY, jnp.asarray([[t]], jnp.int32), cache
        )
        row = lg[0, -1]

    eng = Engine(params, TINY, max_slots=2, max_seq=48, page_size=4,
                 chunk=4, dtype=jnp.float32, decode_window=2,
                 logprobs_topk=3)
    uid = eng.submit(prompt, max_new_tokens=n)
    outs = eng.run()
    req = eng.requests[uid]
    assert outs[uid] == [t for t, _ in ref]
    # chunked paged prefill vs one-shot dense prefill reassociate the
    # bf16 hidden-state math differently: logits (and so logprobs) wobble
    # ~1e-2 while argmax agrees; a position/indexing bug would be off by
    # whole units
    np.testing.assert_allclose(
        req.logprobs, [l for _, l in ref], rtol=0.01, atol=0.03
    )
    assert len(req.top_logprobs) == n
    for (t, l), top in zip(ref, req.top_logprobs):
        assert top[0][0] == t  # greedy sample == top-1 alternative
        np.testing.assert_allclose(top[0][1], l, rtol=0.01, atol=0.03)
        vals = [v for _, v in top]
        assert vals == sorted(vals, reverse=True)
        assert all(v <= 0.0 for v in vals)


def test_engine_logprobs_with_penalties(params):
    """Penalized sampling reports logprobs under the POST-penalty
    distribution (the one actually sampled from)."""
    sp = SamplingParams(temperature=0.0, frequency_penalty=1e4)
    eng = Engine(params, TINY, max_slots=1, max_seq=48, page_size=4,
                 chunk=4, dtype=jnp.float32, decode_window=2,
                 enable_penalties=True, logprobs_topk=2)
    uid = eng.submit(list(range(5, 12)), max_new_tokens=8, sampling=sp)
    eng.run()
    req = eng.requests[uid]
    assert len(req.logprobs) == 8
    assert all(np.isfinite(v) and v <= 0.0 for v in req.logprobs)
    # under the huge penalty every earlier token is at -inf-ish, so the
    # top-2 alternatives can never repeat the previous sample
    for i in range(1, 8):
        assert req.output[i - 1] not in [t for t, _ in req.top_logprobs[i]]


def test_per_request_sampling_deterministic(params):
    """Same seed => identical sampled outputs across engine instances."""
    prompt = list(range(3, 15))
    def run():
        eng = Engine(params, TINY, max_slots=2, max_seq=64, page_size=4,
                     chunk=4, dtype=jnp.float32, decode_window=2, seed=7)
        uid = eng.submit(prompt, 8,
                         sampling=SamplingParams(temperature=0.8, top_k=40))
        return eng.run()[uid]
    assert run() == run()
