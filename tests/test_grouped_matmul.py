"""Grouped ragged expert GEMM (ops/grouped_matmul.py): routing layout
properties, kernel-vs-golden equivalence (interpret mode), and
moe_forward dispatch-route equivalence."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quick_tpu import ModelConfig
from quick_tpu.models.model import init_float_params, quantize_params
from quick_tpu.modules.blocks import moe_forward
from quick_tpu.ops.grouped_matmul import (
    build_routing,
    grouped_row_budget,
    pick_grouped_bm,
    quantized_matmul_grouped,
)
from quick_tpu.quantize import quantize_tensor
from quick_tpu.quantize.packing import pack_qtpu


def _routing_np(sel, E, bm):
    return jax.tree_util.tree_map(
        np.asarray, build_routing(jnp.asarray(sel, jnp.int32), E, bm)
    )


def test_build_routing_layout():
    rng = np.random.default_rng(0)
    T, kk, E, bm = 13, 2, 5, 8
    sel = rng.integers(0, E, (T, kk))
    tok_rows, pos, tile_e, tile_live, valid = _routing_np(sel, E, bm)
    Mp = tok_rows.shape[0]
    assert Mp == grouped_row_budget(T * kk, E, bm) and Mp % bm == 0
    # every (t, k) pair lands on a distinct row whose tile carries its
    # expert and whose source-token gather points back at t
    seen = set()
    for t in range(T):
        for k in range(kk):
            r = pos[t, k]
            assert r not in seen
            seen.add(r)
            assert valid[r]
            assert tok_rows[r] == t
            assert tile_e[r // bm] == sel[t, k]
            assert tile_live[r // bm] == 1
    # rows outside `seen` are padding
    assert not any(valid[r] for r in range(Mp) if r not in seen)


def test_build_routing_empty_experts_get_no_tiles():
    """Experts with no routed tokens must own no valid tiles (their
    weights are never DMA'd by the kernel grid). TK > E so the
    sort-based path (not the trivial decode path) is exercised."""
    sel = np.full((5, 2), 3)  # everything routed to expert 3 of 8
    tok_rows, pos, tile_e, tile_live, valid = _routing_np(sel, 8, 8)
    used_tiles = {r // 8 for r in pos.reshape(-1)}
    for t in used_tiles:
        assert tile_e[t] == 3
        assert tile_live[t] == 1
    # 10 routed rows pad to two 8-row tiles; everything past is dead
    assert tile_live.sum() == 2


def test_build_routing_trivial_decode_path():
    """TK <= E: every pair owns its own tile (no sort machinery); the
    combine gather and token sources must still be exact."""
    rng = np.random.default_rng(5)
    T, kk, E, bm = 2, 2, 16, 8
    sel = rng.integers(0, E, (T, kk))
    tok_rows, pos, tile_e, tile_live, valid = _routing_np(sel, E, bm)
    assert tok_rows.shape[0] == T * kk * bm
    assert tile_live.sum() == T * kk
    for t in range(T):
        for k in range(kk):
            r = pos[t, k]
            assert valid[r]
            assert tok_rows[r] == t
            assert tile_e[r // bm] == sel[t, k]


def test_row_budget_decode_collapses():
    # bs=1 top-4 over 60 experts: 4 tiles, not 60
    assert grouped_row_budget(4, 60, 16) == 64
    # worst case 512 + 60*15 = 1412, rounded up to the 16-row tile
    assert grouped_row_budget(512, 60, 16) == 1424


def _grouped_case(rng, E, K, N, G=128):
    ws, qws, ss, zss = [], [], [], []
    for _ in range(E):
        w = (rng.standard_normal((K, N)) * 0.05).astype(np.float32)
        qt = quantize_tensor(jnp.asarray(w), group_size=G)
        qws.append(pack_qtpu(np.asarray(qt.q), G))
        ss.append(np.asarray(qt.scales))
        zss.append(np.asarray(qt.zeros * qt.scales))
        # golden dequant
        q = np.asarray(qt.q, np.float32).reshape(K // G, G, N)
        ws.append(
            ((q - np.asarray(qt.zeros)[:, None, :])
             * np.asarray(qt.scales)[:, None, :]).reshape(K, N)
        )
    return (np.stack(qws), np.stack(ss), np.stack(zss), np.stack(ws))


@pytest.mark.parametrize("bm", [8, 16, 32])
def test_grouped_kernel_matches_golden(monkeypatch, bm):
    monkeypatch.setenv("QUICK_TPU_PALLAS_INTERPRET", "1")
    rng = np.random.default_rng(1)
    E, K, N = 3, 256, 256
    qw, s, zs, wdeq = _grouped_case(rng, E, K, N)
    n_tiles = 4
    Mp = n_tiles * bm
    tile_e = np.asarray([0, 2, 2, 1], np.int32)
    x = (rng.standard_normal((Mp, K)) * 0.5).astype(np.float32)
    out = np.asarray(
        quantized_matmul_grouped(
            jnp.asarray(x, jnp.bfloat16), jnp.asarray(qw), jnp.asarray(s),
            jnp.asarray(zs), jnp.asarray(tile_e), bm,
        ),
        np.float32,
    )
    ref = np.concatenate(
        [x[i * bm : (i + 1) * bm].astype(np.float32) @ wdeq[tile_e[i]]
         for i in range(n_tiles)]
    )
    scale = np.abs(ref).max() + 1e-6
    assert np.abs(out - ref).max() / scale < 2e-2


def test_grouped_fallback_matches_golden():
    # default CPU mode routes to the lax.map fallback
    rng = np.random.default_rng(2)
    E, K, N = 4, 128, 128
    qw, s, zs, wdeq = _grouped_case(rng, E, K, N)
    bm, n_tiles = 8, 5
    tile_e = np.asarray([3, 0, 1, 1, 2], np.int32)
    x = (rng.standard_normal((n_tiles * bm, K)) * 0.5).astype(np.float32)
    out = np.asarray(
        quantized_matmul_grouped(
            jnp.asarray(x, jnp.bfloat16), jnp.asarray(qw), jnp.asarray(s),
            jnp.asarray(zs), jnp.asarray(tile_e), bm,
        ),
        np.float32,
    )
    ref = np.concatenate(
        [x[i * bm : (i + 1) * bm].astype(np.float32) @ wdeq[tile_e[i]]
         for i in range(n_tiles)]
    )
    scale = np.abs(ref).max() + 1e-6
    assert np.abs(out - ref).max() / scale < 2e-2


MOE_CFG = ModelConfig(
    vocab_size=128, hidden_size=128, intermediate_size=192,
    num_hidden_layers=1, num_attention_heads=4, num_key_value_heads=4,
    max_position_embeddings=64, num_local_experts=6,
    num_experts_per_tok=2, moe_intermediate_size=128,
    model_type="mixtral",
)


def _quant_moe():
    params = init_float_params(MOE_CFG, jax.random.PRNGKey(0))
    qp = quantize_params(params, MOE_CFG, group_size=32)
    return qp.blocks[0].mlp


def test_moe_grouped_matches_dense(monkeypatch):
    """Grouped dispatch (default at B*S > 32) must match the dense-einsum
    route on a quantized MoE layer."""
    moe = _quant_moe()
    x = jax.random.normal(
        jax.random.PRNGKey(1), (3, 16, 128), jnp.float32
    ).astype(jnp.bfloat16)  # 48 tokens > 32 threshold
    y_grouped = moe_forward(moe, MOE_CFG, x)
    monkeypatch.setenv("QUICK_TPU_MOE_GROUPED", "0")
    y_dense = moe_forward(moe, MOE_CFG, x)
    np.testing.assert_allclose(
        np.asarray(y_grouped, np.float32), np.asarray(y_dense, np.float32),
        atol=2e-2, rtol=2e-2,
    )


def test_moe_grouped_matches_cond_path(monkeypatch):
    """The same small batch through the grouped path (the quantized
    default) and the legacy cond-gated path must agree row-for-row, and
    replicating the tokens into a big batch must too."""
    moe = _quant_moe()
    x_small = jax.random.normal(
        jax.random.PRNGKey(2), (1, 4, 128), jnp.float32
    ).astype(jnp.bfloat16)
    y_small = moe_forward(moe, MOE_CFG, x_small)  # grouped, 4 tokens
    x_big = jnp.tile(x_small, (12, 1, 1))  # 48 tokens -> grouped
    y_big = moe_forward(moe, MOE_CFG, x_big)
    np.testing.assert_allclose(
        np.asarray(y_small[0], np.float32),
        np.asarray(y_big[0], np.float32), atol=2e-2, rtol=2e-2,
    )
    monkeypatch.setenv("QUICK_TPU_MOE_GROUPED", "0")
    y_cond = moe_forward(moe, MOE_CFG, x_small)  # legacy cond chain
    np.testing.assert_allclose(
        np.asarray(y_small, np.float32), np.asarray(y_cond, np.float32),
        atol=2e-2, rtol=2e-2,
    )


def test_moe_grouped_with_token_mask():
    """Masked (padding) tokens must not perturb valid rows' outputs."""
    moe = _quant_moe()
    x = jax.random.normal(
        jax.random.PRNGKey(3), (2, 24, 128), jnp.float32
    ).astype(jnp.bfloat16)
    mask = jnp.ones((2, 24), jnp.bool_).at[:, 20:].set(False)
    y_m = moe_forward(moe, MOE_CFG, x, token_mask=mask)
    y_full = moe_forward(moe, MOE_CFG, x)
    np.testing.assert_allclose(
        np.asarray(y_m[:, :20], np.float32),
        np.asarray(y_full[:, :20], np.float32), atol=2e-2, rtol=2e-2,
    )


def test_moe_grouped_interpret_kernel(monkeypatch):
    """Full moe_forward through the REAL grouped Pallas kernel body
    (interpret mode) — requires g=128-divisible expert shapes."""
    monkeypatch.setenv("QUICK_TPU_PALLAS_INTERPRET", "1")
    cfg = dataclasses.replace(
        MOE_CFG, hidden_size=128, moe_intermediate_size=128,
        intermediate_size=256,
    )
    params = init_float_params(cfg, jax.random.PRNGKey(5))
    qp = quantize_params(params, cfg, group_size=128)
    moe = qp.blocks[0].mlp
    x = jax.random.normal(
        jax.random.PRNGKey(6), (2, 20, 128), jnp.float32
    ).astype(jnp.bfloat16)
    y_kernel = moe_forward(moe, cfg, x)
    monkeypatch.setenv("QUICK_TPU_MOE_GROUPED", "0")
    y_dense = moe_forward(moe, cfg, x)
    np.testing.assert_allclose(
        np.asarray(y_kernel, np.float32), np.asarray(y_dense, np.float32),
        atol=2e-2, rtol=2e-2,
    )


def test_moe_partially_quantized_uses_fallback():
    """modules_to_not_convert may keep one expert projection float — the
    grouped path requires BOTH quantized, so such layers must route to
    the dense/cond fallbacks instead of crashing on .qweight."""
    params = init_float_params(MOE_CFG, jax.random.PRNGKey(0))
    qp = quantize_params(
        params, MOE_CFG, group_size=32,
        modules_to_not_convert=["down_proj"],
    )
    moe = qp.blocks[0].mlp
    x = jax.random.normal(
        jax.random.PRNGKey(7), (2, 24, 128), jnp.float32
    ).astype(jnp.bfloat16)
    y = moe_forward(moe, MOE_CFG, x)   # dense einsum fallback
    assert bool(jnp.isfinite(y).all())
    x1 = x[:1, :4]
    y1 = moe_forward(moe, MOE_CFG, x1)  # cond-chain fallback
    assert bool(jnp.isfinite(y1).all())


@pytest.mark.parametrize("mode", ["interpret", "jnp"])
def test_grouped_a8_matches_golden(monkeypatch, mode):
    """W4A8 grouped variant (int8 x int8 dots + per-row activation
    scales): both the kernel (interpret) and the XLA fallback must match
    the float golden within the activation-rounding budget."""
    if mode == "interpret":
        monkeypatch.setenv("QUICK_TPU_PALLAS_INTERPRET", "1")
    rng = np.random.default_rng(3)
    E, K, N, bm = 3, 256, 256, 32
    qw, s, zs, wdeq = _grouped_case(rng, E, K, N)
    n_tiles = 4
    tile_e = np.asarray([0, 2, 1, 1], np.int32)
    x = (rng.standard_normal((n_tiles * bm, K)) * 0.5).astype(np.float32)
    out = np.asarray(
        quantized_matmul_grouped(
            jnp.asarray(x, jnp.bfloat16), jnp.asarray(qw), jnp.asarray(s),
            jnp.asarray(zs), jnp.asarray(tile_e), bm, a8=True,
        ),
        np.float32,
    )
    ref = np.concatenate(
        [x[i * bm : (i + 1) * bm].astype(np.float32) @ wdeq[tile_e[i]]
         for i in range(n_tiles)]
    )
    scale = np.abs(ref).max() + 1e-6
    assert np.abs(out - ref).max() / scale < 3e-2  # + int8 act rounding


def test_moe_grouped_a8_close_to_a16(monkeypatch):
    """QUICK_TPU_MOE_A8 output must stay close to the a16 grouped path on
    a quantized MoE layer (the activation rounding is the only delta)."""
    cfg = dataclasses.replace(
        MOE_CFG, hidden_size=128, moe_intermediate_size=128,
        intermediate_size=256,
    )
    params = init_float_params(cfg, jax.random.PRNGKey(8))
    qp = quantize_params(params, cfg, group_size=128)
    moe = qp.blocks[0].mlp
    x = jax.random.normal(
        jax.random.PRNGKey(9), (2, 20, 128), jnp.float32
    ).astype(jnp.bfloat16)
    y16 = moe_forward(moe, cfg, x)
    monkeypatch.setenv("QUICK_TPU_MOE_A8", "1")
    y8 = moe_forward(moe, cfg, x)
    err = np.abs(np.asarray(y8, np.float32) - np.asarray(y16, np.float32))
    scale = np.abs(np.asarray(y16, np.float32)).max() + 1e-6
    assert err.max() / scale < 5e-2
