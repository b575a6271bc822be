"""AWQ pipeline tests: the scale search must exploit salient channels."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quick_tpu import ModelConfig, QuantConfig
from quick_tpu.models import init_float_params, model_forward, quantize_params
from quick_tpu.modules.linear import QuantLinear
from quick_tpu.quantize.awq import (
    apply_clip,
    awq_quantize_model,
    search_clip,
    search_scale,
)
from quick_tpu.quantize.numerics import pseudo_quantize_tensor


def test_scale_search_protects_salient_channels(rng):
    """Construct the canonical AWQ scenario: a few input channels carry
    large activations; per-channel scaling should cut quantization error of
    y = x @ w well below plain RTN."""
    K, N, G = 128, 64, 32
    w = rng.standard_normal((K, N)).astype(np.float32) * 0.02
    x = rng.standard_normal((256, K)).astype(np.float32)
    salient = rng.choice(K, 8, replace=False)
    x[:, salient] *= 30.0  # heavy activation outliers
    w_j, x_j = jnp.asarray(w), jnp.asarray(x)

    s = search_scale(
        x_j, [w_j], loss_forward=lambda ws: x_j @ ws[0], group_size=G
    )
    y = np.asarray(x_j @ w_j)
    w_rtn = pseudo_quantize_tensor(w_j, G)
    y_rtn = np.asarray(x_j @ w_rtn)
    w_awq = pseudo_quantize_tensor(w_j * s[:, None], G) / s[:, None]
    y_awq = np.asarray(x_j @ w_awq)

    err_rtn = np.mean((y - y_rtn) ** 2)
    err_awq = np.mean((y - y_awq) ** 2)
    assert err_awq < err_rtn * 0.7, (err_awq, err_rtn)


def test_scale_math_identity(rng):
    """Scaling w by s and the previous op by 1/s must leave the float
    function unchanged (reference scale.py NaN-check invariant)."""
    K, N = 64, 32
    w = jnp.asarray(rng.standard_normal((K, N)).astype(np.float32))
    x = jnp.asarray(rng.standard_normal((16, K)).astype(np.float32))
    s = jnp.asarray(rng.random(K).astype(np.float32) + 0.5)
    y0 = x @ w
    y1 = (x / s) @ (w * s[:, None])
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1), rtol=1e-4, atol=1e-4)


def test_clip_search_reduces_error(rng):
    """Clipping outlier weights should reduce per-group matmul error."""
    K, N, G = 128, 32, 32
    w = rng.standard_normal((K, N)).astype(np.float32) * 0.02
    # inject rare huge weights that blow up the quant step for their group
    idx = rng.choice(K * N, 20, replace=False)
    w.ravel()[idx] *= 50
    x = rng.standard_normal((512, K)).astype(np.float32)
    w_j, x_j = jnp.asarray(w), jnp.asarray(x)

    y = np.asarray(x_j @ w_j)
    y_rtn = np.asarray(x_j @ pseudo_quantize_tensor(w_j, G))
    maxv = search_clip(w_j, x_j, G)
    w_clipped = apply_clip(w_j, maxv, G)
    y_clip = np.asarray(x_j @ pseudo_quantize_tensor(w_clipped, G))

    err_rtn = np.mean((y - y_rtn) ** 2)
    err_clip = np.mean((y - y_clip) ** 2)
    assert err_clip <= err_rtn


def test_awq_model_pipeline_end_to_end():
    """Full pipeline runs, returns packed QuantLinears, KL stays finite and
    comparable to RTN on a tiny random model."""
    cfg = ModelConfig(
        vocab_size=128, hidden_size=128, intermediate_size=256,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        max_position_embeddings=64,
    )
    p = init_float_params(cfg, jax.random.PRNGKey(0))
    calib = jax.random.randint(jax.random.PRNGKey(1), (2, 32), 0, 128)
    qcfg = QuantConfig(q_group_size=32)
    qp = awq_quantize_model(p, cfg, calib, qcfg, verbose=False)
    assert isinstance(qp.blocks[0].attn.qkv_proj, QuantLinear)

    test_toks = jax.random.randint(jax.random.PRNGKey(2), (2, 16), 0, 128)
    lf, _ = model_forward(p, cfg, test_toks)
    la, _ = model_forward(qp, cfg, test_toks)
    pf = jax.nn.log_softmax(lf[:, -1])
    pa = jax.nn.log_softmax(la[:, -1])
    kl_awq = float(jnp.sum(jnp.exp(pf) * (pf - pa), -1).mean())

    qr = quantize_params(p, cfg, group_size=32)
    lr, _ = model_forward(qr, cfg, test_toks)
    pr = jax.nn.log_softmax(lr[:, -1])
    kl_rtn = float(jnp.sum(jnp.exp(pf) * (pf - pr), -1).mean())

    assert np.isfinite(kl_awq)
    assert kl_awq < kl_rtn * 2.5  # must not be materially worse than RTN


def test_awq_gqa_block():
    """GQA (hq != hkv) skips the v->o scale group but still quantizes."""
    cfg = ModelConfig(
        vocab_size=64, hidden_size=64, intermediate_size=128,
        num_hidden_layers=1, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=32,
    )
    p = init_float_params(cfg, jax.random.PRNGKey(3))
    calib = jax.random.randint(jax.random.PRNGKey(4), (2, 16), 0, 64)
    qp = awq_quantize_model(p, cfg, calib, QuantConfig(q_group_size=32), verbose=False)
    logits, _ = model_forward(qp, cfg, calib[:, :8])
    assert bool(jnp.isfinite(logits).all())


def test_awq_moe_pipeline():
    cfg = ModelConfig(
        vocab_size=64, hidden_size=64, intermediate_size=64,
        num_hidden_layers=1, num_attention_heads=4, num_key_value_heads=4,
        max_position_embeddings=32, num_local_experts=2,
        num_experts_per_tok=1, model_type="mixtral",
    )
    p = init_float_params(cfg, jax.random.PRNGKey(5))
    calib = jax.random.randint(jax.random.PRNGKey(6), (2, 16), 0, 64)
    qp = awq_quantize_model(p, cfg, calib, QuantConfig(q_group_size=32), verbose=False)
    logits, _ = model_forward(qp, cfg, calib[:, :8])
    assert bool(jnp.isfinite(logits).all())


def test_awq_moe_respects_skip():
    """modules_to_not_convert must keep MoE expert linears float too (the
    dense branch already honored it)."""
    from quick_tpu.modules.linear import Linear

    cfg = ModelConfig(
        vocab_size=64, hidden_size=64, intermediate_size=64,
        num_hidden_layers=1, num_attention_heads=4, num_key_value_heads=4,
        max_position_embeddings=32, num_local_experts=2,
        num_experts_per_tok=1, model_type="mixtral",
    )
    p = init_float_params(cfg, jax.random.PRNGKey(5))
    calib = jax.random.randint(jax.random.PRNGKey(6), (2, 16), 0, 64)
    qp = awq_quantize_model(
        p, cfg, calib,
        QuantConfig(q_group_size=32,
                    modules_to_not_convert=["gate_up", "down"]),
        verbose=False,
    )
    moe = qp.blocks[0].mlp
    assert isinstance(moe.gate_up_proj, Linear)
    assert isinstance(moe.down_proj, Linear)
    logits, _ = model_forward(qp, cfg, calib[:, :8])
    assert bool(jnp.isfinite(logits).all())


def test_awq_bias_scaling_exact():
    """The o-scale (v-section) and up-scale transforms must divide the
    corresponding BIAS slices too (reference scale_fc_fc divides
    prev_op.bias, scale.py:100-117). With a large qkv bias, a missing
    bias division shows up as a large quantized-vs-float KL."""
    import dataclasses as dc

    cfg = ModelConfig(
        vocab_size=256, hidden_size=128, intermediate_size=256,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        max_position_embeddings=64, attention_bias=True,
    )
    params = init_float_params(cfg, jax.random.PRNGKey(0))
    # inflate the v-section bias so an unscaled bias would dominate
    blocks = []
    hq, hd = cfg.num_attention_heads, cfg.head_dim
    v_cols = slice(2 * hq * hd, 3 * hq * hd)
    for blk in params.blocks:
        b = blk.attn.qkv_proj.bias.at[v_cols].set(3.0)
        attn = dc.replace(
            blk.attn, qkv_proj=dc.replace(blk.attn.qkv_proj, bias=b)
        )
        blocks.append(dc.replace(blk, attn=attn))
    params = dc.replace(params, blocks=blocks)

    calib = jax.random.randint(jax.random.PRNGKey(1), (1, 32), 0, 256)
    qp = awq_quantize_model(
        params, cfg, calib, QuantConfig(q_group_size=32), verbose=False
    )
    toks = jax.random.randint(jax.random.PRNGKey(2), (1, 16), 0, 256)
    lf, _ = model_forward(params, cfg, toks)
    lq, _ = model_forward(qp, cfg, toks)
    pf = jax.nn.log_softmax(lf[:, -1])
    pq = jax.nn.log_softmax(lq[:, -1])
    kl = float(jnp.sum(jnp.exp(pf) * (pf - pq), axis=-1).mean())
    assert np.isfinite(kl) and kl < 0.3, kl


def test_awq_gemma2_block():
    """gemma2-style block (sandwich post-norms, softcaps, sliding window):
    AWQ quantizes with post-norms carried through, and quantized logits
    stay close to float."""
    cfg = ModelConfig(
        vocab_size=64, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64, model_type="gemma2",
        use_post_norms=True, embed_scale=True, tie_word_embeddings=True,
        attn_logit_softcap=50.0, final_logit_softcap=30.0,
        sliding_window=8, sliding_window_pattern=2,
        act_fn="gelu",
    )
    p = init_float_params(cfg, jax.random.PRNGKey(0))
    assert p.blocks[0].attn_post_norm is not None
    calib = jax.random.randint(jax.random.PRNGKey(1), (2, 32), 0, 64)
    qp = awq_quantize_model(
        p, cfg, calib, QuantConfig(q_group_size=32), verbose=False
    )
    assert qp.blocks[0].attn_post_norm is not None
    toks = jax.random.randint(jax.random.PRNGKey(2), (1, 16), 0, 64)
    lf, _ = model_forward(p, cfg, toks)
    lq, _ = model_forward(qp, cfg, toks)
    assert bool(jnp.isfinite(lq).all())
    assert float(jnp.abs(lq).max()) <= 30.0 + 1e-4
    # quantization error small on a tiny model
    assert float(jnp.abs(lf - lq).mean()) < 0.5


def test_awq_olmo2_block():
    """olmo2-style block (NO pre-norms — post-norms only, full-width qk
    norm): the qkv/gate_up scale groups are skipped (no preceding op to
    fold into), o/down groups and clips still apply, and quantized logits
    stay close to float."""
    cfg = ModelConfig(
        vocab_size=64, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        max_position_embeddings=64, model_type="olmo2",
        use_post_norms=True, pre_norms=False, use_qk_norm=True,
        qk_norm_full=True,
    )
    p = init_float_params(cfg, jax.random.PRNGKey(0))
    assert p.blocks[0].attn_norm is None
    assert p.blocks[0].attn.q_norm.shape == (64,)  # full width (4*16)
    calib = jax.random.randint(jax.random.PRNGKey(1), (2, 32), 0, 64)
    qp = awq_quantize_model(
        p, cfg, calib, QuantConfig(q_group_size=32), verbose=False
    )
    assert qp.blocks[0].attn_norm is None
    assert qp.blocks[0].attn_post_norm is not None
    toks = jax.random.randint(jax.random.PRNGKey(2), (1, 16), 0, 64)
    lf, _ = model_forward(p, cfg, toks)
    lq, _ = model_forward(qp, cfg, toks)
    assert bool(jnp.isfinite(lq).all())
    assert float(jnp.abs(lf - lq).mean()) < 0.5


def test_quantize_lm_head_option():
    """QuantConfig.quantize_lm_head packs the head W4A16 (RTN) and the
    setting round-trips through quant_config persistence."""
    import dataclasses

    from quick_tpu.modules.linear import QuantLinear

    cfg = ModelConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=1, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64,
    )
    p = init_float_params(cfg, jax.random.PRNGKey(0), jnp.float32)
    calib = jnp.asarray(np.arange(64)[None] % 256, jnp.int32)
    qcfg = QuantConfig(q_group_size=32, quantize_lm_head=True)
    qp = awq_quantize_model(p, cfg, calib, qcfg, verbose=False)
    assert isinstance(qp.lm_head, QuantLinear)
    logits, _ = model_forward(qp, cfg, calib[:, :8])
    assert bool(jnp.isfinite(logits).all())
    rt = QuantConfig.from_dict(qcfg.to_dict())
    assert rt.quantize_lm_head is True
