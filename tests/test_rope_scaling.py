"""RoPE scaling variants (HF rope_scaling): linear / dynamic / yarn /
llama3 table construction, config plumbing, and end-to-end generation."""
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quick_tpu import ModelConfig
from quick_tpu.ops.rope import rope_table


def test_linear_scaling_is_position_interpolation():
    """linear factor f at position p equals the unscaled table at p/f."""
    cos0, sin0 = rope_table(64, 16)
    cos2, sin2 = rope_table(128, 16, scaling={"type": "linear", "factor": 2.0})
    np.testing.assert_allclose(
        np.asarray(cos2[::2]), np.asarray(cos0), rtol=1e-5, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(sin2[::2]), np.asarray(sin0), rtol=1e-5, atol=1e-5
    )


def test_dynamic_ntk_matches_hf_formula():
    D, L, L0, f = 16, 128, 64, 2.0
    cos, _ = rope_table(L, D, theta=10000.0,
                        scaling={"type": "dynamic", "factor": f,
                                 "original_max_position_embeddings": L0})
    theta2 = 10000.0 * (f * L / L0 - (f - 1)) ** (D / (D - 2))
    inv = 1.0 / theta2 ** (np.arange(0, D, 2) / D)
    np.testing.assert_allclose(
        np.asarray(cos[5]), np.cos(5 * inv), rtol=1e-5, atol=1e-5
    )
    # within the original window it is a no-op
    cos_in, _ = rope_table(L0, D,
                           scaling={"type": "dynamic", "factor": f,
                                    "original_max_position_embeddings": L0})
    cos_ref, _ = rope_table(L0, D)
    np.testing.assert_allclose(np.asarray(cos_in), np.asarray(cos_ref))


def test_llama3_piecewise():
    """High-frequency dims keep the unscaled table; the lowest-frequency
    dim interpolates by the full factor."""
    D, L0, f = 64, 8192, 8.0
    sc = {"rope_type": "llama3", "factor": f, "low_freq_factor": 1.0,
          "high_freq_factor": 4.0, "original_max_position_embeddings": L0}
    cos, _ = rope_table(32, D, theta=500000.0, scaling=sc)
    cos0, _ = rope_table(32, D, theta=500000.0)
    inv = 1.0 / 500000.0 ** (np.arange(0, D, 2) / D)
    wavelen = 2 * np.pi / inv
    hi_dims = wavelen < L0 / 4.0   # high-frequency: untouched
    lo_dims = wavelen > L0 / 1.0   # low-frequency: /factor
    assert hi_dims.any()
    np.testing.assert_allclose(
        np.asarray(cos)[:, hi_dims], np.asarray(cos0)[:, hi_dims], rtol=1e-6
    )
    if lo_dims.any():
        p = 31
        np.testing.assert_allclose(
            np.asarray(cos)[p, lo_dims],
            np.cos(p * inv[lo_dims] / f), rtol=1e-5, atol=1e-5
        )


def test_yarn_mscale_and_blend():
    D, L0, f = 64, 1024, 4.0
    sc = {"rope_type": "yarn", "factor": f,
          "original_max_position_embeddings": L0}
    cos, sin = rope_table(64, D, scaling=sc)
    mscale = 0.1 * math.log(f) + 1.0
    # position 0: cos(0)*mscale == mscale on every dim
    np.testing.assert_allclose(np.asarray(cos[0]), mscale, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(sin[0]), 0.0, atol=1e-7)
    # explicit attention_factor wins
    cos2, _ = rope_table(64, D, scaling={**sc, "attention_factor": 1.0})
    np.testing.assert_allclose(np.asarray(cos2[0]), 1.0, rtol=1e-6)


def test_unknown_type_raises():
    with pytest.raises(NotImplementedError):
        rope_table(16, 8, scaling={"rope_type": "mrope"})


def test_longrope_factors_and_mscale():
    """phi3 longrope: per-dim factor division + sqrt-log attention factor.
    Table longer than the original window uses long_factor; within it,
    short_factor."""
    D, L0 = 16, 32
    short = [1.0] * (D // 2)
    long = [1.0, 2.0, 4.0, 8.0, 1.5, 2.5, 3.5, 4.5]
    sc = {"rope_type": "longrope", "short_factor": short,
          "long_factor": long, "original_max_position_embeddings": L0}
    # extended table (64 > L0): long factors + mscale
    cos, sin = rope_table(64, D, theta=10000.0, scaling=sc)
    mscale = math.sqrt(1.0 + math.log(64 / L0) / math.log(L0))
    np.testing.assert_allclose(np.asarray(cos[0]), mscale, rtol=1e-6)
    inv = 1.0 / 10000.0 ** (np.arange(0, D, 2) / D) / np.asarray(long)
    p = 13
    np.testing.assert_allclose(
        np.asarray(cos[p]), np.cos(p * inv) * mscale, rtol=1e-5, atol=1e-5
    )
    # within the original window: short factors, no mscale
    cos_s, _ = rope_table(L0, D, theta=10000.0, scaling=sc)
    cos_ref, _ = rope_table(L0, D, theta=10000.0)
    np.testing.assert_allclose(
        np.asarray(cos_s), np.asarray(cos_ref), rtol=1e-6
    )
    # explicit attention_factor wins
    cos_af, _ = rope_table(64, D, scaling={**sc, "attention_factor": 1.0})
    np.testing.assert_allclose(np.asarray(cos_af[0]), 1.0, rtol=1e-6)


def test_longrope_config_roundtrip():
    """The per-dim factor lists survive ModelConfig normalization (tuples,
    hashable) and a JSON round trip."""
    hf = {"model_type": "phi3", "vocab_size": 128, "hidden_size": 64,
          "num_hidden_layers": 2, "num_attention_heads": 4,
          "num_key_value_heads": 4, "intermediate_size": 128,
          "max_position_embeddings": 64,
          "rope_scaling": {"rope_type": "longrope",
                           "short_factor": [1.0] * 8,
                           "long_factor": [2.0] * 8,
                           "original_max_position_embeddings": 32}}
    cfg = ModelConfig.from_hf_config(hf)
    hash(cfg)
    d = dict(cfg.rope_scaling)
    assert d["long_factor"] == (2.0,) * 8
    import json
    cfg2 = ModelConfig.from_dict(json.loads(json.dumps(cfg.to_dict())))
    assert cfg2.rope_scaling == cfg.rope_scaling
    # and the table builds from the normalized form
    cos, _ = rope_table(64, 16, scaling=cfg.rope_scaling)
    assert np.isfinite(np.asarray(cos)).all()


def test_config_normalizes_and_stays_hashable():
    hf = {"model_type": "llama", "vocab_size": 128, "hidden_size": 64,
          "num_hidden_layers": 2, "num_attention_heads": 4,
          "num_key_value_heads": 4, "intermediate_size": 128,
          "rope_theta": 500000.0,
          "rope_scaling": {"rope_type": "llama3", "factor": 8.0,
                           "low_freq_factor": 1.0, "high_freq_factor": 4.0,
                           "original_max_position_embeddings": 8192}}
    cfg = ModelConfig.from_hf_config(hf)
    assert isinstance(cfg.rope_scaling, tuple)
    hash(cfg)  # jit-static requirement
    # round trip through to_dict/from_dict (JSON turns tuples into lists)
    import json
    d = json.loads(json.dumps(cfg.to_dict()))
    cfg2 = ModelConfig.from_dict(d)
    assert cfg2.rope_scaling == cfg.rope_scaling
    # transformers-style {"type": "linear"} (pre-rope_type naming) works too
    cfg3 = ModelConfig.from_hf_config(
        {**hf, "rope_scaling": {"type": "linear", "factor": 2.0}}
    )
    assert dict(cfg3.rope_scaling)["type"] == "linear"
    # explicit default / missing => None
    assert ModelConfig.from_hf_config(
        {**hf, "rope_scaling": {"rope_type": "default"}}
    ).rope_scaling is None


def test_generate_with_llama3_scaling():
    cfg = ModelConfig(
        vocab_size=64, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64, rope_theta=500000.0,
        rope_scaling={"rope_type": "llama3", "factor": 8.0,
                      "low_freq_factor": 1.0, "high_freq_factor": 4.0,
                      "original_max_position_embeddings": 32},
    )
    from quick_tpu.models import init_float_params
    from quick_tpu.runtime import SamplingParams, generate

    params = init_float_params(cfg, jax.random.PRNGKey(0))
    out = generate(params, cfg, jnp.asarray([[1, 2, 3]], jnp.int32),
                   max_new_tokens=4,
                   sampling=SamplingParams(temperature=0.0))
    assert out.shape == (1, 7)
    # the scaled table actually differs from the unscaled one
    cfg0 = ModelConfig(**{**{f.name: getattr(cfg, f.name)
                             for f in __import__("dataclasses").fields(cfg)},
                          "rope_scaling": None, "head_dim": None})
    params0 = init_float_params(cfg0, jax.random.PRNGKey(0))
    assert not np.allclose(np.asarray(params.rope_cos),
                           np.asarray(params0.rope_cos))


def test_rope_scaling_survives_save_load(tmp_path):
    """Native save_quantized -> from_quantized round-trips rope_scaling
    (config.json stores the tuple form as a JSON list of pairs)."""
    import dataclasses
    from quick_tpu.config import QuantConfig
    from quick_tpu.models import init_quant_params
    from quick_tpu.utils.checkpoint import load_quantized, save_quantized

    cfg = ModelConfig(
        vocab_size=64, hidden_size=64, intermediate_size=128,
        num_hidden_layers=1, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64,
        rope_scaling={"type": "linear", "factor": 2.0},
    )
    params = init_quant_params(cfg, jax.random.PRNGKey(0), group_size=8)
    save_quantized(params, cfg, QuantConfig(q_group_size=8), str(tmp_path))
    _, cfg2, _ = load_quantized(str(tmp_path))
    assert cfg2.rope_scaling == cfg.rope_scaling


def test_top_level_original_length_injected():
    """HF stores original_max_position_embeddings at the config TOP level
    (phi3 longrope, dynamic NTK); from_hf_config must inject it into the
    scaling dict so rope_table's regime tests fire."""
    from quick_tpu import ModelConfig

    cfg = ModelConfig.from_hf_config({
        "model_type": "phi3", "hidden_size": 64, "num_attention_heads": 4,
        "num_hidden_layers": 1, "intermediate_size": 128, "vocab_size": 64,
        "max_position_embeddings": 256,
        "original_max_position_embeddings": 64,
        "rope_scaling": {
            "type": "longrope",
            "short_factor": [1.0] * 8, "long_factor": [4.0] * 8,
        },
    })
    d = dict(cfg.rope_scaling)
    assert d["original_max_position_embeddings"] == 64
    # 256 > 64 => the LONG factors must be used (inv_freq / 4)
    from quick_tpu.ops.rope import rope_table

    cos, _ = rope_table(256, 16, 10000.0, cfg.rope_scaling)
    cos_plain, _ = rope_table(256, 16, 10000.0, None)
    import math

    af = math.sqrt(1.0 + math.log(256 / 64) / math.log(64))
    np.testing.assert_allclose(
        np.asarray(cos[1]), af * np.cos(np.asarray(
            1.0 / (10000.0 ** (np.arange(0, 16, 2) / 16)) / 4.0
        )), rtol=1e-5,
    )
    assert not np.allclose(np.asarray(cos[1]), np.asarray(cos_plain[1]))


def test_dynamic_ntk_extends_table():
    """dynamic NTK configs keep max_position_embeddings at the ORIGINAL
    length; the static-table approximation extends it by the factor and
    rescales theta (previously the rescale never fired)."""
    from quick_tpu import ModelConfig

    cfg = ModelConfig.from_hf_config({
        "model_type": "llama", "hidden_size": 64, "num_attention_heads": 4,
        "num_hidden_layers": 1, "intermediate_size": 128, "vocab_size": 64,
        "max_position_embeddings": 64,
        "rope_scaling": {"type": "dynamic", "factor": 4.0},
    })
    assert cfg.max_position_embeddings == 256
    d = dict(cfg.rope_scaling)
    assert d["original_max_position_embeddings"] == 64
    from quick_tpu.ops.rope import rope_table

    cos, _ = rope_table(
        cfg.max_position_embeddings, 16, 10000.0, cfg.rope_scaling
    )
    cos_plain, _ = rope_table(256, 16, 10000.0, None)
    assert not np.allclose(np.asarray(cos[100]), np.asarray(cos_plain[100]))
