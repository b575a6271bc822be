"""Measure the KL cost of RTN-only MLA attention quantization.

The MLA quantize path (quantize/awq.py::awq_quantize_mla_block) packs the
attention projections RTN-only — no AWQ scale fold — while the MLP gets the
full scale+clip search. This script isolates what that choice costs on a
deepseek-v2-lite-shaped random model with injected activation-outlier
channels (the regime AWQ scaling exists for):

  fp     — float model
  full   — current pipeline (RTN attention + AWQ MLP)
  no-att — attention left FLOAT, AWQ MLP   (isolates attention quant cost)
  no-mlp — MLP left FLOAT, RTN attention   (the attention cost alone)

Run: PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python tools/mla_rtn_kl.py
Numbers recorded in TODO_TPU.md (VERDICT round-2 task 7).
"""
import sys; sys.path.insert(0, ".")  # noqa: E702
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from quick_tpu import ModelConfig, QuantConfig
from quick_tpu.models.model import init_float_params, model_forward
from quick_tpu.quantize.awq import awq_quantize_model

RNG = np.random.default_rng(0)


def mean_token_kl(p_logits, q_logits):
    p = jax.nn.log_softmax(jnp.asarray(p_logits, jnp.float32), -1)
    q = jax.nn.log_softmax(jnp.asarray(q_logits, jnp.float32), -1)
    return float(jnp.mean(jnp.sum(jnp.exp(p) * (p - q), -1)))


def run(q_lora_rank, label):
    cfg = ModelConfig(
        model_type="deepseek_v2", vocab_size=512, hidden_size=256,
        intermediate_size=512, num_hidden_layers=4, num_attention_heads=8,
        num_key_value_heads=8, max_position_embeddings=256,
        kv_lora_rank=64, qk_nope_head_dim=32, qk_rope_head_dim=16,
        v_head_dim=32, head_dim=48, rotary_dim=16,
        q_lora_rank=q_lora_rank,
        # v2-lite MoE shape: dense layer 0, MoE after, shared experts
        num_local_experts=4, num_experts_per_tok=2, n_shared_experts=1,
        moe_intermediate_size=128, first_k_dense_replace=1,
    )
    params = init_float_params(cfg, jax.random.PRNGKey(0), jnp.float32)
    # outlier channels: real LLM activations have a few channels 10-100x
    # hotter than the rest (the premise of AWQ); random init has none, so
    # inject via the embedding table
    embed = np.array(params.embed)  # writable copy
    hot = RNG.choice(cfg.hidden_size, 8, replace=False)
    embed[:, hot] *= 8.0
    params = dataclasses.replace(params, embed=jnp.asarray(embed))

    calib = jnp.asarray(RNG.integers(0, 512, (2, 256)), jnp.int32)
    evaltoks = jnp.asarray(RNG.integers(0, 512, (2, 128)), jnp.int32)
    fp_logits, _ = model_forward(params, cfg, evaltoks)

    qcfg = QuantConfig(q_group_size=32)
    results = {}
    for name, skip in [
        ("full", None),
        ("no-att", ["qkv", "o"]),
        ("no-mlp", ["gate_up", "down"]),
    ]:
        qc = qcfg if skip is None else dataclasses.replace(
            qcfg, modules_to_not_convert=skip
        )
        qp = awq_quantize_model(params, cfg, calib, qc, verbose=False)
        ql, _ = model_forward(qp, cfg, evaltoks)
        results[name] = mean_token_kl(fp_logits, ql)
    print(f"[{label}] q_lora_rank={q_lora_rank}")
    for k, v in results.items():
        print(f"  KL(fp || {k:6s}) = {v:.5f}")
    att = results["no-mlp"]
    mlp = results["no-att"]
    print(f"  attention-RTN share of full: {att / max(results['full'], 1e-9):.1%} "
          f"(attn alone {att:.5f} vs mlp alone {mlp:.5f})")
    return results


if __name__ == "__main__":
    run(None, "v2-lite-shaped")
    run(64, "v2/v3-shaped (q_lora)")
