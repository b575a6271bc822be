"""KL-divergence + top-k agreement between a reference and a test model.

Analog of quick/awq/evaluation/kl_divergence.py:38-124 — the reference's
closest thing to a numerics regression test (SURVEY.md section 4). Compares
per-position logit distributions of two models on the same tokens and
reports mean KL, top-1/top-k agreement with normal-approximation confidence
intervals."""
from __future__ import annotations

import dataclasses
import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from quick_tpu.config import ModelConfig
from quick_tpu.models.model import ModelParams, model_forward


@dataclasses.dataclass
class KLReport:
    mean_kl: float
    kl_ci95: Tuple[float, float]
    top1_agreement: float
    top1_ci95: Tuple[float, float]
    topk_agreement: float  # reference top-1 within test top-k
    n_positions: int
    k: int

    def __str__(self):
        return (
            f"KL {self.mean_kl:.5f} [{self.kl_ci95[0]:.5f}, {self.kl_ci95[1]:.5f}] | "
            f"top-1 agree {self.top1_agreement:.3f} | "
            f"top-{self.k} contain {self.topk_agreement:.3f} | "
            f"n={self.n_positions}"
        )


@functools.partial(jax.jit, static_argnames=("cfg_ref", "cfg_test", "k"))
def _kl_window(params_ref, cfg_ref, params_test, cfg_test, tokens, k: int):
    lr, _ = model_forward(params_ref, cfg_ref, tokens)
    lt, _ = model_forward(params_test, cfg_test, tokens)
    pr = jax.nn.log_softmax(lr.astype(jnp.float32), axis=-1)
    pt = jax.nn.log_softmax(lt.astype(jnp.float32), axis=-1)
    kl = jnp.sum(jnp.exp(pr) * (pr - pt), axis=-1).reshape(-1)  # [T]
    ref_top1 = jnp.argmax(pr, axis=-1).reshape(-1)
    test_top1 = jnp.argmax(pt, axis=-1).reshape(-1)
    top1 = (ref_top1 == test_top1).astype(jnp.float32)
    _, test_topk = jax.lax.top_k(pt.reshape(-1, pt.shape[-1]), k)
    topk = jnp.any(test_topk == ref_top1[:, None], axis=-1).astype(jnp.float32)
    return kl, top1, topk


def eval_kl_divergence(
    params_ref: ModelParams,
    cfg_ref: ModelConfig,
    params_test: ModelParams,
    cfg_test: ModelConfig,
    tokens: np.ndarray,
    seqlen: int = 512,
    k: int = 5,
) -> KLReport:
    flat = np.asarray(tokens, np.int32).reshape(-1)
    if len(flat) < 2:
        raise ValueError(
            f"need at least 2 tokens for a KL window, got {len(flat)}"
        )
    n_win = max(len(flat) // seqlen, 1)
    seqlen = min(seqlen, len(flat))
    kls, top1s, topks = [], [], []
    for i in range(n_win):
        w = jnp.asarray(flat[i * seqlen : (i + 1) * seqlen])[None]
        kl, t1, tk = _kl_window(params_ref, cfg_ref, params_test, cfg_test, w, k)
        kls.append(np.asarray(kl))
        top1s.append(np.asarray(t1))
        topks.append(np.asarray(tk))
    kl = np.concatenate(kls)
    top1 = np.concatenate(top1s)
    topk = np.concatenate(topks)
    n = len(kl)

    def ci(v):
        m = v.mean()
        half = 1.96 * v.std(ddof=1) / np.sqrt(n) if n > 1 else 0.0
        return float(m - half), float(m + half)

    return KLReport(
        mean_kl=float(kl.mean()),
        kl_ci95=ci(kl),
        top1_agreement=float(top1.mean()),
        top1_ci95=ci(top1),
        topk_agreement=float(topk.mean()),
        n_positions=n,
        k=k,
    )
