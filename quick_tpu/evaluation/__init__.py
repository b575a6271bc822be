from quick_tpu.evaluation.kl_divergence import KLReport, eval_kl_divergence
from quick_tpu.evaluation.ppl import evaluate_perplexity

__all__ = ["evaluate_perplexity", "eval_kl_divergence", "KLReport"]
