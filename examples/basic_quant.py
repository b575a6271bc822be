"""Quantize a model and save the packed checkpoint.

Analog of reference examples/basic_quant.py:6-36:

    python examples/basic_quant.py --model_path <hf_dir> --quant_path out/ \
        --calib_tokens calib.npy

Works hermetically too: --random <preset> builds a random-init model.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp
import numpy as np

from quick_tpu import ModelConfig, QuantConfig
from quick_tpu.models.auto import AutoQuickModel
from quick_tpu.quantize.calib import get_calib_tokens

PRESETS = {
    "tinyllama": ModelConfig(
        vocab_size=32000, hidden_size=2048, intermediate_size=5632,
        num_hidden_layers=22, num_attention_heads=32, num_key_value_heads=4,
        max_position_embeddings=2048,
    ),
    "mistral-7b": ModelConfig(
        vocab_size=32000, hidden_size=4096, intermediate_size=14336,
        num_hidden_layers=32, num_attention_heads=32, num_key_value_heads=8,
        max_position_embeddings=4096, model_type="mistral",
    ),
    "debug": ModelConfig(
        vocab_size=1024, hidden_size=256, intermediate_size=512,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256,
    ),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model_path", help="HF float checkpoint directory")
    ap.add_argument("--random", choices=sorted(PRESETS),
                    help="random-init preset instead of a checkpoint")
    ap.add_argument("--quant_path", required=True)
    ap.add_argument("--calib_tokens", help=".npy of pre-tokenized calib data")
    ap.add_argument("--zero_point", type=int, default=1)
    ap.add_argument("--q_group_size", type=int, default=128)
    ap.add_argument("--w_bit", type=int, default=4)
    ap.add_argument("--no_awq_search", action="store_true",
                    help="plain RTN instead of AWQ scale/clip search")
    ap.add_argument("--n_calib_samples", type=int, default=32)
    ap.add_argument("--calib_block", type=int, default=512)
    args = ap.parse_args()

    if args.random:
        model = AutoQuickModel.from_random(PRESETS[args.random])
    elif args.model_path:
        model = AutoQuickModel.from_pretrained(args.model_path)
    else:
        ap.error("need --model_path or --random")

    qcfg = QuantConfig(
        zero_point=bool(args.zero_point),
        q_group_size=args.q_group_size,
        w_bit=args.w_bit,
    )
    calib = None
    if not args.no_awq_search:
        data = np.load(args.calib_tokens) if args.calib_tokens else None
        calib = jnp.asarray(get_calib_tokens(
            data, n_samples=args.n_calib_samples,
            block_size=min(args.calib_block, model.cfg.max_position_embeddings),
            vocab_size=model.cfg.vocab_size,
        ))

    model.quantize(calib, qcfg, use_awq_search=not args.no_awq_search)
    model.save_quantized(args.quant_path)
    print(f"quantized model saved to {args.quant_path}")


if __name__ == "__main__":
    main()
