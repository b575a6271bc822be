from quick_tpu.runtime.generate import (
    SamplingParams,
    beam_generate,
    decode_loop,
    decode_step,
    generate,
    make_cache,
    prefill,
)
from quick_tpu.runtime.serving import Engine, Request
from quick_tpu.runtime.speculative import speculative_generate

__all__ = [
    "SamplingParams",
    "beam_generate",
    "prefill",
    "decode_step",
    "decode_loop",
    "generate",
    "make_cache",
    "Engine",
    "Request",
    "speculative_generate",
]
