"""Load the reference implementation's pure-torch modules for parity tests.

The reference at /root/reference (SqueezeBits/QUICK) predates the installed
transformers; its package ``__init__`` chain also imports CUDA extensions
that don't exist here. This helper imports the *leaf* modules we need for
cross-implementation numerics parity without executing the package
``__init__.py`` bodies:

- package shells with ``__path__`` pointing into /root/reference are
  pre-registered in sys.modules, so ``import quick.awq.quantize.quantizer``
  resolves the leaf file directly;
- ``quick_kernels`` (the CUDA pybind module, csrc/pybind.cpp:5-8) is stubbed —
  parity tests only exercise the pure-torch paths (pseudo-quantize, packing,
  scale/clip search, the WQLinear_GEMM torch fallback at linear/gemm.py:174);
- three names the reference imports that modern transformers removed are
  shimmed (``shard_checkpoint`` — only used by save_quantized, which we never
  call — and two GELU activation classes used only for isinstance dispatch in
  quantize/scale.py:12).

Everything loaded from /root/reference is treated as data under test, not as
framework code: tests call specific functions on controlled inputs.
"""
from __future__ import annotations

import importlib
import os
import sys
import types

REF_ROOT = "/root/reference"

_PACKAGES = [
    ("quick", "quick"),
    ("quick.awq", "quick/awq"),
    ("quick.awq.utils", "quick/awq/utils"),
    ("quick.awq.quantize", "quick/awq/quantize"),
    ("quick.awq.modules", "quick/awq/modules"),
    ("quick.awq.modules.linear", "quick/awq/modules/linear"),
    ("quick.awq.modules.fused", "quick/awq/modules/fused"),
    ("quick.awq.models", "quick/awq/models"),
]

_installed = False


def _install() -> None:
    global _installed
    if _installed:
        return
    import torch.nn as nn

    if "quick_kernels" not in sys.modules:
        qk = types.ModuleType("quick_kernels")

        def _no_cuda(*a, **k):  # pragma: no cover - never called in parity tests
            raise RuntimeError("quick_kernels stub: no CUDA in this environment")

        qk.gemm_forward_cuda_quick = _no_cuda
        sys.modules["quick_kernels"] = qk

    for pkg, sub in _PACKAGES:
        if pkg not in sys.modules:
            m = types.ModuleType(pkg)
            m.__path__ = [os.path.join(REF_ROOT, sub)]
            sys.modules[pkg] = m

    import transformers.activations as ta
    import transformers.modeling_utils as mu

    if not hasattr(mu, "shard_checkpoint"):
        def _gone(*a, **k):  # pragma: no cover
            raise NotImplementedError("shard_checkpoint removed from transformers")

        mu.shard_checkpoint = _gone
    for name in ("NewGELUActivation", "PytorchGELUTanh", "GELUActivation"):
        if not hasattr(ta, name):
            setattr(ta, name, type(name, (nn.Module,), {}))
    _installed = True


def load_ref(module: str):
    """Import e.g. 'quick.awq.quantize.quantizer' from /root/reference."""
    _install()
    return importlib.import_module(module)


import contextlib


@contextlib.contextmanager
def gpu_faithful_state_dict():
    """The reference's scale search snapshots weights with
    ``{k: v.cpu() for ...}`` (quantizer.py:238) and restores via
    load_state_dict after each grid point. On CUDA ``.cpu()`` copies; on CPU
    it ALIASES, so the snapshot is corrupted by the in-place ``mul_`` and the
    search drifts. Cloning in state_dict() reproduces the reference's
    GPU-faithful semantics when driving its code on CPU."""
    import torch.nn as nn

    orig = nn.Module.state_dict

    def cloned(self, *a, **k):
        out = orig(self, *a, **k)
        return type(out)(
            (kk, vv.clone() if hasattr(vv, "clone") else vv)
            for kk, vv in out.items()
        )

    nn.Module.state_dict = cloned
    try:
        yield
    finally:
        nn.Module.state_dict = orig


def make_ref_quantizer(w_bit: int = 4, group_size: int = 128,
                       duo_scaling: bool = True):
    """An AwqQuantizer instance without running its __init__ (which would
    load calib data + run a model); only the attributes the numerics
    methods read (quantizer.py:46-72, 181-350) are set."""
    quantizer = load_ref("quick.awq.quantize.quantizer")
    q = object.__new__(quantizer.AwqQuantizer)
    q.w_bit = w_bit
    q.group_size = group_size
    q.duo_scaling = duo_scaling
    q.modules_to_not_convert = []
    q.export_compatible = False
    q.version = "GEMM"
    return q
