"""Calibration data loading (analog of quick/awq/utils/calib_data.py:6-55).

The reference pulls `mit-han-lab/pile-val-backup` by default and slices
512-token blocks. This environment is zero-egress, so the loader accepts —
in priority order — pre-tokenized arrays, lists of strings + a tokenizer, a
local HF dataset path, and finally a deterministic synthetic fallback so the
pipeline always runs hermetically.
"""
from __future__ import annotations

from typing import List, Optional, Sequence, Union

import numpy as np


def get_calib_tokens(
    data: Union[None, np.ndarray, Sequence[str]] = None,
    tokenizer=None,
    n_samples: int = 128,
    block_size: int = 512,
    vocab_size: int = 32000,
    dataset_path: Optional[str] = None,
    text_column: str = "text",
    seed: int = 0,
) -> np.ndarray:
    """Return calibration tokens [n_blocks, block_size] int32.

    - ``data`` as an int array: re-blocked to shape.
    - ``data`` as strings + ``tokenizer``: tokenized then blocked
      (reference calib_data.py:23-52 block logic: concatenate then split).
    - ``dataset_path``: local HF dataset (datasets.load_from_disk).
    - otherwise: synthetic tokens (hermetic fallback; no reference analog —
      the reference requires network access).
    """
    if data is not None and not isinstance(data, (list, tuple)):
        arr = np.asarray(data, dtype=np.int32)
        flat = arr.reshape(-1)
        n_blocks = min(n_samples, len(flat) // block_size)
        if n_blocks == 0:
            raise ValueError(
                f"need at least {block_size} tokens, got {len(flat)}"
            )
        return flat[: n_blocks * block_size].reshape(n_blocks, block_size)

    texts: Optional[List[str]] = None
    if isinstance(data, (list, tuple)):
        texts = list(data)
    elif dataset_path is not None:
        import datasets

        ds = datasets.load_from_disk(dataset_path)
        texts = [r[text_column] for r in ds.select(range(min(len(ds), 2 * n_samples)))]

    if texts is not None:
        if tokenizer is None:
            raise ValueError("tokenizer required for string calibration data")
        ids: List[int] = []
        for t in texts:
            ids.extend(tokenizer.encode(t))
            if len(ids) >= n_samples * block_size:
                break
        return get_calib_tokens(
            np.asarray(ids, np.int32), n_samples=n_samples,
            block_size=block_size,
        )

    # synthetic fallback: zipfian token draw (roughly language-like ranks)
    rng = np.random.default_rng(seed)
    ranks = rng.zipf(1.3, size=(n_samples, block_size))
    return (ranks % vocab_size).astype(np.int32)
