"""KV cache structures.

``KVCache`` is the dense preallocated cache (the TPU functional analog of the
reference's ``WindowedCache``, quick/awq/modules/fused/cache.py:3-59): one
[L, B, H_kv, S_max, D] pair updated in place via dynamic_update_slice under
jit, with a window-roll operation for parity with ``roll_kv_n_steps``
(cache.py:32-45). ``PagedKVCache`` (quick_tpu/modules/paged_cache.py) is the
production path with block tables; this dense cache is the simple/golden one.

The storage is HEAD-major (H before S) for the same reason the reference's
FasterTransformer cache is ``[bs, kvh, seq, hd]`` (fused/cache.py:9-12): the
attention dot's batch dims are (batch, kv-head), so a head-major cache feeds
the MXU directly — a seq-major cache forces XLA to re-transpose the whole
cache EVERY decode step (the cache changes each step, so the transpose
cannot hoist; measured ~150us/layer extra at 7B bs=64 decode,
tools/decode_breakdown.py).
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class KVCache:
    """Dense KV cache for all layers.

    k, v: [L, B, H_kv, S_max, D] (head-major, see module docstring);
    length: scalar int32 — number of valid positions (shared across batch;
    per-sequence lengths come with the paged cache / continuous batching).
    """

    k: jax.Array
    v: jax.Array
    length: jax.Array  # scalar int32

    @classmethod
    def create(
        cls, n_layers: int, batch: int, max_seq: int, n_kv: int, head_dim: int,
        dtype=jnp.bfloat16,
    ) -> "KVCache":
        shape = (n_layers, batch, n_kv, max_seq, head_dim)
        return cls(
            k=jnp.zeros(shape, dtype),
            v=jnp.zeros(shape, dtype),
            length=jnp.zeros((), jnp.int32),
        )

    @property
    def max_seq(self) -> int:
        return self.k.shape[3]

    def update(
        self, layer: int, k_new: jax.Array, v_new: jax.Array, start: jax.Array
    ) -> "KVCache":
        """Write k_new/v_new [B, S, H_kv, D] at position ``start`` of layer.

        Only the incoming tokens transpose to head-major — the cache itself
        never moves."""
        zeros = (jnp.zeros((), jnp.int32),) * 3
        idx = (
            jnp.asarray(layer, jnp.int32), zeros[0], zeros[1],
            jnp.asarray(start, jnp.int32), zeros[2],
        )
        kn = jnp.moveaxis(k_new, 1, 2)[None]  # [1, B, H, S, D]
        vn = jnp.moveaxis(v_new, 1, 2)[None]
        return dataclasses.replace(
            self,
            k=jax.lax.dynamic_update_slice(self.k, kn.astype(self.k.dtype), idx),
            v=jax.lax.dynamic_update_slice(self.v, vn.astype(self.v.dtype), idx),
        )

    def layer(self, i: int) -> Tuple[jax.Array, jax.Array]:
        """Layer ``i``'s K/V as [B, H_kv, S_max, D] (head-major)."""
        return self.k[i], self.v[i]

    def with_length(self, length) -> "KVCache":
        return dataclasses.replace(self, length=jnp.asarray(length, jnp.int32))

    def roll(self, n: int) -> "KVCache":
        """Discard the oldest ``n`` positions (window roll — parity with
        reference WindowedCache.roll_kv_n_steps, fused/cache.py:32-45)."""
        return dataclasses.replace(
            self,
            k=jnp.roll(self.k, -n, axis=3),
            v=jnp.roll(self.v, -n, axis=3),
            length=jnp.maximum(self.length - n, 0),
        )
