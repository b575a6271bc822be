"""Continuous-batching inference engine over the paged KV cache.

The reference serves through HF ``model.generate`` with a fixed batch
(quick/awq/models/base.py:87-89) — every sequence in a batch must share its
lifetime. This engine replaces that with the TPU-native serving loop the
port target mandates (SURVEY.md sections 2.3 and 5): requests are admitted
and retired independently (continuous batching), and prefill is CHUNKED so
one compiled step function serves every mix of prefilling and decoding
slots — no separate prefill/decode programs, no recompiles, static shapes.

Per step, each active slot contributes up to ``chunk`` tokens: a prefilling
slot consumes the next ``chunk`` prompt tokens, a decoding slot contributes
its single last sampled token, and idle slots contribute padding that lands
on the trash page. Scheduling (admission, page allocation, retirement) is
host-side; everything numeric is one jitted XLA program.
"""
from __future__ import annotations

import dataclasses
from collections import deque
from typing import Callable, Deque, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from quick_tpu.config import ModelConfig
from quick_tpu.models.model import ModelParams, model_forward
from quick_tpu.modules.paged_cache import PageAllocator, PagedKVCache


@dataclasses.dataclass
class Request:
    uid: int
    prompt: List[int]
    max_new_tokens: int
    eos_token_id: Optional[int] = None
    # additional stop tokens (any hit ends the request, like HF generate's
    # ``eos_token_id`` list form / vLLM's ``stop_token_ids``)
    stop_token_ids: Optional[frozenset] = None
    # streaming: called as on_token(uid, token_id) for every token the
    # scheduler DELIVERS (fused decode windows deliver in bursts of up to
    # ``decode_window`` tokens — that batching is the engine's throughput
    # mechanism, not a buffering artifact)
    on_token: Optional[Callable[[int, int], None]] = None
    # per-request SamplingParams (vLLM-style): None falls back to the
    # engine-wide default. Heterogeneous rows share one program — see
    # runtime/generate.py::sample_token_rows
    sampling: Optional[tuple] = None
    # runtime state
    output: List[int] = dataclasses.field(default_factory=list)
    # OpenAI logit_bias: {token_id: additive bias} applied to every
    # sampling distribution of this request (needs enable_penalties —
    # it rides the same per-slot device state)
    logit_bias: Optional[dict] = None
    # per delivered token: logprob under the (post-penalty) model
    # distribution, and — when Engine(logprobs_topk=K) — the top-K
    # [(token_id, logprob), ...] alternatives at that step
    logprobs: List[float] = dataclasses.field(default_factory=list)
    top_logprobs: List[list] = dataclasses.field(default_factory=list)
    prefill_cursor: int = 0
    aborted: bool = False
    # prefix caching (runtime/prefix_cache.py): chain hashes of the
    # prompt's shareable full pages, and how many leading pages this
    # request REUSES from the index (those are never re-registered)
    page_hashes: List[int] = dataclasses.field(default_factory=list)
    n_reused: int = 0
    # preemption-by-recompute (reserve="optimistic"): how many FEED tokens
    # (prompt + already-delivered output) prefill must cover. None means
    # len(prompt) (fresh request). A preempted request requeues with
    # resume_len = len(prompt) + len(output): its context is rebuilt by
    # ordinary chunked prefill over prompt+output, and only NEW samples are
    # emitted — delivered tokens are never re-emitted.
    resume_len: Optional[int] = None
    # output length at preemption time: after a resume the slot may only
    # decode once output has grown PAST this (the prefill-completion sample
    # landed) — its pre-preemption output[-1] was already fed before the
    # preemption and feeding it again would shift the stream by one
    resume_out: int = 0
    admit_seq: int = 0  # admission order; preemption evicts the youngest
    # cached [7] f32 sampling row (temp, top_k, top_p, min_p, rep, freq,
    # pres) — built once per request; _samp_rows at 128 slots was 412 us of
    # per-dispatch Python without it
    _samp_np: Optional[object] = dataclasses.field(default=None, repr=False)
    #: scheduling priority (higher admits first; ties FIFO). Preemption
    #: evicts the lowest-priority slot first, youngest within a priority.
    priority: int = 0

    @property
    def _resume(self) -> int:
        return len(self.prompt) if self.resume_len is None else self.resume_len

    def feed(self, lo: int, hi: int) -> List[int]:
        """Tokens [lo:hi) of the prefill feed (prompt, then — after a
        preemption — the already-generated output)."""
        if hi <= len(self.prompt):
            return self.prompt[lo:hi]
        return (self.prompt + self.output)[lo:hi]

    @property
    def prefill_done(self) -> bool:
        return self.prefill_cursor >= self._resume

    @property
    def done(self) -> bool:
        if self.aborted or len(self.output) >= self.max_new_tokens:
            return True
        if not self.output:
            return False
        last = self.output[-1]
        if self.eos_token_id is not None and last == self.eos_token_id:
            return True
        return bool(self.stop_token_ids) and last in self.stop_token_ids


class Engine:
    """Continuous-batching engine.

    Usage::

        eng = Engine(params, cfg, max_slots=4, max_seq=512)
        eng.submit([1, 2, 3], max_new_tokens=32)
        outputs = eng.run()          # {uid: [token, ...]}
    """

    def __init__(
        self,
        params: ModelParams,
        cfg: ModelConfig,
        max_slots: int = 4,
        max_seq: int = 512,
        page_size: int = 64,  # 64 is the TPU sweet spot: the paged-attention
        # kernel's per-grid-step overhead amortizes over a [Hkv, 64, D] DMA
        # (~586 GB/s effective KV stream at 7B shapes; 16 -> ~115 GB/s)
        chunk: int = 16,
        n_pages: Optional[int] = None,
        dtype=jnp.bfloat16,  # jnp.int8 -> INT8-quantized KV pages with
        # per-token-per-head scales: ~2x KV capacity per chip (no reference
        # analog — its FT cache is fp16). Capacity feature, not a speed one:
        # the decode kernel is per-step-compute bound at page=64, and the
        # in-kernel i8->bf16 convert costs ~1.5x step time at 8x1k ctx
        # (tools/int8_kv_check.py) — use when KV HBM is the binding
        # constraint (long contexts / many slots)
        mesh=None,  # jax Mesh with a "model" axis -> TP-sharded serving;
        # params must already be sharded (parallel.shard_params)
        sampling=None,  # SamplingParams; default greedy
        seed: int = 0,
        decode_window: int = 8,  # decode-only steps dispatched as ONE
        # device program (on-device token feedback, one host sync per
        # window — the vLLM "multi-step scheduling" idea, no reference
        # analog). Slots that finish mid-window compute discarded junk for
        # the window's remainder. 1 restores step-at-a-time behavior.
        # Greedy outputs are identical either way (tests/test_serving.py).
        prefill_rows: int = 8,  # sub-batch width of the decoupled prefill
        # program: admissions prefill through a
        # [prefill_rows, chunk] program over gathered slot metadata while
        # decode windows keep running — see step()
        prefix_cache: bool = True,  # automatic prefix caching: requests
        # sharing a prompt prefix reuse its KV pages and skip recomputing
        # it (runtime/prefix_cache.py); retired prompts stay warm in an
        # LRU until allocation pressure evicts them
        logprobs_topk: int = 0,  # also return the top-K (token, logprob)
        # alternatives per delivered token (OpenAI `logprobs`/
        # `top_logprobs`). The sampled token's own logprob is ALWAYS
        # recorded (Request.logprobs) — it rides the token fetch as a
        # bitcast lane, zero extra host syncs; top-K adds one [B, W, K, 2]
        # fetch per window, so it is opt-in.
        enable_penalties: bool = False,  # per-request history penalties
        # (repetition/frequency/presence) + min_p: maintains a [B, V]
        # generated-token count and a prompt-token mask ON DEVICE (vLLM's
        # penalty state). Opt-in because the buffers cost B*V*5 bytes and
        # add a scatter per program — the default hot path is untouched.
        reserve: str = "full",  # page reservation policy:
        # "full" — admission reserves pages for prompt + max_new_tokens
        #   up-front; a slot can never run out mid-decode.
        # "optimistic" — admission reserves only the prompt + a decode
        #   window of headroom; slots GROW page-by-page as they decode, and
        #   on pool exhaustion the youngest slot is PREEMPTED: its pages are
        #   released and the request requeues, rebuilding prompt+output by
        #   ordinary chunked prefill on re-admission (vLLM's
        #   preemption-by-recompute; with prefix caching on, the preempted
        #   prompt's pages usually survive warm in the LRU, so the rebuild
        #   skips them). Raises occupancy when max_new_tokens is a
        #   pessimistic bound — delivered tokens and greedy outputs are
        #   identical to "full".
    ):
        from quick_tpu.runtime.generate import SamplingParams

        self.sampling = sampling or SamplingParams()
        self._key = jax.random.PRNGKey(seed)
        self.params = params
        self.cfg = cfg
        self.max_slots = max_slots
        self.chunk = chunk
        self.page_size = page_size
        pages_per_seq = (max_seq + page_size - 1) // page_size
        if n_pages is None:
            n_pages = max_slots * pages_per_seq + 1  # +1 trash page
        if cfg.is_mla:
            # deepseek MLA: paged LATENT cache — k plane is the shared
            # rope'd k_pe, v plane the compressed latent; one "head" (MQA).
            # kv_lora_rank + qk_rope_head_dim floats/token regardless of
            # head count (~14x less page HBM than expanded MHA at v2/v3)
            self.cache = PagedKVCache.create(
                cfg.num_hidden_layers, n_pages, page_size, max_slots,
                max_seq, 1, cfg.qk_rope_head_dim, dtype,
                v_head_dim=cfg.kv_lora_rank,
            )
        else:
            self.cache = PagedKVCache.create(
                cfg.num_hidden_layers, n_pages, page_size, max_slots,
                max_seq, cfg.num_key_value_heads, cfg.head_dim, dtype,
            )
        if reserve not in ("full", "optimistic"):
            raise ValueError(f"reserve must be 'full'|'optimistic': {reserve}")
        self.optimistic = reserve == "optimistic"
        self.topk = int(logprobs_topk)
        self.penalties = enable_penalties
        if getattr(self.sampling, "has_penalties", False) and not enable_penalties:
            raise ValueError(
                "history penalties need Engine(enable_penalties=True)"
            )
        if enable_penalties:
            self.counts = jnp.zeros((max_slots, cfg.vocab_size), jnp.int32)
            self.pseen = jnp.zeros((max_slots, cfg.vocab_size), jnp.int8)
            # per-slot additive logit bias (OpenAI logit_bias; zero = off)
            self.lbias = jnp.zeros((max_slots, cfg.vocab_size), jnp.float32)
        self.alloc = PageAllocator(n_pages)
        self._admit_seq = 0
        if prefix_cache:
            from quick_tpu.runtime.prefix_cache import PrefixCache

            self.prefix: Optional[PrefixCache] = PrefixCache(self.alloc)
        else:
            self.prefix = None
        self.queue: Deque[Request] = deque()
        self.slots: List[Optional[Request]] = [None] * max_slots
        self.slot_pages: List[List[int]] = [[] for _ in range(max_slots)]
        self.finished: Dict[int, List[int]] = {}
        self.requests: Dict[int, Request] = {}
        self._uid = 0
        self.decode_window = max(1, decode_window)
        self.prefill_rows = max(1, min(prefill_rows, max_slots))
        # pipelined decode window: (device tokens [B, W], slot snapshot,
        # valid mask) dispatched but not yet drained — see _dispatch_window
        self._inflight = None
        # un-fetched first-token samples from completed prefills:
        # (device [P] sampled, [(row, slot, request)]) — see _drain_pending
        self._pending = []
        # scheduler observability (the reference has no metrics subsystem;
        # SURVEY.md section 5): program dispatch counts by kind, token
        # totals, and occupancy-weighted step counts
        # wall-clock phase accounting (QUICK_TPU_ENGINE_TIMING=1): where a
        # serving step actually spends host time — admission/scheduling,
        # program dispatch, or BLOCKED on device fetches (every np.asarray
        # is a full tunnel round-trip). tools/serve_bench.py prints it;
        # the decode-window host-sync audit rides on these numbers.
        import os as _os
        import time as _time

        self._clock = _time.perf_counter
        self._timed = _os.environ.get("QUICK_TPU_ENGINE_TIMING") == "1"
        # device-queue accounting: every program dispatch bumps the seq;
        # a fetch of a program with a HIGHER-seq program dispatched behind
        # it blocks the host while the device keeps computing (healthy,
        # "overlapped"); a fetch with nothing queued behind it idles the
        # device for the fetch round-trip ("serial" — the device-serialism
        # VERDICT r3 flagged). serve_bench prints the split.
        self._dispatch_seq = 0
        self.timing = {
            "admit": 0.0,           # host-side admission + page allocation
            "window_dispatch": 0.0,  # fused decode window dispatch path
            "window_fetch": 0.0,     # blocked fetching a window's tokens
            "window_fetch_serial": 0.0,  # ... with an empty device queue
            "prefill_dispatch": 0.0,  # decoupled prefill sub-batch dispatch
            "pending_fetch": 0.0,    # blocked fetching prefill samples
            "pending_fetch_serial": 0.0,  # ... with an empty device queue
            "mixed": 0.0,            # padded mixed step (dispatch + fetch)
        }
        self.stats = {
            "steps": 0,            # scheduler turns
            "window_steps": 0,     # fused decode-window dispatches
            "prefill_substeps": 0,  # decoupled [P, chunk] dispatches
            "mixed_steps": 0,      # padded [B, chunk] / [B, 1] dispatches
            "tokens_out": 0,       # sampled tokens delivered to requests
            "prompt_tokens": 0,    # prompt tokens consumed by prefill
            "admitted": 0,
            "retired": 0,
            "decode_slot_steps": 0,  # sum over windows of ready-slots * W
            "prefix_hit_tokens": 0,  # prompt tokens served from the index
            "preemptions": 0,        # slots evicted for pages (optimistic)
        }

        self._tp = mesh is not None
        if mesh is not None:
            # TP serving: the SAME step/window/prefill programs as
            # single-chip — only the forward is swapped for a shard_map'd
            # one (per-shard heads, psum'd projections). Sampling, logprobs,
            # top-k and penalties run replicated on the [B, V] row logits
            # every shard returns, so all shards sample identical tokens.
            from jax.sharding import NamedSharding
            from quick_tpu.parallel.sharding import (
                paged_cache_spec,
                sharded_row_forward_fn,
            )

            self.cache = jax.tree_util.tree_map(
                lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
                self.cache,
                paged_cache_spec(quantized=self.cache.quantized, cfg=cfg),
            )
            fwd_row = sharded_row_forward_fn(
                cfg, mesh, params, kv_quantized=self.cache.quantized
            )
        else:

            def fwd_row(params, cache, tokens, valid):
                """(row logits [B, V] at each row's last valid token, cache)."""
                logits, cache = model_forward(
                    params, cfg, tokens, cache, advance=valid,
                    last_valid=valid,  # head runs on ONE position per row
                )
                return logits[:, 0], cache

        from quick_tpu.runtime.generate import (
            apply_penalties,
            sample_token_rows,
        )
        PEN, K = self.penalties, self.topk
        bits = jax.lax.bitcast_convert_type

        def _draw(row, temps, tks, tps, key, minps):
            """Sample one token per row and account its logprob under
            the (post-penalty) distribution. Returns {"tl": [B, 2] i32
            (token, bitcast-f32 logprob)} plus, when K > 0,
            {"tk": [B, K, 2] i32 (id, bitcast-f32 logprob)} — packed
            int32 planes so the host fetches ONE array per result
            (every fetch is a full tunnel round-trip)."""
            s = sample_token_rows(row, temps, tks, tps, key, minps)
            rf = row.astype(jnp.float32)
            lse = jax.nn.logsumexp(rf, axis=-1)
            lp = jnp.take_along_axis(rf, s[:, None], axis=-1)[:, 0] - lse
            out = {"tl": jnp.stack([s, bits(lp, jnp.int32)], axis=-1)}
            if K:
                tv, ti = jax.lax.top_k(rf, K)
                out["tk"] = jnp.stack(
                    [ti, bits(tv - lse[:, None], jnp.int32)], axis=-1
                )
            return out

        if PEN:

            def step_fn(params, cache, tokens, valid, key, temps, tks,
                        tps, minps, reps, freqs, press, emit, counts,
                        pseen, lbias):
                row, cache = fwd_row(params, cache, tokens, valid)
                row = apply_penalties(
                    row, counts, pseen, reps, freqs, press,
                ) + lbias
                d = _draw(row, temps, tks, tps, key, minps)
                # count only samples the host will DELIVER (decode rows
                # and prefill completions — junk/padding rows add 0)
                counts = counts.at[
                    jnp.arange(valid.shape[0]), d["tl"][:, 0]
                ].add(emit)
                return d, cache, counts
        else:

            def step_fn(params, cache, tokens, valid, key, temps, tks,
                        tps, minps):
                row, cache = fwd_row(params, cache, tokens, valid)
                d = _draw(row, temps, tks, tps, key, minps)
                return d, cache

        # donate the cache so XLA aliases k_pages/v_pages in place instead of
        # copying GBs of cache every step (and the counts plane likewise)
        self._step_fn = jax.jit(
            step_fn,
            donate_argnums=(1, 13) if self.penalties else (1,),
        )

        if PEN:

            def window_fn(params, cache, tokens, valid, key,
                          temps, tks, tps, d, minps, reps, freqs,
                          press, counts, pseen, lbias):
                B = tokens.shape[0]

                def body(i, carry):
                    tokens, cache, tl, tk, key, counts = carry
                    key, sub = jax.random.split(key)
                    row, cache = fwd_row(params, cache, tokens, valid)
                    row = apply_penalties(
                        row, counts, pseen, reps, freqs, press
                    ) + lbias
                    dr = _draw(row, temps, tks, tps, sub, minps)
                    nxt = dr["tl"][:, 0]
                    # every valid row's sample is deliverable (junk
                    # past done is cleaned up at the next admission)
                    counts = counts.at[jnp.arange(B), nxt].add(valid)
                    tl = jax.lax.dynamic_update_slice(
                        tl, dr["tl"][:, None, :], (0, i, 0)
                    )
                    if K:
                        tk = jax.lax.dynamic_update_slice(
                            tk, dr["tk"][:, None], (0, i, 0, 0)
                        )
                    return (nxt[:, None].astype(jnp.int32), cache, tl,
                            tk, key, counts)

                tl0 = jnp.zeros((B, d, 2), jnp.int32)
                tk0 = (jnp.zeros((B, d, K, 2), jnp.int32) if K
                       else jnp.zeros((0,), jnp.int32))
                _, cache, tl, tk, _, counts = jax.lax.fori_loop(
                    0, d, body, (tokens, cache, tl0, tk0, key, counts)
                )
                out = {"tl": tl}
                if K:
                    out["tk"] = tk
                return out, cache, counts

            self._window_fn = jax.jit(
                window_fn, static_argnums=(8,), donate_argnums=(1, 13)
            )

            def prefill_fn(params, cache, tokens, slot_ids, valid, key,
                           temps, tks, tps, minps, reps, freqs, press,
                           emit, counts, pseen, lbias):
                row_valid = valid > 0
                sub = cache.select(slot_ids, row_valid)
                row, sub = fwd_row(params, sub, tokens, valid)
                row = apply_penalties(
                    row, counts[slot_ids],
                    pseen[slot_ids], reps, freqs, press,
                ) + lbias[slot_ids]
                d = _draw(row, temps, tks, tps, key, minps)
                counts = counts.at[slot_ids, d["tl"][:, 0]].add(emit)
                return d, cache.merge(sub, slot_ids, row_valid), counts

            self._prefill_fn = jax.jit(
                prefill_fn, donate_argnums=(1, 14)
            )
        else:

            def window_fn(params, cache, tokens, valid, key,
                          temps, tks, tps, d, minps):
                # d decode steps fused into one program: the sampled
                # token feeds the next step ON DEVICE, so the host syncs
                # once per window instead of once per token
                B = tokens.shape[0]

                def body(i, carry):
                    tokens, cache, tl, tk, key = carry
                    key, sub = jax.random.split(key)
                    row, cache = fwd_row(params, cache, tokens, valid)
                    dr = _draw(row, temps, tks, tps, sub, minps)
                    nxt = dr["tl"][:, 0]
                    tl = jax.lax.dynamic_update_slice(
                        tl, dr["tl"][:, None, :], (0, i, 0)
                    )
                    if K:
                        tk = jax.lax.dynamic_update_slice(
                            tk, dr["tk"][:, None], (0, i, 0, 0)
                        )
                    return (nxt[:, None].astype(jnp.int32), cache, tl,
                            tk, key)

                tl0 = jnp.zeros((B, d, 2), jnp.int32)
                tk0 = (jnp.zeros((B, d, K, 2), jnp.int32) if K
                       else jnp.zeros((0,), jnp.int32))
                _, cache, tl, tk, _ = jax.lax.fori_loop(
                    0, d, body, (tokens, cache, tl0, tk0, key)
                )
                out = {"tl": tl}
                if K:
                    out["tk"] = tk
                return out, cache

            self._window_fn = jax.jit(
                window_fn, static_argnums=(8,), donate_argnums=(1,)
            )

            def prefill_fn(params, cache, tokens, slot_ids, valid, key,
                           temps, tks, tps, minps):
                # decoupled prefill: [P, C] chunk over a gathered
                # sub-batch view of the shared page pool
                # (paged_cache.select/merge)
                row_valid = valid > 0
                sub = cache.select(slot_ids, row_valid)
                row, sub = fwd_row(params, sub, tokens, valid)
                d = _draw(row, temps, tks, tps, key, minps)
                return d, cache.merge(sub, slot_ids, row_valid)

            self._prefill_fn = jax.jit(prefill_fn, donate_argnums=(1,))

    # -- submission -------------------------------------------------------------
    def submit(
        self,
        prompt: List[int],
        max_new_tokens: int,
        eos_token_id: Optional[int] = None,
        stop_token_ids=None,
        on_token: Optional[Callable[[int, int], None]] = None,
        sampling=None,
        logit_bias: Optional[dict] = None,  # {token_id: additive bias}
        priority: int = 0,  # higher admits first; preempted last
    ) -> int:
        if (
            sampling is not None
            and getattr(sampling, "has_penalties", False)
            and not self.penalties
        ):
            raise ValueError(
                "history penalties need Engine(enable_penalties=True)"
            )
        if logit_bias and not self.penalties:
            raise ValueError(
                "logit_bias needs Engine(enable_penalties=True)"
            )
        if not prompt:
            raise ValueError("empty prompt")
        full_need = -(-(len(prompt) + max_new_tokens) // self.page_size)
        max_pages = self.cache.block_table.shape[1]
        if full_need > max_pages:
            # reject HERE, in the caller's thread — raising at admission
            # time would kill the scheduler loop with the request still
            # queued (it can never become admissible)
            raise ValueError(
                f"prompt + max_new_tokens needs {full_need} pages > table "
                f"width {max_pages}; raise max_seq or shorten the request"
            )
        uid = self._uid
        self._uid += 1
        req = Request(
            uid, list(prompt), max_new_tokens, eos_token_id,
            frozenset(stop_token_ids) if stop_token_ids else None,
            on_token, sampling, logit_bias=dict(logit_bias or {}) or None,
            priority=priority,
        )
        self.queue.append(req)
        # uid -> Request registry (logprobs/top_logprobs live here);
        # same lifetime policy as ``finished`` — callers pop what they own
        self.requests[uid] = req
        return uid

    def _samp_rows(self, reqs):
        """Per-row sampling arrays for a dispatch — (temps, top_ks, top_ps,
        min_ps) plus, under enable_penalties, (rep, freq, pres). None rows
        (idle or padding) are greedy/neutral so an all-greedy batch keeps
        the argmax-only fast path inside sample_token_rows."""
        n = len(reqs)
        # neutral row: greedy / no penalties
        m = np.zeros((n, 7), np.float32)
        m[:, 2] = 1.0  # top_p
        m[:, 4] = 1.0  # repetition_penalty
        for i, r in enumerate(reqs):
            if r is None:
                continue
            row = r._samp_np
            if row is None:
                sp = r.sampling or self.sampling
                row = np.asarray(
                    [sp.temperature, sp.top_k, sp.top_p,
                     getattr(sp, "min_p", 0.0),
                     getattr(sp, "repetition_penalty", 1.0),
                     getattr(sp, "frequency_penalty", 0.0),
                     getattr(sp, "presence_penalty", 0.0)], np.float32,
                )
                r._samp_np = row
            m[i] = row
        # hand numpy straight to the jitted callee: eager jnp.asarray here
        # cost ~85 us/array of device_put setup (4-7 arrays per dispatch);
        # jit converts operands as part of the one batched dispatch instead
        base = (np.ascontiguousarray(m[:, 0]), m[:, 1].astype(np.int32),
                np.ascontiguousarray(m[:, 2]), np.ascontiguousarray(m[:, 3]))
        if not self.penalties:
            return base
        return base + (np.ascontiguousarray(m[:, 4]),
                       np.ascontiguousarray(m[:, 5]),
                       np.ascontiguousarray(m[:, 6]))

    def pop_finished(self, uid: int) -> Optional[List[int]]:
        """Release a completed request's bookkeeping (its ``finished``
        output list and the uid -> Request registry entry — logprobs etc.
        live on the Request). Long-running callers MUST pop what they
        consume or the per-request state accumulates forever."""
        self.requests.pop(uid, None)
        return self.finished.pop(uid, None)

    def abort(self, uid: int) -> bool:
        """Cancel a request. Queued requests are dropped; active requests
        retire immediately with whatever they produced so far (the partial
        output appears in ``finished``/``run()`` like a completed one; an
        in-flight decode window may still be computing the slot — its junk
        tokens are discarded by the drain's done guard, and its page writes
        land on the retired slot's reset (trash) table row). Returns False
        if the uid is unknown or already finished."""
        for req in self.queue:
            if req.uid == uid:
                req.aborted = True
                self.queue.remove(req)
                self.finished[uid] = req.output
                return True
        for slot, req in enumerate(self.slots):
            if req is not None and req.uid == uid:
                req.aborted = True
                self._retire(slot)
                return True
        return False

    def _emit(self, req: Request, token: int, lp: Optional[float] = None,
              top: Optional[list] = None) -> None:
        req.output.append(token)
        if lp is not None:
            req.logprobs.append(lp)
        if top is not None:
            req.top_logprobs.append(top)
        self.stats["tokens_out"] += 1
        if req.on_token is not None:
            req.on_token(req.uid, token)

    @staticmethod
    def _unpack_tl(arr: np.ndarray):
        """Split a packed [..., 2] int32 (token, bitcast-f32 logprob)
        plane fetched from a program result."""
        toks = arr[..., 0]
        lps = np.ascontiguousarray(arr[..., 1]).view(np.float32)
        return toks, lps

    @staticmethod
    def _top_list(tk_row: np.ndarray) -> list:
        """[K, 2] int32 (id, bitcast-f32 logprob) -> [(id, lp), ...]."""
        ids = tk_row[:, 0]
        vals = np.ascontiguousarray(tk_row[:, 1]).view(np.float32)
        return list(zip(ids.tolist(), vals.tolist()))

    # -- scheduling -------------------------------------------------------------
    def _admit(self) -> None:
        for slot in range(self.max_slots):
            if self.slots[slot] is not None or not self.queue:
                continue
            req = max(self.queue, key=lambda r: r.priority)  # FIFO in ties
            # (max is stable toward the FIRST maximal element)
            full_need = -(
                -(len(req.prompt) + req.max_new_tokens) // self.page_size
            )
            max_pages = self.cache.block_table.shape[1]
            if full_need > max_pages:
                raise ValueError(
                    f"request {req.uid} needs {full_need} pages > table "
                    f"width {max_pages}; raise max_seq"
                )
            if self.optimistic:
                # prompt (or resumed feed) + one pipelined decode window of
                # headroom; the slot grows from there (_ensure_pages)
                w2 = 2 * self.decode_window + 1
                need = min(
                    -(-(req._resume + w2) // self.page_size), full_need
                )
            else:
                need = full_need
            covered = 0
            if self.prefix is not None:
                from quick_tpu.runtime.prefix_cache import page_hashes

                req.page_hashes = page_hashes(req.prompt, self.page_size)
                reused = self.prefix.match(req.page_hashes)
                fresh = self.prefix.alloc(need - len(reused))
                if fresh is None:
                    self.prefix.release(reused)
                    return  # no memory — retry after a retirement
                pages = reused + fresh
                req.n_reused = len(reused)
                covered = len(reused) * self.page_size
                req.prefill_cursor = covered
                self.stats["prefix_hit_tokens"] += covered
            else:
                pages = self.alloc.alloc(need)
                if pages is None:
                    return  # no memory — retry after a retirement
            self.queue.remove(req)
            self.stats["admitted"] += 1
            req.admit_seq = self._admit_seq
            self._admit_seq += 1
            self.slots[slot] = req
            if self.penalties:
                # penalty state is rebuilt host-side per admission: prompt
                # tokens -> seen mask (repetition), already-delivered output
                # (preemption resume) -> generated counts (freq/presence)
                V = self.cfg.vocab_size
                seen = np.zeros((V,), np.int8)
                seen[np.asarray(req.prompt, np.int64)] = 1
                self.pseen = self.pseen.at[slot].set(jnp.asarray(seen))
                if req.output:
                    cnt = np.bincount(
                        np.asarray(req.output, np.int64), minlength=V
                    ).astype(np.int32)
                else:
                    cnt = np.zeros((V,), np.int32)
                self.counts = self.counts.at[slot].set(jnp.asarray(cnt))
                lb = np.zeros((V,), np.float32)
                if req.logit_bias:
                    for tid, b in req.logit_bias.items():
                        if 0 <= int(tid) < V:
                            lb[int(tid)] = float(b)
                self.lbias = self.lbias.at[slot].set(jnp.asarray(lb))
            self.slot_pages[slot] = pages
            row = np.full((max_pages,), 0, np.int32)
            row[: len(pages)] = pages
            self.cache = dataclasses.replace(
                self.cache,
                block_table=self.cache.block_table.at[slot].set(
                    jnp.asarray(row)
                ),
                # reused prefix pages are already-valid context: the slot
                # starts life mid-prefill at ``covered`` tokens
                length=self.cache.length.at[slot].set(covered),
            )

    def _retire(self, slot: int) -> None:
        req = self.slots[slot]
        self.stats["retired"] += 1
        self.finished[req.uid] = req.output
        self._release_pages(self.slot_pages[slot])
        self.slot_pages[slot] = []
        self.slots[slot] = None
        # CRITICAL: reset the slot's table row and length. An idle slot still
        # participates in every batched step (padding tokens), and its
        # scatter-writes must land on the trash page — a stale row would
        # write into pages since reallocated to other requests.
        max_pages = self.cache.block_table.shape[1]
        self.cache = dataclasses.replace(
            self.cache,
            block_table=self.cache.block_table.at[slot].set(
                jnp.zeros((max_pages,), jnp.int32)
            ),
            length=self.cache.length.at[slot].set(0),
        )

    # -- optimistic reservation: growth + preemption ------------------------------
    def _alloc_pages(self, n: int) -> Optional[List[int]]:
        if self.prefix is not None:
            return self.prefix.alloc(n)
        return self.alloc.alloc(n)

    def _release_pages(self, pages: List[int]) -> None:
        if self.prefix is not None:
            self.prefix.release(pages)
        else:
            self.alloc.release(pages)

    def _preempt(self, slot: int) -> None:
        """Evict a slot to free its pages: deliver everything already
        computed for it (flush the in-flight window and pending prefill
        samples — their device programs used the slot's pages while they
        were still owned), then release the pages and requeue the request
        at the queue front. Re-admission rebuilds prompt+output by chunked
        prefill (resume_len) and generation continues; nothing already
        delivered is re-emitted."""
        self._flush_window()
        self._drain_pending()
        req = self.slots[slot]
        if req is None or req.done:
            return  # the flush drained it to completion/retirement
        self.stats["preemptions"] += 1
        self._release_pages(self.slot_pages[slot])
        self.slot_pages[slot] = []
        self.slots[slot] = None
        max_pages = self.cache.block_table.shape[1]
        self.cache = dataclasses.replace(
            self.cache,
            block_table=self.cache.block_table.at[slot].set(
                jnp.zeros((max_pages,), jnp.int32)
            ),
            length=self.cache.length.at[slot].set(0),
        )
        req.resume_len = len(req.prompt) + len(req.output)
        req.resume_out = len(req.output)
        req.prefill_cursor = 0
        req.n_reused = 0
        self.queue.appendleft(req)

    def _ensure_pages(self, slot: int) -> bool:
        """Grow a decoding slot's page run to cover output + one pipelined
        decode window of headroom (the same bound the step's W_eff ladder
        enforces on seq
        width — every REAL token's write must land in an owned page; junk
        overruns past max_new land on the trash row tail). On pool
        exhaustion, preempts the youngest OTHER slot and retries; preempts
        this slot itself as a last resort. Returns False if this slot was
        retired or preempted along the way."""
        req = self.slots[slot]
        if req is None:
            return False
        want = min(
            len(req.prompt) + len(req.output) + 2 * self.decode_window + 1,
            len(req.prompt) + req.max_new_tokens,
        )
        need = -(-want // self.page_size) - len(self.slot_pages[slot])
        if need <= 0:
            return True
        while True:
            pages = self._alloc_pages(need)
            if pages is not None:
                break
            # draining the pipeline may retire finished slots (free pages)
            self._flush_window()
            self._drain_pending()
            if self.slots[slot] is not req:
                return False
            pages = self._alloc_pages(need)
            if pages is not None:
                break
            others = [
                s for s, r in enumerate(self.slots)
                if r is not None and s != slot
            ]
            if not others:
                # this slot owns every allocatable page and still can't
                # cover its own next window: the pool is smaller than one
                # request's worth — a config error, not a scheduling state
                raise RuntimeError(
                    f"page pool too small: request {req.uid} holds "
                    f"{len(self.slot_pages[slot])} pages and needs {need} "
                    f"more; raise n_pages"
                )
            victim = min(
                others,
                key=lambda s: (
                    self.slots[s].priority, -self.slots[s].admit_seq
                ),
            )
            if self.slots[victim].priority > req.priority:
                # every other slot outranks this one: yield instead of
                # evicting higher-priority work (requeued; re-admits when
                # pages free up)
                self._preempt(slot)
                return False
            self._preempt(victim)
            if self.slots[slot] is not req:
                return False  # retired by the preemption's flush
        self.slot_pages[slot].extend(pages)
        max_pages = self.cache.block_table.shape[1]
        row = np.zeros((max_pages,), np.int32)
        row[: len(self.slot_pages[slot])] = self.slot_pages[slot]
        self.cache = dataclasses.replace(
            self.cache,
            block_table=self.cache.block_table.at[slot].set(jnp.asarray(row)),
        )
        return True

    def _register_prompt_pages(self, slot: int, req, old_cursor: int) -> None:
        """Publish prompt pages this slot finished writing (their prefill
        chunk has been DISPATCHED; any future sharer's programs are
        dispatched — and so execute — strictly after it)."""
        if self.prefix is None:
            return
        lo = max(old_cursor // self.page_size, req.n_reused)
        hi = min(
            req.prefill_cursor // self.page_size, len(req.page_hashes)
        )
        for i in range(lo, hi):
            self.prefix.register(req.page_hashes[i], self.slot_pages[slot][i])

    @property
    def has_work(self) -> bool:
        return bool(self.queue) or any(r is not None for r in self.slots)

    @property
    def max_seq(self) -> int:
        return self.page_size * self.cache.block_table.shape[1]

    # -- the step ----------------------------------------------------------------
    def step(self) -> None:
        """Admit, dispatch, drain, retire — one scheduler turn.

        With decode_window > 1 (TP or not) the DECOUPLED schedule: decoding
        slots advance through pipelined fused windows ([B, 1] x W programs)
        while prefilling slots advance through small [prefill_rows, chunk]
        sub-batch programs over gathered slot metadata (the page pool is
        shared, modules/paged_cache.py select/merge) — so admission churn
        never drags every decoding slot through a padded [B, chunk] step
        (which costs ~B x the prefill FLOPs; measured 193 -> see
        tools/serve_bench.py). The padded mixed step remains for cold
        start (nothing decoding yet), capacity-tight tails, and
        decode_window=1."""
        _t0 = self._clock() if self._timed else 0.0
        self._admit()
        if self._timed:
            self.timing["admit"] += self._clock() - _t0
        self.stats["steps"] += 1
        if self.optimistic:
            # top up every decoding slot BEFORE any dispatch this step: the
            # programs dispatched below capture the block table as-is, and
            # may write up to 2*W tokens past the confirmed output
            for s in range(self.max_slots):
                r = self.slots[s]
                if (
                    r is not None and r.prefill_done and r.output
                    and not r.done
                ):
                    self._ensure_pages(s)
        B = self.max_slots
        W = self.decode_window
        prefilling = [
            s for s, r in enumerate(self.slots)
            if r is not None and not r.prefill_done
        ]
        ready = [
            s for s, r in enumerate(self.slots)
            if r is not None and r.prefill_done and not r.done
            and len(r.output) > r.resume_out  # post-resume sample landed
        ]
        if W > 1:
            # decoupled is the DEFAULT whenever windows are enabled: prefill
            # sub-batches and decode windows all dispatch before any fetch,
            # so the device queue stays non-empty across scheduler turns.
            # The padded mixed path below is synchronous (dispatch + blocked
            # fetch per turn, device idle for the fetch round-trip) AND pays
            # B x chunk compute even for rows that are idle or decoding —
            # measured at 128 slots x 512 cold start: 6 mixed steps = 3.9 s
            # of an 11.4 s run. QUICK_TPU_MIXED_COLD=1 restores the round-3
            # behavior (mixed while prefilling > ready) for comparison.
            import os as _os2
            if _os2.environ.get("QUICK_TPU_MIXED_COLD") == "1":
                decoupled = len(ready) >= len(prefilling)
            else:
                decoupled = True
            wants = ready or prefilling or self._pending
            # capacity-tight tails SHRINK the window instead of abandoning
            # the decoupled schedule: a slot near max_seq needs 2*W_eff of
            # junk-overrun slack (two un-drained windows), and requests
            # admitted with prompt + max_new == max_seq would otherwise
            # drag EVERY turn through the synchronous mixed path for their
            # whole decode. Each W_eff compiles once (halving ladder,
            # <= log2(W) programs).
            W_eff = W
            if ready:
                worst = max(
                    len(self.slots[s].prompt) + len(self.slots[s].output)
                    for s in ready
                )
                while W_eff > 1 and worst + 2 * W_eff >= self.max_seq:
                    W_eff //= 2
                cap_ok = worst + 2 * W_eff < self.max_seq
            else:
                cap_ok = True
            if wants and decoupled and cap_ok:
                # dispatch everything first (device queues the programs),
                # then drain ONLY results of previous steps: this step's
                # prefill samples queue behind the window just dispatched,
                # so fetching them now would stall the pipeline for the
                # whole window — they wait one step (pending_prev)
                pending_prev, self._pending = self._pending, []
                prev = (
                    self._dispatch_window(ready, W_eff) if ready else None
                )
                # the whole prefill backlog advances every step (one
                # sub-batch program dispatch per prefill_rows slots):
                # capping admission at one substep starves slot occupancy
                # under churn — decode emits ~ready*window tokens per step,
                # so admission must keep pace
                for off in range(0, len(prefilling), self.prefill_rows):
                    self._prefill_substep(
                        prefilling[off : off + self.prefill_rows]
                    )
                if prev is not None:
                    self._drain_window(prev)
                elif not ready:
                    self._flush_window()  # stale in-flight, no new window
                self._drain_pending(pending_prev)
                return
        # ---- padded mixed path (cold start / tight tails) ----
        _tm = self._clock() if self._timed else 0.0
        self._drain_pending()
        self._flush_window()
        if all(r is None for r in self.slots):
            return  # flushes retired everything; nothing left to batch
        # decode-only steps run at S=1: no padded chunk compute, and the
        # paged-attention kernel path (S==1 gate, modules/blocks.py) engages.
        # jit caches both the [B, chunk] and [B, 1] programs.
        any_prefill = any(
            r is not None and not r.prefill_done for r in self.slots
        )
        C = self.chunk if any_prefill else 1
        tokens = np.zeros((B, C), np.int32)
        valid = np.zeros((B,), np.int32)
        for slot, req in enumerate(self.slots):
            if req is None:
                continue
            if not req.prefill_done:
                nxt = req.feed(
                    req.prefill_cursor,
                    min(req.prefill_cursor + C, req._resume),
                )
                tokens[slot, : len(nxt)] = nxt
                valid[slot] = len(nxt)
            else:
                tokens[slot, 0] = (
                    req.output[-1] if req.output else req.prompt[-1]
                )
                valid[slot] = 1
        lps = tk = None
        if self.penalties:
            self._key, sub = jax.random.split(self._key)
            samp = self._samp_rows(self.slots)
            emit = np.zeros((B,), np.int32)
            for s2, r2 in enumerate(self.slots):
                if r2 is None:
                    continue
                if r2.prefill_done or (
                    r2.prefill_cursor + int(valid[s2]) >= r2._resume
                ):
                    emit[s2] = 1  # this row's sample will be delivered
            d, self.cache, self.counts = self._step_fn(
                self.params, self.cache, jnp.asarray(tokens),
                jnp.asarray(valid), sub, *samp,
                jnp.asarray(emit), self.counts, self.pseen, self.lbias,
            )
            sampled, lps = self._unpack_tl(np.asarray(d["tl"]))
            tk = np.asarray(d["tk"]) if "tk" in d else None
        else:
            self._key, sub = jax.random.split(self._key)
            samp = self._samp_rows(self.slots)
            d, self.cache = self._step_fn(
                self.params, self.cache, jnp.asarray(tokens),
                jnp.asarray(valid), sub, *samp,
            )
            sampled, lps = self._unpack_tl(np.asarray(d["tl"]))
            tk = np.asarray(d["tk"]) if "tk" in d else None
        if self._timed:
            self.timing["mixed"] += self._clock() - _tm
        self._dispatch_seq += 1
        self.stats["mixed_steps"] += 1
        self.stats["prompt_tokens"] += int(
            sum(v for s2, v in enumerate(valid) if self.slots[s2] is not None
                and not self.slots[s2].prefill_done)
        )
        for slot, req in enumerate(self.slots):
            if req is None:
                continue
            lp = None if lps is None else float(lps[slot])
            top = None if tk is None else self._top_list(tk[slot])
            if not req.prefill_done:
                old_cursor = req.prefill_cursor
                req.prefill_cursor += int(valid[slot])
                self._register_prompt_pages(slot, req, old_cursor)
                if req.prefill_done:
                    self._emit(req, int(sampled[slot]), lp, top)
            else:
                self._emit(req, int(sampled[slot]), lp, top)
            if req.done and self.slots[slot] is req:
                self._retire(slot)

    def _dispatch_window(self, ready, W=None) -> Optional[tuple]:
        if self._timed:
            _t0 = self._clock()
            out = self._dispatch_window_inner(ready, W)
            self.timing["window_dispatch"] += self._clock() - _t0
            return out
        return self._dispatch_window_inner(ready, W)

    def _dispatch_window_inner(self, ready, W=None) -> Optional[tuple]:
        """Dispatch a decode window for the ``ready`` slots and return the
        previously in-flight window (software pipelining): the new window's
        input token for a slot that was decoding in the previous window
        comes from that window's device-side output — no host fetch on the
        dispatch path — so host drain/schedule work overlaps device
        compute. Slots the subsequent drain retires were still computing
        in the in-flight window; their writes land in their own
        (reset-on-retire) pages or the trash page and their tokens are
        discarded by the drain's valid/done guards."""
        B = self.max_slots
        W = self.decode_window if W is None else W
        valid = np.zeros((B,), np.int32)
        host_tok = np.zeros((B, 1), np.int32)
        for s in ready:
            valid[s] = 1
            host_tok[s, 0] = self.slots[s].output[-1]
        prev = self._inflight
        if prev is not None:
            # rows decoding in BOTH windows chain on device; rows newly
            # joining (first window after prefill) start from their host
            # token (fetched by _drain_pending)
            cont = (prev["valid"] > 0) & (valid > 0)
            last_tok = prev["out"][:, -1, 0][:, None]
            tok_in = jnp.where(
                jnp.asarray(cont)[:, None], last_tok, jnp.asarray(host_tok)
            )
        else:
            tok_in = jnp.asarray(host_tok)
        self._key, sub = jax.random.split(self._key)
        samp = self._samp_rows(
            [r if valid[s] else None for s, r in enumerate(self.slots)]
        )
        if self.penalties:
            d, self.cache, self.counts = self._window_fn(
                self.params, self.cache, tok_in, jnp.asarray(valid),
                sub, samp[0], samp[1], samp[2], W, samp[3], samp[4],
                samp[5], samp[6], self.counts, self.pseen, self.lbias,
            )
        else:
            d, self.cache = self._window_fn(
                self.params, self.cache, tok_in, jnp.asarray(valid),
                sub, samp[0], samp[1], samp[2], W, samp[3],
            )
        out = {"out": d["tl"], "tk": d.get("tk")}
        out["slots"] = list(self.slots)
        out["valid"] = valid
        self._dispatch_seq += 1
        out["seq"] = self._dispatch_seq
        self._inflight = out
        self.stats["window_steps"] += 1
        self.stats["decode_slot_steps"] += int(valid.sum()) * W
        return prev

    def _flush_window(self) -> None:
        if self._inflight is not None:
            prev, self._inflight = self._inflight, None
            self._drain_window(prev)

    def _drain_window(self, inflight) -> None:
        snapshot, valid = inflight["slots"], inflight["valid"]
        _t0 = self._clock() if self._timed else 0.0
        arr = np.asarray(inflight["out"])  # ONE host sync for W tokens
        if self._timed:
            dt = self._clock() - _t0
            self.timing["window_fetch"] += dt
            if inflight.get("seq") == self._dispatch_seq:
                self.timing["window_fetch_serial"] += dt
        toks, lps = self._unpack_tl(arr)  # [B, W] each
        tk = inflight.get("tk")
        tk = np.asarray(tk) if tk is not None else None  # [B, W, K, 2]
        for slot, req in enumerate(snapshot):
            if req is None or not valid[slot] or req.done:
                continue  # idle/prefilling row, or retired in flight
            for j in range(toks.shape[1]):
                self._emit(
                    req, int(toks[slot, j]),
                    None if lps is None else float(lps[slot, j]),
                    None if tk is None else self._top_list(tk[slot, j]),
                )
                if req.done:
                    break  # the window's remaining tokens are junk
            if req.done and self.slots[slot] is req:
                self._retire(slot)

    # -- decoupled prefill --------------------------------------------------------
    def _prefill_substep(self, prefilling) -> None:
        if self._timed:
            _t0 = self._clock()
            self._prefill_substep_inner(prefilling)
            self.timing["prefill_dispatch"] += self._clock() - _t0
            return
        self._prefill_substep_inner(prefilling)

    def _prefill_substep_inner(self, prefilling) -> None:
        """Advance up to ``prefill_rows`` prefilling slots by one chunk
        through the gathered sub-batch program — decoding slots never pay
        for it. The sampled next-token of rows that complete their prompt
        is NOT fetched here: it goes on the pending list and is fetched at
        the step's drain point, overlapping the in-flight window."""
        P, C = self.prefill_rows, self.chunk
        rows = prefilling[:P]
        slot_ids = np.zeros((P,), np.int32)
        valid = np.zeros((P,), np.int32)
        tokens = np.zeros((P, C), np.int32)
        fin = []
        for i, s in enumerate(rows):
            r = self.slots[s]
            nxt = r.feed(
                r.prefill_cursor, min(r.prefill_cursor + C, r._resume)
            )
            tokens[i, : len(nxt)] = nxt
            valid[i] = len(nxt)
            slot_ids[i] = s
            old_cursor = r.prefill_cursor
            r.prefill_cursor += len(nxt)
            self._register_prompt_pages(s, r, old_cursor)
            if r.prefill_done:
                fin.append((i, s, r))
        # padding rows need DISTINCT slot ids (merge scatters by id);
        # select() trashes their table rows via row_valid, so any unused
        # slot works
        pad_pool = [s for s in range(self.max_slots) if s not in rows]
        for i in range(len(rows), P):
            slot_ids[i] = pad_pool[i - len(rows)]
        self.stats["prefill_substeps"] += 1
        self.stats["prompt_tokens"] += int(valid.sum())
        self._key, sub = jax.random.split(self._key)
        samp = self._samp_rows(
            [self.slots[s] for s in rows] + [None] * (P - len(rows))
        )
        if self.penalties:
            emit = np.zeros((P,), np.int32)
            for i, _s, _r in fin:
                emit[i] = 1  # completion sample, delivered via pending
            d, self.cache, self.counts = self._prefill_fn(
                self.params, self.cache, jnp.asarray(tokens),
                jnp.asarray(slot_ids), jnp.asarray(valid), sub, *samp,
                jnp.asarray(emit), self.counts, self.pseen, self.lbias,
            )
        else:
            d, self.cache = self._prefill_fn(
                self.params, self.cache, jnp.asarray(tokens),
                jnp.asarray(slot_ids), jnp.asarray(valid), sub, *samp,
            )
        self._dispatch_seq += 1
        if fin:
            self._pending.append((d, fin, self._dispatch_seq))

    def _drain_pending(self, pending=None) -> None:
        if pending is None:
            pending, self._pending = self._pending, []
        for d, fin, seq in pending:
            # tiny [P, 2]; the fetch overlaps in-flight device work
            _t0 = self._clock() if self._timed else 0.0
            toks, lps = self._unpack_tl(np.asarray(d["tl"]))
            if self._timed:
                dt = self._clock() - _t0
                self.timing["pending_fetch"] += dt
                if seq == self._dispatch_seq:
                    self.timing["pending_fetch_serial"] += dt
            tk = np.asarray(d["tk"]) if "tk" in d else None
            for i, slot, req in fin:
                if req.done:
                    continue  # aborted while its first token was pending
                self._emit(
                    req, int(toks[i]), float(lps[i]),
                    None if tk is None else self._top_list(tk[i]),
                )
                if req.done and self.slots[slot] is req:
                    self._retire(slot)

    def run(self, max_steps: int = 100_000) -> Dict[int, List[int]]:
        """Step until all submitted work is finished; returns uid -> tokens."""
        steps = 0
        while self.has_work:
            self.step()
            steps += 1
            if steps > max_steps:
                raise RuntimeError("engine exceeded max_steps")
        return dict(self.finished)
