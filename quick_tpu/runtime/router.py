"""Data-parallel serving: replica engines behind a least-loaded router.

The reference has no distributed serving at all (SURVEY.md section 2.3);
its multi-GPU story is layer placement. The TPU deployment shape for
throughput serving is N model REPLICAS — one per chip (or per TP submesh) —
with requests routed across them: DP over ICI/DCN composes with TP inside
each replica (each Engine may itself be TP-sharded over its own mesh).

``RouterEngine`` is that router: host-side, scheduler-agnostic, routes each
request to the replica with the least outstanding work (queued + active
tokens), steps every busy replica per turn, and aggregates results/stats.
Replicas are ordinary ``Engine`` instances, so every engine feature
(sampling, logprobs, penalties, prefix cache, preemption, INT8 KV, TP mesh)
works unchanged per replica. ``replicated_engines`` builds the common case:
one replica per device with the (packed, quantized) params placed on it.
"""
from __future__ import annotations

from typing import Dict, List, Optional

import jax

from quick_tpu.config import ModelConfig
from quick_tpu.runtime.serving import Engine


class _AllocView:
    """Aggregated page-allocator view (duck-typed for /metrics)."""

    def __init__(self, engines):
        self._e = engines

    @property
    def n_free(self) -> int:
        return sum(e.alloc.n_free for e in self._e)


class _PrefixView:
    """Aggregated prefix-cache counters (duck-typed for /metrics)."""

    def __init__(self, caches):
        self._c = caches

    @property
    def index(self):
        out = {}
        for c in self._c:
            out.update(c.index)
        return out

    @property
    def hits(self) -> int:
        return sum(c.hits for c in self._c)

    @property
    def misses(self) -> int:
        return sum(c.misses for c in self._c)


class RouterEngine:
    """Least-loaded request router over Engine replicas.

    Duck-compatible with ``Engine`` where the API server needs it
    (submit/step/has_work/abort/finished/pop_finished/requests/stats/
    queue/slots/alloc/prefix), so ``APIServer(RouterEngine([...]), tok)``
    serves a DP fleet unchanged."""

    def __init__(self, engines: List[Engine]):
        if not engines:
            raise ValueError("need at least one engine replica")
        self.engines = engines
        # global uid -> (replica index, replica-local uid)
        self._route: Dict[int, tuple] = {}
        self._uid = 0
        self.finished: Dict[int, List[int]] = {}
        #: global uid -> replica-local Request (stable object identity)
        self.requests: Dict[int, object] = {}
        self.alloc = _AllocView(engines)
        pcs = [e.prefix for e in engines if e.prefix is not None]
        self.prefix = _PrefixView(pcs) if pcs else None

    # -- routing ---------------------------------------------------------------
    def _load(self, eng: Engine) -> int:
        """Outstanding work in tokens: queued prompts+budgets plus what the
        active slots still owe."""
        load = 0
        for r in eng.queue:
            load += len(r.prompt) + r.max_new_tokens
        for r in eng.slots:
            if r is not None and not r.done:
                load += (r._resume - r.prefill_cursor) + (
                    r.max_new_tokens - len(r.output)
                )
        return load

    def submit(self, prompt: List[int], max_new_tokens: int, **kw) -> int:
        idx = min(range(len(self.engines)), key=lambda i: self._load(self.engines[i]))
        local = self.engines[idx].submit(prompt, max_new_tokens, **kw)
        uid = self._uid
        self._uid += 1
        self._route[uid] = (idx, local)
        self.requests[uid] = self.engines[idx].requests[local]
        return uid

    def abort(self, uid: int) -> bool:
        idx, local = self._route.get(uid, (None, None))
        if idx is None:
            return False
        return self.engines[idx].abort(local)

    def pop_finished(self, uid: int) -> Optional[List[int]]:
        self._collect()
        return self.finished.pop(uid, None)

    # -- stepping --------------------------------------------------------------
    @property
    def has_work(self) -> bool:
        return any(e.has_work for e in self.engines)

    def step(self) -> None:
        """One scheduler turn on every replica with work. Each replica's
        dispatches are independent device programs, so stepping them in
        sequence keeps all replicas' devices busy concurrently (the host
        only blocks on a replica's own fetch points)."""
        for e in self.engines:
            if e.has_work:
                e.step()
        self._collect()

    @property
    def queue(self) -> list:
        return [r for e in self.engines for r in e.queue]

    @property
    def slots(self) -> list:
        return [r for e in self.engines for r in e.slots]

    def run(self, max_steps: int = 100_000) -> Dict[int, List[int]]:
        steps = 0
        while self.has_work:
            self.step()
            steps += 1
            if steps > max_steps:
                raise RuntimeError("router exceeded max_steps")
        self._collect()
        return dict(self.finished)

    def _collect(self) -> None:
        for uid, (idx, local) in self._route.items():
            eng = self.engines[idx]
            if local in eng.finished:
                self.finished[uid] = eng.finished.pop(local)
        # the route map is kept: request() resolves logprobs/top_logprobs
        # through it after completion too (same caller-owned lifetime as
        # Engine.requests)

    def request(self, uid: int):
        """The replica-local Request (logprobs/top_logprobs live there)."""
        idx, local = self._route[uid]
        return self.engines[idx].requests[local]

    @property
    def stats(self) -> Dict[str, int]:
        agg: Dict[str, int] = {}
        for e in self.engines:
            for k, v in e.stats.items():
                agg[k] = agg.get(k, 0) + v
        return agg


def replicated_engines(
    params,
    cfg: ModelConfig,
    n_replicas: int,
    devices: Optional[list] = None,
    **engine_kw,
) -> RouterEngine:
    """One Engine per device, params placed on each (weight-replicated DP).

    For TP-inside-DP build the engines yourself (each with its own mesh and
    pre-sharded params) and hand them to RouterEngine."""
    devices = devices if devices is not None else jax.devices()
    if n_replicas > len(devices):
        raise ValueError(f"need {n_replicas} devices, have {len(devices)}")
    engines = []
    for d in devices[:n_replicas]:
        local = jax.tree_util.tree_map(
            lambda x: jax.device_put(x, d), params
        )
        with jax.default_device(d):
            # cache/sampling state allocated inside Engine.__init__ must
            # land on the replica's device alongside its params
            engines.append(Engine(local, cfg, **engine_kw))
    return RouterEngine(engines)
