"""OpenAI-compatible HTTP serving front-end over the continuous-batching
engine.

The reference's deployment story is its vLLM fork (SURVEY.md section 2.3:
vllm-quick, ShareGPT throughput README rows); the TPU build serves through
its own engine (runtime/serving.py), and this module gives it the same
consumable surface: an OpenAI-style REST API on the Python stdlib only
(ThreadingHTTPServer — no web-framework dependency).

Endpoints:
  POST /v1/completions        prompt in, text out; ``stream: true`` => SSE
  POST /v1/chat/completions   messages in (chat template when the tokenizer
                              has one), same sampling/stream contract
  GET  /v1/models             model listing
  GET  /health                liveness
  GET  /metrics               engine scheduler stats (runtime/serving.py)

Design: HTTP handler threads never touch the device — they submit under a
lock and wait. ONE scheduler thread drives ``engine.step()`` whenever the
engine has work, so all jit dispatch stays single-threaded (XLA programs
are not re-entrant per buffer donation) and continuous batching happens
naturally across concurrent HTTP requests: every in-flight request shares
the same paged cache and step programs.

Streaming rides the engine's ``on_token`` callback into a per-request
queue; tokens are decoded one at a time (a token that is only half a
unicode glyph decodes with replacement characters until its pair arrives —
same tradeoff vLLM's delta decoding makes).
"""
from __future__ import annotations

import json
import threading
import time
import uuid
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from queue import Empty, Queue
from typing import Dict, Optional

from quick_tpu.runtime.generate import SamplingParams
from quick_tpu.runtime.serving import Engine


class _Completion:
    """Server-side record of one in-flight API request."""

    def __init__(self, uid: int, n_prompt: int, max_tokens: int,
                 eos_id: Optional[int], stop_ids: frozenset):
        self.uid = uid
        self.n_prompt = n_prompt
        self.max_tokens = max_tokens
        self.eos_id = eos_id
        self.stop_ids = stop_ids
        self.tokens = Queue()  # streamed token ids; None terminates

    def finish_reason(self, output) -> str:
        if output and (
            output[-1] == self.eos_id or output[-1] in self.stop_ids
        ):
            return "stop"
        return "length" if len(output) >= self.max_tokens else "stop"


class APIServer:
    """Serve an Engine over HTTP. ``tokenizer`` needs ``encode(str) ->
    list[int]`` and ``decode(list[int]) -> str`` (a HF tokenizer works;
    ``apply_chat_template`` is used for /v1/chat/completions when
    present)."""

    def __init__(self, engine: Engine, tokenizer, model_name: str = "quick_tpu",
                 eos_token_id: Optional[int] = None):
        self.engine = engine
        self.tokenizer = tokenizer
        self.model_name = model_name
        self.eos_token_id = (
            eos_token_id
            if eos_token_id is not None
            else getattr(tokenizer, "eos_token_id", None)
        )
        self._lock = threading.Lock()
        self._completions: Dict[int, _Completion] = {}
        self._shutdown = threading.Event()
        self._httpd: Optional[ThreadingHTTPServer] = None
        self._threads = []

    # -- scheduler thread ------------------------------------------------------
    def _drive(self):
        while not self._shutdown.is_set():
            try:
                with self._lock:
                    busy = self.engine.has_work
                    if busy:
                        self.engine.step()
                        self._signal_finished()
            except Exception:  # noqa: BLE001 — the scheduler thread must
                # survive anything: a dead _drive hangs every client while
                # /health keeps answering ok. Fail the in-flight requests
                # visibly instead and keep serving.
                import traceback

                traceback.print_exc()
                with self._lock:
                    for uid in list(self._completions):
                        self.engine.abort(uid)
                        self._completions[uid].tokens.put(None)
                    self._completions.clear()
                busy = False
            if not busy:
                time.sleep(0.002)

    def _signal_finished(self):
        # called under the lock after each step: close the token stream of
        # every completion whose request retired
        done = [
            uid for uid in self._completions
            if uid in self.engine.finished
        ]
        for uid in done:
            self._completions[uid].tokens.put(None)

    # -- submission (handler threads) ------------------------------------------
    def _submit(self, prompt_ids, max_tokens, sampling, stop_ids,
                logit_bias=None, priority=0) -> _Completion:
        with self._lock:
            comp_holder = {}

            def on_token(uid, tok):
                comp_holder["c"].tokens.put(tok)

            uid = self.engine.submit(
                list(prompt_ids), max_tokens,
                eos_token_id=self.eos_token_id,
                stop_token_ids=stop_ids or None,
                on_token=on_token,
                sampling=sampling,
                logit_bias=logit_bias,
                priority=priority,
            )
            comp = _Completion(uid, len(prompt_ids), max_tokens,
                               self.eos_token_id, frozenset(stop_ids or ()))
            comp_holder["c"] = comp
            self._completions[uid] = comp
        return comp

    @staticmethod
    def _find_stop(text: str, stops) -> int:
        """Earliest index where any stop string begins, or -1."""
        best = -1
        for s in stops:
            i = text.find(s)
            if i >= 0 and (best < 0 or i < best):
                best = i
        return best

    def _collect(self, comp: _Completion, stops):
        """Consume a completion's token stream; with stop STRINGS, abort
        the engine request as soon as any appears in the decoded text
        (OpenAI `stop`). Returns (token_ids, text, stopped_by_string)."""
        if not stops:
            out = self._wait(comp)
            return out, self.tokenizer.decode(self._strip_stop(comp, out)), False
        out, text = [], ""
        for tok in self._iter_stream(comp):
            if tok == comp.eos_id or tok in comp.stop_ids:
                out.append(tok)  # finish_reason sees it; text excludes it
                break
            piece = self.tokenizer.decode([tok])
            cut = self._find_stop(text + piece, stops)
            if cut >= 0:
                with self._lock:
                    self.engine.abort(comp.uid)
                    self._completions.pop(comp.uid, None)
                return out, (text + piece)[:cut], True
            out.append(tok)
            text += piece
        return out, text, False

    @staticmethod
    def _strip_stop(comp: _Completion, out):
        """Drop the terminating EOS / stop token from the DECODED text
        (OpenAI and vLLM both exclude it); token-id lists keep it for
        usage counts and finish_reason."""
        if out and (out[-1] == comp.eos_id or out[-1] in comp.stop_ids):
            return out[:-1]
        return out

    def _wait(self, comp: _Completion, timeout: float = 600.0):
        deadline = time.time() + timeout
        while time.time() < deadline:
            with self._lock:
                out = self.engine.finished.get(comp.uid)
                if out is not None:
                    self._completions.pop(comp.uid, None)
                    return list(out)
            time.sleep(0.002)
        with self._lock:  # stop paying for a request nobody will read
            self.engine.abort(comp.uid)
            self.engine.pop_finished(comp.uid)
            self._completions.pop(comp.uid, None)
        raise TimeoutError(f"request {comp.uid} timed out")

    def _iter_stream(self, comp: _Completion, timeout: float = 600.0):
        """Yield token ids as the scheduler delivers them."""
        deadline = time.time() + timeout
        while True:
            try:
                tok = comp.tokens.get(timeout=min(1.0, deadline - time.time()))
            except (Empty, ValueError):
                if time.time() >= deadline:
                    with self._lock:
                        self.engine.abort(comp.uid)
                        self.engine.pop_finished(comp.uid)
                        self._completions.pop(comp.uid, None)
                    raise TimeoutError(f"request {comp.uid} timed out")
                continue
            if tok is None:
                with self._lock:
                    self._completions.pop(comp.uid, None)
                return
            yield tok

    # -- lifecycle -------------------------------------------------------------
    def start(self, host: str = "127.0.0.1", port: int = 8000) -> int:
        """Start the scheduler thread and HTTP server; returns the bound
        port (pass port=0 for an ephemeral one)."""
        server = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet
                pass

            def do_GET(self):
                server._handle_get(self)

            def do_POST(self):
                server._handle_post(self)

        self._httpd = ThreadingHTTPServer((host, port), Handler)
        self._httpd.daemon_threads = True
        t_http = threading.Thread(target=self._httpd.serve_forever, daemon=True)
        t_sched = threading.Thread(target=self._drive, daemon=True)
        t_http.start()
        t_sched.start()
        self._threads = [t_http, t_sched]
        return self._httpd.server_address[1]

    def stop(self):
        self._shutdown.set()
        if self._httpd is not None:
            self._httpd.shutdown()
            self._httpd.server_close()
        for t in self._threads:
            t.join(timeout=5)

    # -- HTTP plumbing ---------------------------------------------------------
    def _handle_get(self, h: BaseHTTPRequestHandler):
        if h.path == "/health":
            self._json(h, 200, {"status": "ok"})
        elif h.path == "/v1/models":
            self._json(h, 200, {
                "object": "list",
                "data": [{"id": self.model_name, "object": "model",
                          "owned_by": "quick_tpu"}],
            })
        elif h.path == "/metrics":
            # Prometheus text exposition (vLLM-style observability); the
            # JSON form stays at /metrics.json
            with self._lock:
                stats = dict(self.engine.stats)
                stats["queue_depth"] = len(self.engine.queue)
                stats["active_slots"] = sum(
                    r is not None for r in self.engine.slots
                )
                stats["free_pages"] = self.engine.alloc.n_free
                if self.engine.prefix is not None:
                    stats["prefix_index_pages"] = len(self.engine.prefix.index)
                    stats["prefix_hits"] = self.engine.prefix.hits
                    stats["prefix_misses"] = self.engine.prefix.misses
            lines = []
            for k, v in sorted(stats.items()):
                lines.append(f"# TYPE quick_tpu_{k} gauge")
                lines.append(f"quick_tpu_{k} {v}")
            payload = ("\n".join(lines) + "\n").encode()
            h.send_response(200)
            h.send_header("Content-Type", "text/plain; version=0.0.4")
            h.send_header("Content-Length", str(len(payload)))
            h.end_headers()
            h.wfile.write(payload)
        elif h.path == "/metrics.json":
            with self._lock:
                stats = dict(self.engine.stats)
            self._json(h, 200, stats)
        else:
            self._json(h, 404, {"error": "not found"})

    def _handle_post(self, h: BaseHTTPRequestHandler):
        try:
            n = int(h.headers.get("Content-Length", 0))
            body = json.loads(h.rfile.read(n) or b"{}")
        except (ValueError, json.JSONDecodeError):
            return self._json(h, 400, {"error": "invalid JSON body"})
        try:
            if h.path == "/v1/completions":
                self._completion(h, body, chat=False)
            elif h.path == "/v1/chat/completions":
                self._completion(h, body, chat=True)
            else:
                self._json(h, 404, {"error": "not found"})
        except (KeyError, TypeError, ValueError) as e:
            self._json(h, 400, {"error": str(e)})
        except TimeoutError as e:
            self._json(h, 504, {"error": str(e)})

    def _completion(self, h, body, chat: bool):
        if chat:
            messages = body["messages"]
            if hasattr(self.tokenizer, "apply_chat_template"):
                prompt_ids = self.tokenizer.apply_chat_template(
                    messages, add_generation_prompt=True
                )
            else:
                text = "\n".join(
                    f"{m['role']}: {m['content']}" for m in messages
                ) + "\nassistant:"
                prompt_ids = self.tokenizer.encode(text)
        else:
            prompt = body["prompt"]
            prompt_ids = (
                prompt if isinstance(prompt, list)
                else self.tokenizer.encode(prompt)
            )
        max_tokens = int(body.get("max_tokens", 16))
        # OpenAI defaults temperature to 1.0 (sampling); clients that want
        # greedy must pass temperature=0 explicitly
        temperature = float(body.get("temperature", 1.0))
        sampling = SamplingParams(
            temperature=temperature,
            top_k=int(body.get("top_k", 0)),
            top_p=float(body.get("top_p", 1.0)),
            min_p=float(body.get("min_p", 0.0)),
            repetition_penalty=float(body.get("repetition_penalty", 1.0)),
            frequency_penalty=float(body.get("frequency_penalty", 0.0)),
            presence_penalty=float(body.get("presence_penalty", 0.0)),
        )
        stop_ids = body.get("stop_token_ids")
        stops = body.get("stop")
        if isinstance(stops, str):
            stops = [stops]
        stops = [s for s in (stops or []) if s]
        n_choices = max(1, int(body.get("n", 1)))
        best_of = max(n_choices, int(body.get("best_of", n_choices)))
        if (n_choices > 1 or best_of > 1) and body.get("stream"):
            raise ValueError("n/best_of > 1 with stream is not supported")
        echo = bool(body.get("echo")) and not chat
        lb = body.get("logit_bias") or None
        if lb:
            if not getattr(self.engine, "penalties", False):
                raise ValueError(
                    "logit_bias needs the engine started with penalty "
                    "support (Engine(enable_penalties=True) / --penalties)"
                )
            lb = {int(k): float(v) for k, v in lb.items()}
        prio = int(body.get("priority", 0))
        comps = [
            self._submit(prompt_ids, max_tokens, sampling, stop_ids, lb,
                         priority=prio)
            for _ in range(best_of)
        ]
        comp = comps[0]
        rid = f"cmpl-{uuid.uuid4().hex[:24]}"
        kind = "chat.completion" if chat else "text_completion"
        if body.get("stream"):
            h.send_response(200)
            h.send_header("Content-Type", "text/event-stream")
            h.send_header("Cache-Control", "no-cache")
            h.end_headers()
            out = []
            text_so_far = ""
            stopped = False

            def send(piece):
                delta = (
                    {"delta": {"content": piece}} if chat
                    else {"text": piece}
                )
                chunk = {"id": rid, "object": kind + ".chunk",
                         "model": self.model_name,
                         "choices": [{"index": 0, **delta,
                                      "finish_reason": None}]}
                h.wfile.write(f"data: {json.dumps(chunk)}\n\n".encode())
                h.wfile.flush()

            try:
                for tok in self._iter_stream(comp):
                    if tok == comp.eos_id or tok in comp.stop_ids:
                        out.append(tok)  # keeps finish_reason="stop";
                        break            # the marker itself is not content
                    piece = self.tokenizer.decode([tok])
                    if stops:
                        # stop strings end the stream at the match start;
                        # a stop spanning already-flushed chunks cannot be
                        # retracted — only the unsent remainder is held
                        cut = self._find_stop(text_so_far + piece, stops)
                        if cut >= 0:
                            tail = (text_so_far + piece)[
                                len(text_so_far):cut
                            ] if cut > len(text_so_far) else ""
                            if tail:
                                send(tail)
                            with self._lock:
                                self.engine.abort(comp.uid)
                                self._completions.pop(comp.uid, None)
                            stopped = True
                            break
                    out.append(tok)
                    text_so_far += piece
                    send(piece)
            except (BrokenPipeError, ConnectionResetError):
                # client went away: stop paying for its tokens
                with self._lock:
                    self.engine.abort(comp.uid)
                    self.engine.pop_finished(comp.uid)
                    self._completions.pop(comp.uid, None)
                return
            fin = {"id": rid, "object": kind + ".chunk",
                   "model": self.model_name,
                   "choices": [{"index": 0,
                                **({"delta": {}} if chat else {"text": ""}),
                                "finish_reason": (
                                    "stop" if stopped
                                    else comp.finish_reason(out)
                                )}]}
            h.wfile.write(f"data: {json.dumps(fin)}\n\n".encode())
            h.wfile.write(b"data: [DONE]\n\n")
            h.wfile.flush()
            with self._lock:
                self.engine.pop_finished(comp.uid)
            return
        want_lp = body.get("logprobs")
        results, total_out = [], 0
        for c in comps:
            out, text, stopped = self._collect(c, stops)
            total_out += len(out)
            results.append((c, out, text, stopped))
        if best_of > n_choices:
            # OpenAI best_of: generate best_of, return the n with the
            # highest mean per-token logprob
            def score(r):
                req = self.engine.requests.get(r[0].uid)
                lp = req.logprobs[: len(r[1])] if req else []
                return sum(lp) / max(len(lp), 1)

            results = sorted(results, key=score, reverse=True)[:n_choices]
        choices = []
        for idx, (c, out, text, stopped) in enumerate(results):
            fr = "stop" if stopped else c.finish_reason(out)
            if echo:
                text = self.tokenizer.decode(list(prompt_ids)) + text
            choice = (
                {"index": idx,
                 "message": {"role": "assistant", "content": text},
                 "finish_reason": fr}
                if chat else
                {"index": idx, "text": text, "finish_reason": fr}
            )
            if want_lp:
                choice["logprobs"] = self._logprobs_obj(
                    c.uid, out, want_lp, body, chat
                )
            choices.append(choice)
        with self._lock:  # logprobs were read above — release everything
            for c in comps:
                self.engine.pop_finished(c.uid)
        self._json(h, 200, {
            "id": rid, "object": kind, "model": self.model_name,
            "choices": choices,
            "usage": {"prompt_tokens": comp.n_prompt,
                      "completion_tokens": total_out,
                      "total_tokens": comp.n_prompt + total_out},
        })

    def _logprobs_obj(self, uid, out, want_lp, body, chat: bool):
        req = self.engine.requests.get(uid)
        lp = list(req.logprobs) if req is not None else []
        tops = list(req.top_logprobs) if req is not None else []
        n_top = int(want_lp) if not isinstance(want_lp, bool) else int(
            body.get("top_logprobs", 0)
        )
        tok_strs = [self.tokenizer.decode([t]) for t in out]
        if chat:
            content = []
            for i, t in enumerate(out):
                entry = {
                    "token": tok_strs[i],
                    "logprob": lp[i] if i < len(lp) else None,
                }
                if n_top and i < len(tops):
                    entry["top_logprobs"] = [
                        {"token": self.tokenizer.decode([tid]),
                         "logprob": v}
                        for tid, v in tops[i][:n_top]
                    ]
                content.append(entry)
            return {"content": content}
        obj = {"tokens": tok_strs, "token_logprobs": lp[: len(out)]}
        if n_top:
            obj["top_logprobs"] = [
                {self.tokenizer.decode([tid]): v for tid, v in top[:n_top]}
                for top in tops[: len(out)]
            ]
        return obj

    @staticmethod
    def _json(h: BaseHTTPRequestHandler, code: int, obj):
        payload = json.dumps(obj).encode()
        h.send_response(code)
        h.send_header("Content-Type", "application/json")
        h.send_header("Content-Length", str(len(payload)))
        h.end_headers()
        h.wfile.write(payload)


def main(argv=None):
    """python -m quick_tpu.runtime.api_server --quant_path out/ [--port 8000]"""
    import argparse

    import jax.numpy as jnp

    from quick_tpu.models.auto import AutoQuickModel

    ap = argparse.ArgumentParser()
    ap.add_argument("--quant_path", required=True)
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8000)
    ap.add_argument("--max_slots", type=int, default=8)
    ap.add_argument("--max_seq", type=int, default=2048)
    ap.add_argument("--page_size", type=int, default=64)
    ap.add_argument("--chunk", type=int, default=64)
    ap.add_argument("--kv", choices=["bf16", "int8"], default="bf16")
    ap.add_argument("--logprobs_topk", type=int, default=0, help="serve "
                    "top-K alternative logprobs (OpenAI logprobs/"
                    "top_logprobs fields); sampled-token logprobs are "
                    "always available")
    ap.add_argument("--penalties", action="store_true", help="enable "
                    "repetition/frequency/presence penalty support "
                    "(allocates the [slots, vocab] count state)")
    ap.add_argument("--replicas", type=int, default=1, help="data-parallel "
                    "model replicas (one per device) behind a least-loaded "
                    "router (runtime/router.py)")
    args = ap.parse_args(argv)

    model = AutoQuickModel.from_quantized(args.quant_path)
    engine_kw = dict(
        max_slots=args.max_slots,
        max_seq=args.max_seq, page_size=args.page_size, chunk=args.chunk,
        dtype=jnp.int8 if args.kv == "int8" else jnp.bfloat16,
        logprobs_topk=args.logprobs_topk,
        enable_penalties=args.penalties,
    )
    if args.replicas > 1:
        from quick_tpu.runtime.router import replicated_engines

        eng = replicated_engines(
            model.params, model.cfg, args.replicas, **engine_kw
        )
    else:
        eng = Engine(model.params, model.cfg, **engine_kw)
    srv = APIServer(eng, model.tokenizer, model_name=args.quant_path)
    port = srv.start(args.host, args.port)
    print(f"quick_tpu API server on http://{args.host}:{port}/v1", flush=True)
    try:
        while True:
            time.sleep(3600)
    except KeyboardInterrupt:
        srv.stop()


if __name__ == "__main__":
    main()
