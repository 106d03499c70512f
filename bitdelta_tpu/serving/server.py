"""Multi-tenant HTTP serving API.

API-parity replacement for the reference's FastAPI demo backend
(reference demo/demo_backend.py:185-315):

  GET  /models    -> {"models": [tenant names]}
  POST /generate  -> NDJSON stream; body:
       {"prompt": str | "messages": [{role, content}, ...],
        "tenant": name-or-index | omitted = broadcast to ALL tenants
        (the reference demo's mode: one conversation fanned out to every
        fine-tune in a single batch, demo_backend.py:261-315),
        "max_new_tokens": int, "temperature": float}

Stdlib ``http.server`` (threaded) instead of FastAPI/uvicorn — zero
extra dependencies, and the engine below it is thread-safe. Each
streamed line is ``{"tenant": name, "token_id": int, "text": str,
"done": bool}``.

Tokenization is pluggable: any object with ``encode(str) -> list[int]``
and ``decode(list[int]) -> str`` (HF tokenizers qualify); chat messages
use ``apply_chat_template`` when the tokenizer provides it, else a plain
role-prefixed concatenation.
"""

from __future__ import annotations

import itertools
import json
import queue
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Dict, List, Optional, Sequence

from .engine import Engine, EngineFullError, Request


class ByteTokenizer:
    """Dependency-free fallback tokenizer (1 byte = 1 token; offset to
    keep 0 free as padding). Used in tests and smoke serving."""

    vocab_size = 258
    eos_token_id = 257

    def encode(self, text: str) -> List[int]:
        return [b + 1 for b in text.encode("utf-8")]

    def decode(self, ids: Sequence[int]) -> str:
        return bytes(i - 1 for i in ids
                     if 1 <= i <= 256).decode("utf-8", errors="replace")

    def __call__(self, text, **kw):
        # HF-tokenizer-call compatibility (eval corpus tokenization).
        if isinstance(text, str):
            return {"input_ids": self.encode(text)}
        return {"input_ids": [self.encode(t) for t in text]}


def render_chat(tokenizer, messages: List[dict], system_prompt: str = "") -> str:
    if hasattr(tokenizer, "apply_chat_template"):
        try:
            return tokenizer.apply_chat_template(
                messages, tokenize=False, add_generation_prompt=True)
        except Exception:
            pass
    parts = [system_prompt] if system_prompt else []
    for m in messages:
        parts.append(f"{m['role']}: {m['content']}")
    parts.append("assistant:")
    return "\n".join(parts)


class TenantInfo:
    def __init__(self, name: str, tokenizer, stop_token_ids=(),
                 system_prompt: str = ""):
        self.name = name
        self.tokenizer = tokenizer
        self.stop_token_ids = tuple(stop_token_ids)
        if not self.stop_token_ids:
            eos = getattr(tokenizer, "eos_token_id", None)
            if eos is not None:
                self.stop_token_ids = (eos,)
        self.system_prompt = system_prompt


class ServingApp:
    """Engine + tenant metadata + request orchestration (transport-
    agnostic; the HTTP handler below is one transport).

    Continuous batching at the HTTP layer: one shared stepper thread
    drives ``engine.step()`` for ALL in-flight requests; each stream
    consumes its own event queue, so concurrent clients interleave in
    the same device batch instead of serializing (the reference demo
    locksteps the whole batch, demo_backend.py:190-258)."""

    def __init__(self, engine: Engine, tenants: List[TenantInfo]):
        if engine.stack.num_tenants != len(tenants):
            raise ValueError("tenant metadata count != stacked tenants")
        self.engine = engine
        self.tenants = tenants
        self._mu = threading.Lock()          # engine admission + queue map
        self._slot_free = threading.Condition(self._mu)
        self._queues: Dict[str, "queue.Queue"] = {}   # request_id -> q
        self._wake = threading.Event()
        self._reqid = itertools.count()
        self.admission_timeout = 300.0       # seconds to wait for a slot
        self._stepper = threading.Thread(target=self._step_loop,
                                         daemon=True, name="engine-stepper")
        self._stepper.start()

    def _step_loop(self):
        from .engine import StepEvent

        while True:
            self._wake.wait()
            # engine.pump() (pipelined step: next chunk dispatches
            # before the previous one's readback) runs OUTSIDE the app
            # lock (the engine has its own) so admissions — which only
            # need the lock for queue registration — never wait behind
            # a decode chunk.
            try:
                events = self.engine.pump()
            except Exception as exc:  # noqa: BLE001 — must not die:
                # a dead stepper would wedge every stream on q.get().
                import logging

                logging.getLogger(__name__).exception(
                    "engine.step failed: %s", exc)
                with self._mu:
                    for rid, q in list(self._queues.items()):
                        q.put(StepEvent(slot=-1, request_id=rid, token=-1,
                                        finished=True, finish_reason="error",
                                        new_token=False))
                    self._queues.clear()
                    for s in self.engine.slots:
                        s.active = False
                self._wake.clear()
                if any(s.active for s in self.engine.slots):
                    self._wake.set()  # admission landed during cleanup
                continue
            with self._mu:
                finished_any = False
                for ev in events:
                    finished_any |= ev.finished
                    q = self._queues.get(ev.request_id)
                    if q is not None:
                        q.put(ev)
                        if ev.finished:
                            self._queues.pop(ev.request_id, None)
                if finished_any:
                    self._slot_free.notify_all()
            if not any(s.active for s in self.engine.slots):
                # Clear-then-RECHECK: an admission activates its slot
                # (engine lock) BEFORE setting _wake, so either our
                # clear precedes its set (the set survives) or the
                # recheck sees the active slot and re-arms. Without the
                # recheck, an admission landing between the check and
                # the clear would be stranded (lost wakeup) because its
                # stream blocks in q.get() with no timeout.
                self._wake.clear()
                if any(s.active for s in self.engine.slots):
                    self._wake.set()

    def resolve_tenant(self, spec) -> int:
        if spec is None:
            raise ValueError("tenant required")
        if isinstance(spec, int):
            if not 0 <= spec < len(self.tenants):
                raise ValueError(f"tenant index {spec} out of range")
            return spec
        for i, t in enumerate(self.tenants):
            if t.name == spec:
                return i
        raise ValueError(f"unknown tenant {spec!r}")

    def model_names(self) -> List[str]:
        return [t.name for t in self.tenants]

    def _prompt_ids(self, tenant: TenantInfo, body: dict) -> List[int]:
        if "prompt" in body:
            text = body["prompt"]
        elif "messages" in body:
            text = render_chat(tenant.tokenizer, body["messages"],
                               tenant.system_prompt)
        else:
            raise ValueError("need 'prompt' or 'messages'")
        return list(tenant.tokenizer.encode(text))

    def generate_stream(self, body: dict):
        """Yields NDJSON lines. Broadcast mode (no 'tenant') runs every
        tenant on the same conversation in one batch — reference demo
        parity."""
        max_new = int(body.get("max_new_tokens", 128))
        temp = float(body.get("temperature", 0.0))
        top_k = int(body.get("top_k", 0))
        top_p = float(body.get("top_p", 1.0))
        if body.get("tenant") is not None:
            tenant_ids = [self.resolve_tenant(body["tenant"])]
        else:
            tenant_ids = list(range(len(self.tenants)))

        reqs, metas = [], []
        for tid in tenant_ids:
            tn = self.tenants[tid]
            reqs.append(Request(
                prompt_ids=self._prompt_ids(tn, body), tenant_id=tid,
                max_new_tokens=max_new, temperature=temp,
                top_k=top_k, top_p=top_p,
                stop_token_ids=tn.stop_token_ids))
            metas.append(tn)

        eng = self.engine
        q: "queue.Queue" = queue.Queue()
        rid_to_i: Dict[str, int] = {}
        texts = [""] * len(reqs)
        gens: List[List[int]] = [[] for _ in reqs]
        first_lines: List[str] = []
        import time as _time

        deadline = _time.monotonic() + self.admission_timeout
        try:
            for i, r in enumerate(reqs):
                r.request_id = f"req{next(self._reqid)}"
                # Register the event queue BEFORE submitting so the
                # stepper can never emit tokens for this request into
                # the void; submit itself runs WITHOUT the app lock —
                # its device prefill must not stall concurrent streams
                # (the engine serializes only the cache insert).
                with self._mu:
                    self._queues[r.request_id] = q
                    rid_to_i[r.request_id] = i
                while True:
                    try:
                        eng.submit(r)
                        break
                    except EngineFullError:
                        # Wait for capacity, bounded-polling: the
                        # notification can be missed when the stepper
                        # notifies between our submit and wait (submit
                        # runs outside _mu), and slots freed by
                        # cancel() emit no event at all — so re-try the
                        # submit on every short timeout instead of
                        # trusting one long wait.
                        with self._mu:
                            remaining = deadline - _time.monotonic()
                            if remaining <= 0:
                                raise RuntimeError(
                                    "engine full (timed out waiting for "
                                    "a free slot)")
                            self._slot_free.wait(
                                timeout=min(0.25, remaining))
                self._wake.set()
                # First generated token comes from the prefill logits.
                first = r.first_token
                if first not in metas[i].stop_token_ids:
                    gens[i].append(first)
                    texts[i] = metas[i].tokenizer.decode(gens[i])
                    first_lines.append(json.dumps(
                        {"tenant": metas[i].name, "token_id": first,
                         "text": texts[i], "done": False}) + "\n")
        except Exception:
            with self._mu:
                for rid in rid_to_i:
                    self._queues.pop(rid, None)
            raise
        try:
            yield from first_lines
            while rid_to_i:
                ev = q.get()
                i = rid_to_i.get(ev.request_id)
                if i is None:
                    continue
                is_stop = ev.finished and ev.finish_reason == "stop"
                # Stop tokens and already-delivered finish-only tokens
                # are excluded from the visible text.
                if ev.new_token and not is_stop:
                    gens[i].append(ev.token)
                    texts[i] = metas[i].tokenizer.decode(gens[i])
                yield json.dumps({"tenant": metas[i].name,
                                  "token_id": ev.token,
                                  "text": texts[i],
                                  "done": ev.finished}) + "\n"
                if ev.finished:
                    del rid_to_i[ev.request_id]
        finally:
            # Client gone mid-stream: stop routing events AND cancel the
            # engine work — an abandoned stream must not keep burning
            # decode lanes to max_new_tokens.
            if rid_to_i:
                with self._mu:
                    for rid in rid_to_i:
                        self._queues.pop(rid, None)
                for rid in rid_to_i:
                    eng.cancel(rid)


def make_http_server(app: ServingApp, host: str = "0.0.0.0",
                     port: int = 8000) -> ThreadingHTTPServer:
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):  # quiet
            pass

        def do_GET(self):
            if self.path in ("/", "/index.html"):
                from .frontend import INDEX_HTML

                payload = INDEX_HTML.encode()
                self.send_response(200)
                self.send_header("Content-Type", "text/html; charset=utf-8")
                self.send_header("Content-Length", str(len(payload)))
                self.end_headers()
                self.wfile.write(payload)
            elif self.path == "/models":
                payload = json.dumps({"models": app.model_names()}).encode()
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(payload)))
                self.end_headers()
                self.wfile.write(payload)
            elif self.path == "/stats":
                from .stacking import stack_nbytes

                eng = app.engine
                payload = json.dumps({
                    "slots_total": eng.max_slots,
                    "slots_free": len(eng.free_slots()),
                    "max_seq": eng.max_seq,
                    "kernel": eng.kernel,
                    "tenants": app.model_names(),
                    "memory_bytes": stack_nbytes(eng.stack),
                    "decode": eng.timer.summary(),
                    "decode_chunk": eng.decode_chunk,
                    "warmed": eng.warmed,
                }).encode()
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(payload)))
                self.end_headers()
                self.wfile.write(payload)
            else:
                self.send_error(404)

        def do_POST(self):
            if self.path != "/generate":
                self.send_error(404)
                return
            try:
                length = int(self.headers.get("Content-Length", 0))
                body = json.loads(self.rfile.read(length) or b"{}")
            except Exception:
                self.send_error(400, "bad json")
                return
            try:
                stream = app.generate_stream(body)
                first = next(stream)
            except (ValueError, RuntimeError) as e:
                payload = json.dumps({"error": str(e)}).encode()
                self.send_response(400)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(payload)))
                self.end_headers()
                self.wfile.write(payload)
                return
            self.send_response(200)
            self.send_header("Content-Type", "application/x-ndjson")
            self.end_headers()
            try:
                self.wfile.write(first.encode())
                self.wfile.flush()
                for line in stream:
                    self.wfile.write(line.encode())
                    self.wfile.flush()
            except BrokenPipeError:
                pass

    return ThreadingHTTPServer((host, port), Handler)
