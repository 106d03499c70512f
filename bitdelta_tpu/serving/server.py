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

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Dict, List, Optional, Sequence

from .engine import Engine, Request


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
    agnostic; the HTTP handler below is one transport)."""

    def __init__(self, engine: Engine, tenants: List[TenantInfo]):
        if engine.stack.num_tenants != len(tenants):
            raise ValueError("tenant metadata count != stacked tenants")
        self.engine = engine
        self.tenants = tenants
        self._step_lock = threading.Lock()

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
                stop_token_ids=tn.stop_token_ids,
                request_id=f"t{tid}"))
            metas.append(tn)

        eng = self.engine
        with self._step_lock:
            slot_to_i: Dict[int, int] = {}
            texts = [""] * len(reqs)
            gens: List[List[int]] = [[] for _ in reqs]
            for i, r in enumerate(reqs):
                slot = eng.submit(r)
                slot_to_i[slot] = i
                first = eng.slots[slot].generated[0]
                if first not in metas[i].stop_token_ids:
                    gens[i].append(first)
                    texts[i] = metas[i].tokenizer.decode(gens[i])
                    yield json.dumps({"tenant": metas[i].name,
                                      "token_id": first,
                                      "text": texts[i], "done": False}) + "\n"
            while slot_to_i:
                for ev in eng.step():
                    i = slot_to_i.get(ev.slot)
                    if i is None:
                        continue
                    is_stop = ev.finished and ev.finish_reason == "stop"
                    # The engine appends exactly one token per step event;
                    # stop tokens are excluded from the visible text.
                    if not is_stop and len(gens[i]) < len(
                            self.engine.slots[ev.slot].generated):
                        gens[i].append(ev.token)
                        texts[i] = metas[i].tokenizer.decode(gens[i])
                    yield json.dumps({"tenant": metas[i].name,
                                      "token_id": ev.token,
                                      "text": texts[i],
                                      "done": ev.finished}) + "\n"
                    if ev.finished:
                        del slot_to_i[ev.slot]


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
