"""HTTP completion server (reference /root/reference/server.py).

POST /v1/completions with {"prompt": str | [str], "max_tokens": int, and
optional "temperature"/"top_p"/"top_k"/"min_p"/"seed"/"stop"} -> {"model",
"responses": [...]} using a preloaded model; greedy when temperature is 0
(the default — reference parity).  "stop": string or list of strings —
generation halts and the response is trimmed at the first occurrence.
stdlib HTTPServer — no extra deps.

Example:
    python -m phi_3_vision_mlx_tpu.serve.server --blind --port 8000
    curl -X POST http://localhost:8000/v1/completions \
      -H "Content-Type: application/json" \
      -d '{"prompt": ["Hello", "Explain TPUs."], "max_tokens": 64}'
"""

from __future__ import annotations

import json
from http.server import BaseHTTPRequestHandler, HTTPServer

from ..engine.stream import validate_stops


def _send_json(handler, code: int, obj) -> None:
    payload = json.dumps(obj).encode()
    handler.send_response(code)
    handler.send_header("Content-Type", "application/json")
    handler.send_header("Content-Length", str(len(payload)))
    handler.end_headers()
    handler.wfile.write(payload)


def make_handler(preload):
    from ..api import generate

    class CompletionHandler(BaseHTTPRequestHandler):
        def do_POST(self):
            if self.path != "/v1/completions":
                self.send_error(404)
                return
            try:
                length = int(self.headers.get("Content-Length", 0))
                body = json.loads(self.rfile.read(length) or b"{}")
                prompt = body.get("prompt", "")
                max_tokens = int(body.get("max_tokens", 128))
                temperature = float(body.get("temperature", 0.0))
                try:  # reject malformed stop at parse time (400, not a
                    stop = validate_stops(body.get("stop"))  # mid-decode 500)
                except ValueError as e:
                    _send_json(self, 400, {"error": str(e)})
                    return
                responses = generate(
                    prompt,
                    preload=preload,
                    max_tokens=max_tokens,
                    verbose=False,
                    stream=False,
                    mute=True,
                    sample=temperature > 0,
                    temperature=temperature,
                    top_p=float(body.get("top_p", 1.0)),
                    top_k=int(body.get("top_k", 0)),
                    min_p=float(body.get("min_p", 0.0)),
                    seed=int(body.get("seed", 0)),
                    stop=stop,
                )
                if isinstance(responses, str):
                    responses = [responses]
                payload = json.dumps(
                    {"model": "phi-3-vision-tpu", "responses": responses}
                ).encode()
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(payload)))
                self.end_headers()
                self.wfile.write(payload)
            except Exception as e:  # report errors as JSON, keep serving
                err = json.dumps({"error": str(e)}).encode()
                self.send_response(500)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(err)))
                self.end_headers()
                self.wfile.write(err)

        def log_message(self, fmt, *args):
            pass

    return CompletionHandler


class ContinuousScheduler:
    """Thread-safe front end over :class:`engine.batching.BatchEngine`.

    HTTP handler threads call :meth:`complete`; a single pump thread drives
    ``engine.step()`` so the device always decodes the full active batch —
    requests arriving mid-decode join the running batch instead of queueing
    behind it (the reference can only batch prompts that arrive together).

    Admission never stalls decode: the expensive prefill runs OUTSIDE the
    condition lock (``engine.prepare``), and only the cheap cache adoption
    (``engine.admit``) is serialized with the pump.  Engine errors fail the
    owning requests, not the pump thread.
    """

    def __init__(self, lm, processor, slots: int = 4, window: int = 1024,
                 paged: bool = False, **engine_kw):
        import os
        import threading
        from collections import deque

        if paged:
            from ..engine.paging import PagedBatchEngine as Engine
        else:
            from ..engine.batching import BatchEngine as Engine

        self.engine = Engine(lm, processor, slots=slots, window=window, **engine_kw)
        # The scheduler manages preemption resumes itself so the recompute
        # prefill runs OUTSIDE the lock (engine.step would otherwise do it
        # in-lock, stalling admissions and result pickup for its duration).
        self.engine.resume_in_step = False
        self._cv = threading.Condition()
        # Admission queue: handler threads enqueue tickets; one admission
        # worker drains up to PHI3V_TPU_ADMIT_BATCH of them into a SINGLE
        # batched prefill dispatch (engine.prepare_many) outside the lock.
        self._tickets = deque()
        self._admit_batch = max(1, int(os.environ.get(
            "PHI3V_TPU_ADMIT_BATCH", str(min(8, max(2, slots))))))
        threading.Thread(target=self._admission_worker, daemon=True).start()
        threading.Thread(target=self._pump, daemon=True).start()

    def complete(self, prompt: str, max_tokens: int,
                 temperature: float = 0.0, top_p: float = 1.0,
                 top_k: int = 0, min_p: float = 0.0, stop=None,
                 images=None) -> str:
        ticket = {
            "prompt": prompt, "images": images,
            "opts": dict(max_tokens=max_tokens, temperature=temperature,
                         top_p=top_p, top_k=top_k, min_p=min_p, stop=stop),
            "rid": None, "error": None,
        }
        with self._cv:
            self._tickets.append(ticket)
            self._cv.notify_all()
            while ticket["rid"] is None and ticket["error"] is None:
                self._cv.wait()
            if ticket["error"] is not None:
                raise RuntimeError(ticket["error"])
            req = self.engine.requests[ticket["rid"]]
            while not req.done:
                self._cv.wait()
            return self.engine.result(ticket["rid"])  # raises if failed

    def _admission_worker(self):
        """Drain queued tickets into batched prefill dispatches.

        The prefill (the expensive weight pass) runs OUTSIDE the condition
        lock so the pump keeps decoding; only the cheap per-row cache
        adoption serializes with it.  Tickets arriving while a batch
        prefills ride the next batch — under bursts this converges to
        slots-sized prefill batches instead of one dispatch per request.
        """
        while True:
            with self._cv:
                while not self._tickets:
                    self._cv.wait()
                n = min(len(self._tickets), self._admit_batch)
                batch = [self._tickets.popleft() for _ in range(n)]
            # Image requests prefill one at a time (the vision pipeline is
            # batch-1, reference parity); text requests share one batched
            # prefill dispatch.  Prefill errors stay per-ticket: a bad image
            # must not fail the text requests sharing its admission batch.
            text = [t for t in batch if not t.get("images")]
            vision = [t for t in batch if t.get("images")]
            prepared_pairs = []
            failed = []
            if text:
                try:
                    prepared_pairs += list(zip(text, self.engine.prepare_many(
                        [t["prompt"] for t in text],
                        [t["opts"] for t in text])))
                except Exception as e:
                    failed += [(t, f"{type(e).__name__}: {e}") for t in text]
            for t in vision:
                try:
                    prepared_pairs.append((t, self.engine.prepare(
                        t["prompt"], images=t["images"], **t["opts"]
                    )))
                except Exception as e:
                    failed.append((t, f"{type(e).__name__}: {e}"))
            if failed:
                with self._cv:
                    for t, msg in failed:
                        t["error"] = msg
                    self._cv.notify_all()
            for t, p in prepared_pairs:
                with self._cv:
                    while not self.engine.can_admit(p):
                        self._cv.wait()
                    try:
                        t["rid"] = self.engine.admit(p)
                    except Exception as e:
                        t["error"] = f"{type(e).__name__}: {e}"
                    self._cv.notify_all()

    def _pump(self):
        import os

        chunk = int(os.environ.get("PHI3V_TPU_SLOT_CHUNK", "8"))
        # Pipelined chunks (default): the next chunk is enqueued before the
        # previous one's results are fetched, hiding dispatch+fetch latency
        # behind device compute (engine.step_pipelined).  Opt out with
        # PHI3V_TPU_SLOT_PIPELINE=0.
        pipelined = os.environ.get("PHI3V_TPU_SLOT_PIPELINE", "1") != "0"
        while True:
            with self._cv:
                while not self.engine.pending():
                    self._cv.wait()
                rid = getattr(self.engine, "resume_candidate", lambda: None)()
            prepared = None
            if rid is not None:
                # Recompute prefill for a preempted request — outside the
                # lock, exactly like admission's prepare().
                try:
                    prepared = self.engine.prepare_resume(rid)
                except Exception as e:
                    with self._cv:
                        req = self.engine.requests.get(rid)
                        if req is not None:
                            self.engine._fail_request(
                                req, f"{type(e).__name__}: {e}"
                            )
                        if (
                            self.engine.preempted
                            and self.engine.preempted[0] == rid
                        ):
                            self.engine.preempted.pop(0)
                        self._cv.notify_all()
            with self._cv:
                try:
                    if prepared is not None:
                        self.engine.admit_resume(prepared)
                    if pipelined:
                        # Ticks while pending() covers the final flush: once
                        # by_slot empties, dispatch returns None and the
                        # in-flight chunk is collected.
                        self.engine.step_pipelined(chunk)
                    elif self.engine.by_slot:
                        self.engine.step(chunk)
                except Exception as e:  # fail owners, keep the pump alive
                    self.engine.fail_all_active(f"{type(e).__name__}: {e}")
                self._cv.notify_all()


def make_continuous_handler(scheduler: ContinuousScheduler):
    class ContinuousHandler(BaseHTTPRequestHandler):
        def do_POST(self):
            if self.path != "/v1/completions":
                self.send_error(404)
                return
            try:
                length = int(self.headers.get("Content-Length", 0))
                body = json.loads(self.rfile.read(length) or b"{}")
                prompts = body.get("prompt", "")
                prompts = [prompts] if isinstance(prompts, str) else prompts
                max_tokens = int(body.get("max_tokens", 128))
                temperature = float(body.get("temperature", 0.0))
                top_p = float(body.get("top_p", 1.0))
                top_k = int(body.get("top_k", 0))
                min_p = float(body.get("min_p", 0.0))
                try:
                    stop = validate_stops(body.get("stop"))
                except ValueError as e:
                    _send_json(self, 400, {"error": str(e)})
                    return
                images = body.get("images")
                if images:
                    # "images": list of URLs/paths for ONE prompt.  The
                    # prompt is chat-templated with <|image_i|> tags exactly
                    # like single-stream api.generate, so a vision request
                    # served here is token-exact with generate()'s VQA.
                    if len(prompts) != 1:
                        _send_json(self, 400, {"error":
                                   "images require a single prompt"})
                        return
                    from ..api import _apply_chat_template

                    tmpl, loaded = _apply_chat_template(
                        prompts[0], list(images), verbose=False
                    )
                    responses = [scheduler.complete(
                        tmpl, max_tokens, temperature=temperature,
                        top_p=top_p, top_k=top_k, min_p=min_p, stop=stop,
                        images=loaded,
                    )]
                else:
                    responses = [
                        scheduler.complete(
                            p, max_tokens, temperature=temperature,
                            top_p=top_p, top_k=top_k, min_p=min_p, stop=stop,
                        )
                        for p in prompts
                    ]
                payload = json.dumps(
                    {"model": "phi-3-vision-tpu", "responses": responses}
                ).encode()
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(payload)))
                self.end_headers()
                self.wfile.write(payload)
            except Exception as e:
                err = json.dumps({"error": str(e)}).encode()
                self.send_response(500)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(err)))
                self.end_headers()
                self.wfile.write(err)

        def log_message(self, fmt, *args):
            pass

    return ContinuousHandler


def serve(
    host: str = "127.0.0.1",
    port: int = 8000,
    preload=None,
    continuous: bool = False,
    slots: int = 4,
    window: int = 1024,
    paged: bool = False,
    spec_k: int = 0,
    pipeline_depth: int = 1,
    **load_kwargs,
):
    from ..api import load

    preload = preload or load(**load_kwargs)
    if continuous:
        from http.server import ThreadingHTTPServer

        engine_kw = {"spec_k": spec_k} if spec_k else {}
        if pipeline_depth > 1:
            engine_kw["pipeline_depth"] = pipeline_depth
        scheduler = ContinuousScheduler(
            *preload, slots=slots, window=window, paged=paged, **engine_kw
        )
        httpd = ThreadingHTTPServer((host, port), make_continuous_handler(scheduler))
        print(
            f"Serving (continuous batching, {slots} slots x {window} window) "
            f"on http://{host}:{port}/v1/completions"
        )
    else:
        httpd = HTTPServer((host, port), make_handler(preload))
        print(f"Serving on http://{host}:{port}/v1/completions")
    httpd.serve_forever()


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8000)
    ap.add_argument("--blind", action="store_true")
    ap.add_argument("--quantize", action="store_true")
    ap.add_argument("--continuous", action="store_true",
                    help="continuous batching over a slot pool")
    ap.add_argument("--slots", type=int, default=4)
    ap.add_argument("--window", type=int, default=1024)
    ap.add_argument("--paged", action="store_true",
                    help="page-pool KV (engine/paging.py)")
    ap.add_argument("--spec-k", type=int, default=0,
                    help="per-slot speculative decoding: verify K "
                         "prompt-lookup drafts per step (greedy chunks only)")
    ap.add_argument("--pipeline-depth", type=int, default=1,
                    help="decode chunks kept in flight by the pump; >1 "
                         "amortizes a long dispatch round trip (remote "
                         "tunnel) at the cost of detecting request "
                         "completion up to depth chunks late")
    a = ap.parse_args()
    serve(
        a.host, a.port, blind_model=a.blind, quantize_model=a.quantize,
        continuous=a.continuous, slots=a.slots, window=a.window, paged=a.paged,
        spec_k=a.spec_k, pipeline_depth=a.pipeline_depth,
    )
