"""HTTP completion server (reference /root/reference/server.py).

POST /v1/completions with {"prompt": str | [str], "max_tokens": int} ->
{"model", "responses": [...]} using a preloaded model and batched greedy
generation.  stdlib HTTPServer — no extra dependencies.

Example:
    python -m phi_3_vision_mlx_tpu.serve.server --blind --port 8000
    curl -X POST http://localhost:8000/v1/completions \
      -H "Content-Type: application/json" \
      -d '{"prompt": ["Hello", "Explain TPUs."], "max_tokens": 64}'
"""

from __future__ import annotations

import json
from http.server import BaseHTTPRequestHandler, HTTPServer


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
                responses = generate(
                    prompt,
                    preload=preload,
                    max_tokens=max_tokens,
                    verbose=False,
                    stream=False,
                    mute=True,
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


def serve(host: str = "127.0.0.1", port: int = 8000, preload=None, **load_kwargs):
    from ..api import load

    preload = preload or load(**load_kwargs)
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
    a = ap.parse_args()
    serve(a.host, a.port, blind_model=a.blind, quantize_model=a.quantize)
