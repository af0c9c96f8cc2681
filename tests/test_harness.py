"""Evaluation harness + HTTP server end-to-end on a tiny checkpoint."""

import json
import threading
import urllib.request

import pytest

from phi_3_vision_mlx_tpu.core import weights as W

VOCAB = 32064


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("models") / "tiny")
    W.create_random_checkpoint(path, "tiny", vocab_size=VOCAB)
    return path


@pytest.mark.slow
def test_test_lora_harness(ckpt, tmp_path, monkeypatch):
    """The 4-method eval harness (recall, choose, constrain, beam) must run
    end-to-end, print scores, and write the CSV (reference test_lora,
    phi_3_vision_mlx.py:1048-1176)."""
    monkeypatch.chdir(tmp_path)
    from phi_3_vision_mlx_tpu.train.trainer import test_lora

    scores = test_lora(
        model_path=ckpt,
        adapter_path=None,
        dataset_path="synthetic",
        take=(0, 2),
        batch_size=2,
        test_result_path=str(tmp_path / "result.csv"),
    )
    assert set(scores) == {"choose", "constrain", "beam"}
    import csv

    with open(tmp_path / "result.csv", newline="") as f:
        rows = list(csv.reader(f))  # fields may contain newlines
    assert len(rows) == 3  # header + 2 samples
    header = ",".join(rows[0])
    for col in ("summary_attempt", "choice_attempt", "constrained_attempt", "beamed_attempt"):
        assert col in header


@pytest.mark.slow
def test_http_server(ckpt):
    """POST /v1/completions returns batched responses (reference server.py)."""
    from phi_3_vision_mlx_tpu.api import _load
    from phi_3_vision_mlx_tpu.serve.server import make_handler
    from http.server import HTTPServer

    preload = _load(ckpt)
    httpd = HTTPServer(("127.0.0.1", 0), make_handler(preload))
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        body = json.dumps({"prompt": ["Hello", "World"], "max_tokens": 4}).encode()
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/v1/completions",
            data=body,
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=600) as resp:
            payload = json.loads(resp.read())
        assert payload["model"] == "phi-3-vision-tpu"
        assert len(payload["responses"]) == 2
        # error path: malformed body -> 500 with JSON error, server survives
        req_bad = urllib.request.Request(
            f"http://127.0.0.1:{port}/v1/completions",
            data=b"{not json",
            headers={"Content-Type": "application/json"},
        )
        try:
            urllib.request.urlopen(req_bad, timeout=120)
            assert False, "expected HTTP 500"
        except urllib.error.HTTPError as e:
            assert e.code == 500
            assert "error" in json.loads(e.read())
    finally:
        httpd.shutdown()


def test_orbax_train_state_roundtrip(tmp_path):
    """Full train-state checkpoint/resume (improvement over the reference,
    which saves only adapter weights — SURVEY.md §5)."""
    import jax.numpy as jnp
    import numpy as np
    from phi_3_vision_mlx_tpu.train import checkpoint as C

    mgr = C.make_manager(str(tmp_path / "ckpts"))
    trainable = {"a": jnp.arange(6.0).reshape(2, 3), "b": {"c": jnp.ones((4,))}}
    opt_state = {"mu": jnp.zeros((2, 3))}
    C.save_train_state(mgr, 3, trainable, opt_state, extra={"step": 3})
    restored, step = C.restore_train_state(
        mgr, template={"trainable": trainable, "opt_state": opt_state, "extra": {"step": 0}}
    )
    assert step == 3
    np.testing.assert_array_equal(
        np.asarray(restored["trainable"]["a"]), np.asarray(trainable["a"])
    )
    assert restored["extra"]["step"] == 3
