"""verify_mlx_record.py (the MLX-side golden recorder) — offline checks.

The script itself needs a Mac with mlx + the reference package; here we run
its actual runner code against a minimal fake ``mlx``/reference shim and
assert the emitted payloads round-trip through verify.py's check parser
(``_diff``) — i.e. the two halves of the parity gate agree on schema,
filenames, prompts, and field names.
"""

import importlib
import json
import sys
import types
from types import SimpleNamespace

import numpy as np
import pytest

import phi_3_vision_mlx_tpu.verify as V

ID_EOS = 32007
VOCAB = 32064


def _fake_mlx():
    """Just enough of mlx.core / mlx.nn for the recorder's numpy-ish calls."""
    mx = types.ModuleType("mlx.core")
    mx.float32 = np.float32
    mx.argmax = lambda a, axis=-1: np.argmax(a, axis=axis)
    mx.eval = lambda *a, **k: None
    nn = types.ModuleType("mlx.nn")

    def log_softmax(x, axis=-1):
        x = np.asarray(x, np.float32)
        m = x.max(axis=axis, keepdims=True)
        e = np.exp(x - m)
        return x - m - np.log(e.sum(axis=axis, keepdims=True))

    nn.log_softmax = log_softmax
    pkg = types.ModuleType("mlx")
    pkg.core, pkg.nn = mx, nn
    return {"mlx": pkg, "mlx.core": mx, "mlx.nn": nn}


class _FakeProcessor:
    def __call__(self, prompt, images=None):
        prompts = [prompt] if isinstance(prompt, str) else list(prompt)
        n = max(4, min(64, len(prompts[0]) // 4))
        rng = np.random.default_rng(len(prompts[0]) % 97)
        return {"input_ids": rng.integers(2, VOCAB, (len(prompts), n))}


class _FakeModel:
    """Deterministic logits; emits EOS after a few steps so loops terminate."""

    def __init__(self):
        self.steps = 0

    def __call__(self, input_ids=None, cache=None, mask=None, pids=None,
                 max_tokens=0, **kw):
        b, l = np.asarray(input_ids).shape
        rng = np.random.default_rng(self.steps)
        logits = rng.standard_normal((b, l, VOCAB)).astype(np.float32)
        if self.steps >= 3:  # force EOS
            logits[:, -1, :] = 0.0
            logits[:, -1, ID_EOS] = 10.0
        self.steps += 1
        return logits, object()

    def set_dtype(self, dt):
        pass


def _fake_ref(tmp_path):
    def _load(path=None, adapter_path=None, use_quantized_cache=False, **kw):
        return _FakeModel(), _FakeProcessor()

    def _choose_from(model, processor, prompt, choices="ABCDE", mute=False):
        prompts = [prompt] if isinstance(prompt, str) else prompt
        return [choices[i % len(choices)] for i in range(len(prompts))]

    def _constrain(model, processor, prompt, constraints, mute=False,
                   verbose=False, use_beam=False, **kw):
        prompts = [prompt] if isinstance(prompt, str) else prompt
        return [f"filler The correct answer is {'ABCDE'[i % 5]}"
                for i in range(len(prompts))]

    def train_lora(**kw):
        pass

    return SimpleNamespace(
        _load=_load, _choose_from=_choose_from, _constrain=_constrain,
        train_lora=train_lora,
        PATH_ORIGINAL_PHI3_BLIND=str(tmp_path / "blind"),
        PATH_QUANTIZED_PHI3_BLIND=str(tmp_path / "blind_q"),
        PATH_ORIGINAL_PHI3_VISION=str(tmp_path / "vision"),
    )


@pytest.fixture()
def recorder(monkeypatch):
    for name, mod in _fake_mlx().items():
        monkeypatch.setitem(sys.modules, name, mod)
    sys.path.insert(0, "/root/repo")
    try:
        rec = importlib.import_module("verify_mlx_record")
    finally:
        sys.path.pop(0)
    return importlib.reload(rec)


def _args(tmp_path, dataset):
    return SimpleNamespace(
        golden=str(tmp_path), dataset=dataset, take=4, long_window=256,
        lora_rank=2, lora_layers=1, blind_path=None, quant_path=None,
        vision_path=None,
    )


def test_schema_constants_match_verify(recorder):
    assert recorder.CFG_NAMES == V.CFG_NAMES
    assert recorder.TOPK == V.TOPK
    assert recorder._PROMPT_CFG1 == V._PROMPT_CFG1
    assert recorder._PROMPTS_CFG2 == V._PROMPTS_CFG2
    assert recorder._PPL_TEXT == V._PPL_TEXT
    from phi_3_vision_mlx_tpu.api import CHAT_TURN

    assert recorder.CHAT_TURN == CHAT_TURN


def test_payloads_roundtrip_through_verify_diff(recorder, tmp_path,
                                                monkeypatch):
    """Every config's recorded payload must parse through verify._diff with
    zero failures against itself, and carry the fields _diff compares."""
    ref = _fake_ref(tmp_path)
    monkeypatch.setattr(
        recorder, "_qa_rows",
        lambda ds, take: [
            {"input": f"Question {i}? A. x B. y", "output": "ABCD"[i % 4],
             "summary": "s"}
            for i in range(take)
        ],
    )
    args = _args(tmp_path, "synthetic")
    expected_fields = {
        1: ("tokens", "top_logits"),
        2: ("tokens",),
        3: ("chosen", "constrained", "beamed"),
        4: ("tokens", "top_logits"),
        5: ("chosen", "long_tokens"),
    }
    for n, runner in recorder.RUNNERS.items():
        payload = runner(ref, args)
        payload.update({"schema": 1, "config": recorder.CFG_NAMES[n],
                        "weights": "real", "recorded_by": "mlx-reference"})
        # write + reload like the script does, then diff against itself
        p = tmp_path / f"{recorder.CFG_NAMES[n]}.json"
        p.write_text(json.dumps(payload))
        golden = json.loads(p.read_text())
        assert V._diff(recorder.CFG_NAMES[n], golden, golden) == []
        for f in expected_fields[n]:
            assert f in golden["cases"][0], (n, f)
        if n == 3:
            assert set(golden["scores"]) == {
                "choose_acc", "constrain_acc", "beam_acc", "quantized_ppl"}
        if n == 5:
            assert "choose_acc_after_lora" in golden["scores"]


def test_diff_catches_token_mismatch(recorder, tmp_path, monkeypatch):
    ref = _fake_ref(tmp_path)
    args = _args(tmp_path, "synthetic")
    payload = recorder.run_cfg1(ref, args)
    fresh = json.loads(json.dumps(payload))
    fresh["cases"][0]["tokens"][0] = fresh["cases"][0]["tokens"][0][:-1] + [7]
    fails = V._diff("cfg1_fp32_greedy_blind", payload, fresh)
    assert fails and "tokens mismatch" in fails[0]


def test_greedy_tokens_eos_trim_matches_verify_semantics(recorder, tmp_path):
    """Rows trim EXCLUSIVE of EOS, exactly like verify._greedy_tokens."""
    ref = _fake_ref(tmp_path)
    model, proc = ref._load()
    rows, top = recorder._greedy_tokens(ref, model, proc, "hello world", 16)
    assert all(ID_EOS not in r for r in rows)
    assert len(top["ids"]) == recorder.TOPK == len(top["vals"])
    assert all(isinstance(v, float) for v in top["vals"])
