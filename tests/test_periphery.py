"""Periphery: tokenizer, VDB/get_api routing, Agent toolchain DSL, execute
sandbox, HTTP server."""

import json

import numpy as np

from phi_3_vision_mlx_tpu.models.tokenizer import ByteTokenizer, SPECIAL_IDS


def test_byte_tokenizer_roundtrip():
    tok = ByteTokenizer()
    s = "<|user|>\nHello, world! <|end|>\n<|assistant|>\nHi."
    ids = tok.encode(s)
    assert ids[0] == 1  # BOS
    assert SPECIAL_IDS["<|user|>"] in ids and SPECIAL_IDS["<|end|>"] in ids
    assert tok.decode(ids) == s
    batch = tok(["a", "bb"])
    assert len(batch.input_ids) == 2


def test_vdb_lexical_routing():
    from phi_3_vision_mlx_tpu.models.gte import VDB, HashEmbedder

    vdb = VDB(embed=HashEmbedder())
    hits = vdb(["Transcribe youtube video for me"])
    assert "youtube" in hits[0][0].lower()
    hits = vdb(["Text to speech conversion"])
    assert "speech" in hits[0][0].lower()


def test_get_api_formats_prompt():
    from phi_3_vision_mlx_tpu.agent.tools import get_api

    codes = get_api("Transcribe youtube video <|api_input|> http://x.test/v", verbose=False)
    assert len(codes) == 1
    assert "http://x.test/v" in codes[0]
    assert "{prompt}" not in codes[0]


def test_execute_sandbox(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    from phi_3_vision_mlx_tpu.api import execute

    out = execute("```python\nprint(21*2)\n```", verbose=False)
    assert out["souts"][0] == "42"
    assert out["serrs"][0] is None
    bad = execute("```python\nraise ValueError('x')\n```", verbose=False)
    assert "ValueError" in bad["serrs"][0]


def test_agent_toolchain_dsl(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    from phi_3_vision_mlx_tpu.agent.agent import Agent

    calls = []

    def fake_generate(prompt, images=None):
        calls.append(prompt)
        return f"echo: {prompt}"

    agent = Agent(
        toolchain="responses = generate(prompt, images)",
        enable_api=False,
        tools={"generate": fake_generate},
        preload=("model", "proc"),
    )
    out = agent("hello")
    assert out["responses"] == "echo: hello"
    assert calls == ["hello"]
    log = json.load(open("agent_log.json"))
    assert log[0]["prompt"] == "hello"
    # toolchain hot-swap (reference set_toolchain)
    agent.set_toolchain("responses = generate(prompt, images)\nreturn responses")
    assert agent.list_outs == ["responses"]


def test_agent_quote_to_api_input(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    from phi_3_vision_mlx_tpu.agent.agent import Agent

    seen = {}

    def probe(prompt, images=None):
        seen["prompt"] = prompt
        return "ok"

    agent = Agent(
        toolchain="responses = generate(prompt, images)",
        enable_api=True,
        tools={"generate": probe},
        preload=("m", "p"),
    )
    agent('Draw "a red apple"')
    assert "<|api_input|>" in seen["prompt"]


def test_chat_session_turns():
    from phi_3_vision_mlx_tpu.serve.ui import ChatSession

    seen = []

    class FakeAgent:
        def __call__(self, prompt, images=None):
            seen.append((prompt, images))
            return {"responses": f"hi<|end|>\njunk", "files": ["plot.png"]}

        def end(self):
            seen.append("end")

    s = ChatSession(FakeAgent())
    s.add_user_message("what is this?", ["/tmp/img.png"])
    history = s.run_agent()
    assert seen[0] == ("what is this?", ["/tmp/img.png"])
    assert history[-2] == (None, "hi")  # <|end|>-trimmed, blank lines dropped
    assert history[-1] == (None, ("plot.png",))
    # next turn starts fresh (no stale uploads)
    s.add_user_message("and now?", [])
    s.run_agent()
    assert seen[1] == ("and now?", None)
    assert s.reset() == [] and seen[-1] == "end"


def test_training_callback_artifacts(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    from phi_3_vision_mlx_tpu.train.trainer import TrainingCallback

    lora_cfg = {"adapter_path": str(tmp_path / "ad"), "lora_layers": 1}
    cb = TrainingCallback(lora_cfg, np.linspace(0, 1, 3), [[0], [1], [2]])
    saved = []
    cb._save_adapter = lambda: saved.append(cb.current_step)
    for loss in (3.0, 2.0, 1.0):
        cb(loss)
    assert saved == [3]  # best-avg checkpointing at sum_every=3
    cb.end_log()
    assert (tmp_path / "ad" / "adapter_config.json").exists()
    assert (tmp_path / "ad" / "adapter_train_log.json").exists()
