"""The offline bootstrap path: _setup -> load flags -> package benchmark.

Exercises the reference's top-level flow (auto-setup on first load,
4-config benchmark) hermetically with random checkpoints
(PHI3V_TPU_ALLOW_RANDOM=1; 2-layer narrow models via
PHI3V_TPU_RANDOM_OVERRIDES so the one-core CPU suite stays fast).  The
checkpoint tree is built once per module — _setup idempotency is part of
the contract (the reference also reuses its local model dirs)."""

import json
import os

import pytest

_TINY = json.dumps(
    {
        "hidden_size": 256,
        "intermediate_size": 512,
        "num_attention_heads": 8,
        "num_key_value_heads": 8,
    }
)


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    path = tmp_path_factory.mktemp("offline")
    old_cwd = os.getcwd()
    old_env = {
        k: os.environ.get(k)
        for k in (
            "PHI3V_TPU_ALLOW_RANDOM",
            "PHI3V_TPU_RANDOM_LAYERS",
            "PHI3V_TPU_RANDOM_OVERRIDES",
        )
    }
    os.chdir(path)
    os.environ["PHI3V_TPU_ALLOW_RANDOM"] = "1"
    os.environ["PHI3V_TPU_RANDOM_LAYERS"] = "2"
    os.environ["PHI3V_TPU_RANDOM_OVERRIDES"] = _TINY
    yield path
    os.chdir(old_cwd)
    for k, v in old_env.items():
        if v is None:
            os.environ.pop(k, None)
        else:
            os.environ[k] = v


@pytest.mark.slow
def test_setup_and_load_flags(workdir):
    from phi_3_vision_mlx_tpu import api

    lm, proc = api.load(blind_model=True)  # triggers _setup for both models
    assert os.path.exists(api.PATH_ORIGINAL_PHI3_BLIND)
    assert os.path.exists(api.PATH_QUANTIZED_PHI3_BLIND)
    assert os.path.exists(api.PATH_ORIGINAL_PHI3_VISION)
    assert not lm.cfg.has_vision
    lm_q, _ = api.load(blind_model=True, quantize_model=True)
    assert lm_q.cfg.quantized is not None
    lm_qc, _ = api.load(blind_model=True, quantize_cache=True)
    assert lm_qc.cfg.use_quantized_cache
    out = api.generate(
        "Hello", preload=(lm, proc), max_tokens=4, verbose=False,
        stream=False, mute=True,
    )
    assert isinstance(out, list)


@pytest.mark.slow
def test_package_benchmark_harness(workdir):
    """The 4-config x 3-task benchmark writes benchmark.json and the table
    (reference benchmark(), phi_3_vision_mlx.py:1178-1277)."""
    from phi_3_vision_mlx_tpu.bench import benchmark

    results = benchmark(
        blind_model=True, train_first=True, max_tokens=4,
        dataset_path="synthetic",
    )
    assert set(results) == {"vanilla", "q_model", "q_cache", "lora"}
    data = json.load(open("benchmark.json"))
    assert set(data) == {"vanilla", "q_model", "q_cache", "lora"}
    for method, rows in data.items():
        assert len(rows) == 3
        for i, p_tps, g_tps in rows:
            assert g_tps > 0


@pytest.mark.slow
def test_agent_default_toolchain_real_model(workdir):
    """Agent default chain: add_code -> generate -> execute with a real
    (random) model; the code-feedback loop must run without errors."""
    from phi_3_vision_mlx_tpu.agent.agent import Agent

    agent = Agent(blind_model=True, enable_api=False)
    out = agent("Say something.")
    assert "responses" in out and "files" in out
    assert os.path.exists("agent_log.json")
    agent.end()
