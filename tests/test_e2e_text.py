"""End-to-end text flows through the public API on a tiny random checkpoint:
load -> generate/choose/constrain, quantized model, LoRA train/load."""

import os

import numpy as np
import pytest

from phi_3_vision_mlx_tpu.api import _load
from phi_3_vision_mlx_tpu.core import weights as W

VOCAB = 32064  # full id space so the ByteTokenizer's special ids are valid


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("models") / "tiny")
    W.create_random_checkpoint(path, "tiny", vocab_size=VOCAB)
    return path


def test_generate_roundtrip(ckpt):
    lm, proc = _load(ckpt)
    out = __import__("phi_3_vision_mlx_tpu.api", fromlist=["generate"]).generate(
        "Hello world", preload=(lm, proc), max_tokens=8,
        verbose=False, stream=False, mute=True,
    )
    # stream=False -> batch-mode Streamer -> list (reference Streamer.end,
    # phi_3_vision_mlx.py:72-77)
    assert isinstance(out, list) and len(out) == 1 and isinstance(out[0], str)


def test_generate_batch_and_tps(ckpt):
    from phi_3_vision_mlx_tpu.api import generate

    lm, proc = _load(ckpt)
    tps = generate(
        ["One", "Two tokens here"], preload=(lm, proc), max_tokens=6,
        verbose=False, stream=False, mute=True, return_tps=True,
    )
    assert len(tps) == 2 and tps[1] > 0


def test_choose(ckpt):
    from phi_3_vision_mlx_tpu.api import choose

    lm, proc = _load(ckpt)
    out = choose("Pick one: A or B?", choices="AB", preload=(lm, proc), verbose=False)
    assert out in ("A", "B")
    outs = choose(
        ["Pick!", "Choose!"], choices="ABC", preload=(lm, proc), verbose=False
    )
    assert len(outs) == 2 and all(o in "ABC" for o in outs)


def test_constrain_greedy_and_beam(ckpt):
    from phi_3_vision_mlx_tpu.api import constrain

    lm, proc = _load(ckpt)
    for use_beam in (False, True):
        out = constrain(
            "Question?",
            constraints=[(3, " The answer is"), "AB"],
            preload=(lm, proc), verbose=False, use_beam=use_beam,
        )
        assert isinstance(out, str)
        assert "answer is" in out


def test_quantized_model(ckpt, tmp_path):
    from phi_3_vision_mlx_tpu.api import generate

    qpath = str(tmp_path / "tiny_q")
    W.quantize_checkpoint(ckpt, qpath)
    lm, proc = _load(qpath)
    assert lm.cfg.quantized is not None
    out = generate(
        "Hi", preload=(lm, proc), max_tokens=6, verbose=False, stream=False, mute=True
    )
    assert isinstance(out, list) and isinstance(out[0], str)


def test_quantized_weights_close(ckpt, tmp_path):
    """4-bit group-64 weights must preserve the fp forward within tolerance
    (matched-perplexity gate, BASELINE.md)."""
    import jax.numpy as jnp

    from phi_3_vision_mlx_tpu.models import phi3

    qpath = str(tmp_path / "tiny_q2")
    W.quantize_checkpoint(ckpt, qpath)
    cfg_f, params_f = W.load_params(ckpt)
    cfg_q, params_q = W.load_params(qpath)
    # Per-tensor roundtrip: int4 group-64 affine on N(0, s) weights has
    # ~9-10% elementwise error by construction; assert we don't exceed it.
    from phi_3_vision_mlx_tpu.ops.quant import QTensor, dequantize

    wq = params_q["model"]["layers"]["mlp"]["down_proj"]
    # NB: cast bf16 -> f32 *before* numpy arithmetic; numpy's ml_dtypes
    # bfloat16 mixed-dtype ops are unreliable in this environment.
    wf = np.asarray(
        params_f["model"]["layers"]["mlp"]["down_proj"]["weight"], np.float32
    )
    wd = np.asarray(
        dequantize(QTensor(wq["weight"], wq["scales"], wq["biases"]), jnp.float32)
    )
    rel = np.abs(wf - wd).mean() / np.abs(wf).mean()
    assert rel < 0.12, rel
    # End-to-end logits stay directionally aligned (random weights compound
    # the error; trained checkpoints are gated on perplexity instead).
    ids = jnp.arange(1000, 1012)[None]
    lf = np.asarray(phi3.forward_nocache(params_f, cfg_f, ids))[:, -1].ravel()
    lq = np.asarray(phi3.forward_nocache(params_q, cfg_q, ids))[:, -1].ravel()
    cos = float(
        (lf @ lq) / (np.linalg.norm(lf) * np.linalg.norm(lq) + 1e-9)
    )
    assert cos > 0.75, cos


def test_train_and_use_lora(ckpt, tmp_path, monkeypatch):
    from phi_3_vision_mlx_tpu.train.trainer import train_lora

    monkeypatch.chdir(tmp_path)
    adapter = str(tmp_path / "adapters" / "tiny")
    train_lora(
        model_path=ckpt, adapter_path=adapter, lora_layers=1, lora_rank=2,
        epochs=1, batch_size=1, take=2, dataset_path="synthetic",
    )
    assert os.path.exists(f"{adapter}/adapters.safetensors")
    assert os.path.exists(f"{adapter}/adapter_config.json")
    lm, proc = _load(ckpt, adapter_path=adapter)
    layers = lm.params["model"]["layers"]
    assert "lora_a" in layers["self_attn"]["qkv_proj"]
    from phi_3_vision_mlx_tpu.api import generate

    out = generate(
        "Q", preload=(lm, proc), max_tokens=4, verbose=False, stream=False, mute=True
    )
    assert isinstance(out, list) and isinstance(out[0], str)


def test_train_lora_with_mask_ratios(ckpt, tmp_path, monkeypatch):
    from phi_3_vision_mlx_tpu.train.trainer import train_lora

    monkeypatch.chdir(tmp_path)
    adapter = str(tmp_path / "adapters" / "tiny_mask")
    train_lora(
        model_path=ckpt, adapter_path=adapter, lora_layers=[0], lora_rank=1,
        epochs=1, batch_size=1, take=1, dataset_path="synthetic",
        mask_ratios=[0.1],
    )
    assert os.path.exists(f"{adapter}/adapters.safetensors")


def test_train_lora_over_quantized_base(ckpt, tmp_path, monkeypatch):
    """LoRA over a 4-bit quantized base (reference LoRALinear.from_linear on
    nn.QuantizedLinear, phi.py:93-95): gradients flow through the dequantized
    base; adapters save/load in the same format."""
    from phi_3_vision_mlx_tpu.train.trainer import train_lora
    from phi_3_vision_mlx_tpu.core import weights as W

    monkeypatch.chdir(tmp_path)
    qpath = str(tmp_path / "tiny_q_lora")
    W.quantize_checkpoint(ckpt, qpath)
    adapter = str(tmp_path / "adapters" / "tiny_q")
    train_lora(
        model_path=qpath, adapter_path=adapter, lora_layers=2, lora_rank=2,
        epochs=1, batch_size=1, take=2, dataset_path="synthetic",
    )
    assert os.path.exists(f"{adapter}/adapters.safetensors")
    lm, proc = _load(qpath, adapter_path=adapter)
    assert lm.cfg.quantized is not None
    assert "lora_a" in lm.params["model"]["layers"]["self_attn"]["qkv_proj"]
    from phi_3_vision_mlx_tpu.api import generate

    out = generate(
        "Q", preload=(lm, proc), max_tokens=4, verbose=False, stream=False, mute=True
    )
    assert isinstance(out, list)


def test_train_lora_with_dropout(ckpt, tmp_path, monkeypatch):
    """LoRA-branch dropout (reference LoRALinear dropout knob, phi.py:87)."""
    from phi_3_vision_mlx_tpu.train.trainer import train_lora

    monkeypatch.chdir(tmp_path)
    adapter = str(tmp_path / "adapters" / "tiny_drop")
    train_lora(
        model_path=ckpt, adapter_path=adapter, lora_layers=1, lora_rank=2,
        epochs=1, batch_size=1, take=2, dataset_path="synthetic",
        lora_dropout=0.3,
    )
    assert os.path.exists(f"{adapter}/adapters.safetensors")
    import json

    cfg = json.load(open(f"{adapter}/adapter_config.json"))
    assert cfg["lora_parameters"]["dropout"] == 0.3


@pytest.mark.slow
def test_train_lora_resume(ckpt, tmp_path, monkeypatch):
    """Orbax mid-run resume: checkpoint at step 1 of 2, resume, and the final
    adapter equals the uninterrupted run's."""
    from safetensors.numpy import load_file as load_safetensors

    from phi_3_vision_mlx_tpu.train.trainer import train_lora

    monkeypatch.chdir(tmp_path)
    kw = dict(
        model_path=ckpt, lora_layers=1, lora_rank=2, epochs=1,
        batch_size=1, take=2, dataset_path="synthetic", seed=3,
    )
    full = str(tmp_path / "ad_full")
    train_lora(adapter_path=full, **kw)

    resumed = str(tmp_path / "ad_resumed")
    train_lora(adapter_path=resumed, checkpoint_every=1, **kw)
    # wipe the adapter artifact, keep train_state, resume from step 1
    os.remove(f"{resumed}/adapters.safetensors")
    import shutil

    state_dir = str(tmp_path / "state_backup")
    shutil.move(f"{resumed}/train_state", state_dir)
    # drop the step-2 checkpoint so resume starts mid-run
    steps = sorted(os.listdir(state_dir))
    shutil.rmtree(os.path.join(state_dir, steps[-1]))
    shutil.move(state_dir, f"{resumed}/train_state")
    train_lora(adapter_path=resumed, resume=True, **kw)

    a = load_safetensors(f"{full}/adapters.safetensors")
    b = load_safetensors(f"{resumed}/adapters.safetensors")
    assert set(a) == set(b)
    for k in a:
        np.testing.assert_allclose(
            np.asarray(a[k], np.float32), np.asarray(b[k], np.float32),
            rtol=1e-5, atol=1e-6,
        )
