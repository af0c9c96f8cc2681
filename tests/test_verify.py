"""The parity runbook's offline dry-run: record goldens from random tiny
checkpoints, check against them (must pass), then corrupt a golden (must
fail).  With real checkpoints the same entry point runs the BASELINE gates
against MLX-recorded goldens (verify.py module docstring)."""

import json
import os

import pytest

from phi_3_vision_mlx_tpu import verify
from phi_3_vision_mlx_tpu.core import weights as W

VOCAB = 32064


@pytest.fixture(scope="module")
def paths(tmp_path_factory):
    root = tmp_path_factory.mktemp("verify")
    blind = str(root / "blind")
    blind_q = str(root / "blind_q")
    vision = str(root / "vision")
    W.create_random_checkpoint(blind, "tiny", vocab_size=VOCAB)
    W.quantize_checkpoint(blind, blind_q)
    W.create_random_checkpoint(vision, "tiny_vision", vocab_size=VOCAB)
    return {"blind": blind, "blind_q": blind_q, "vision": vision,
            "golden": str(root / "goldens")}


def _args(paths, mode, configs):
    return [
        mode, "--golden", paths["golden"], "--configs", configs,
        "--dataset", "synthetic", "--take", "2", "--long-window", "256",
        "--lora-rank", "2", "--lora-layers", "2",
        "--blind-path", paths["blind"], "--quant-path", paths["blind_q"],
        "--vision-path", paths["vision"],
    ]


@pytest.mark.slow
def test_record_then_check_green(paths, monkeypatch, tmp_path):
    monkeypatch.chdir(tmp_path)  # cfg4 writes its test image to cwd
    assert verify.main(_args(paths, "record", "1,2,3,4,5")) == 0
    for n, name in verify.CFG_NAMES.items():
        golden = json.load(
            open(os.path.join(paths["golden"], f"{name}.json"))
        )
        assert golden["schema"] == 1 and golden["cases"], name
    assert verify.main(_args(paths, "check", "1,2,3,4,5")) == 0


def test_corrupted_golden_fails(paths, monkeypatch, tmp_path):
    monkeypatch.chdir(tmp_path)
    path = os.path.join(paths["golden"], "cfg1_fp32_greedy_blind.json")
    if not os.path.exists(path):  # quick runs deselect the slow recorder
        assert verify.main(_args(paths, "record", "1")) == 0
    golden = json.load(open(path))
    golden["cases"][0]["tokens"][0][0] ^= 1  # flip a token id
    corrupt = json.dumps(golden)
    with open(path, "w") as f:
        f.write(corrupt)
    assert verify.main(_args(paths, "check", "1")) == 1
