#!/usr/bin/env python
"""Record BASELINE parity goldens FROM THE MLX REFERENCE (run on a Mac).

This is the reference-side half of the real-weight parity gate
(``phi_3_vision_mlx_tpu/verify.py``): it drives the *original*
``phi_3_vision_mlx`` package (https://github.com/JosefAlbers/Phi-3-Vision-MLX)
and writes goldens in verify.py's exact schema-1 JSON, so the two-command
recipe closes the gate with zero new code:

    # on a Mac with mlx + phi_3_vision_mlx installed (downloads checkpoints):
    python verify_mlx_record.py --golden goldens/ --configs 1,2,3,4,5

    # on the TPU host, against the same checkpoints:
    python -m phi_3_vision_mlx_tpu.verify check --golden goldens/

Config map (BASELINE.md):
  1  fp32 greedy blind decode, 64 tokens       (token ids + top-8 fp32 logits)
  2  8 prompts x 100 tokens, quantized cache   (token ids per row)
  3  4-bit model: choose/constrain/beam on QA rows + quantized perplexity
  4  single-image VQA, greedy 32 tokens        (token ids + top-8 fp32 logits)
  5  rank-16/5-layer LoRA train -> adapter choose accuracy + long-window decode

Reference call sites mirrored here: ``_generate``'s greedy loop
(phi_3_vision_mlx.py:376-409), ``_choose_from`` (:466-487), ``_constrain``
(:500-619), ``train_lora`` (:898+), chat template (:341-357).  The prompts,
dataset rows, trim rules, and payload fields are kept bit-identical to
``phi_3_vision_mlx_tpu.verify``'s runners — the check-side parser is the
contract (tests/test_verify.py round-trips this script's output format).

Only stdlib + the reference package (+ datasets, PIL) are imported; this
script is NOT runnable in the offline TPU environment — it exists so anyone
with a Mac can produce goldens.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from typing import List

import numpy as np

TOPK = 8
ID_EOS = 32007
CHAT_TURN = "<|user|>\n{body}<|end|>\n<|assistant|>\n"

CFG_NAMES = {
    1: "cfg1_fp32_greedy_blind",
    2: "cfg2_batch_quantized_cache",
    3: "cfg3_quantized_constrain_choose",
    4: "cfg4_vision_vqa",
    5: "cfg5_lora_long_context",
}

# Identical to phi_3_vision_mlx_tpu/verify.py — the prompts ARE the contract.
_PROMPT_CFG1 = "Write a mystery horror."
_PROMPTS_CFG2 = [
    "Explain quantum computing.",
    "Write a poem about the first snowfall of the year.",
    "Describe the water cycle.",
    "Summarize the major events of the French Revolution.",
    "Write a resume.",
    "Explain the concept of dark matter.",
    "Compose a limerick about a clumsy robot.",
    "Describe a bustling alien marketplace.",
]
_PPL_TEXT = (
    "The lighthouse keeper climbed the spiral staircase at dusk, pausing at "
    "the lamp room to wind the clockwork that turned the great lens. Below, "
    "the sea threw itself against the rocks as it had for a hundred years."
)


def _chat(p: str) -> str:
    return CHAT_TURN.format(body=p.strip())


def _ref():
    """Import the reference package (pip install phi-3-vision-mlx)."""
    try:
        import phi_3_vision_mlx as ref  # noqa

        return ref
    except ImportError as e:
        sys.exit(
            f"Cannot import phi_3_vision_mlx ({e}).\n"
            "Run this on a Mac: pip install phi-3-vision-mlx mlx datasets"
        )


# ---------------------------------------------------------------------------
# Reference-side measurement helpers (mirror _generate's decode loop order)
# ---------------------------------------------------------------------------


def _greedy_tokens(ref, model, processor, prompt, max_tokens: int,
                   images=None):
    """Greedy token ids per row + top-8 fp32 prefill logits.

    Mirrors ``_generate`` (reference :376-399): prefill with
    ``model(**dict_input, max_tokens=N)``, then argmax steps feeding
    ``cache``/``mask``/``pids`` back; rows EOS-trim EXCLUSIVE like
    verify._greedy_tokens.
    """
    import mlx.core as mx

    dict_input = processor(prompt, images)
    mask = dict_input.get("mask", None)
    pids = dict_input.get("pids", None)
    logits, cache = model(**dict_input, max_tokens=max_tokens)
    last = np.array(logits[:, -1, :].astype(mx.float32))
    order = np.argsort(-last[0])[:TOPK]
    top = {"ids": [int(i) for i in order],
           "vals": [float(last[0, i]) for i in order]}
    token = mx.argmax(logits[:, -1, :], axis=-1)[:, None]
    mx.eval(token)
    b = int(dict_input["input_ids"].shape[0])
    rows = [[int(np.array(token)[r, 0])] for r in range(b)]
    alive = [np.array(token)[r, 0] != ID_EOS for r in range(b)]
    for _ in range(max_tokens - 1):
        logits, cache = model(input_ids=token, cache=cache, mask=mask,
                              pids=pids)
        token = mx.argmax(logits[:, -1, :], axis=-1)[:, None]
        mx.eval(token)
        t = np.array(token)
        for r in range(b):
            rows[r].append(int(t[r, 0]))
            alive[r] = alive[r] and t[r, 0] != ID_EOS
        if not any(alive):
            break
    rows = [r[: r.index(ID_EOS)] if ID_EOS in r else r for r in rows]
    return rows, top


def _perplexity(model, processor, text: str) -> float:
    """exp(mean next-token CE), fp32 log-softmax — verify._perplexity's twin
    (a ``max_tokens=0`` scoring call returns logits for every position)."""
    import mlx.core as mx
    import mlx.nn as nn

    dict_input = processor(text)
    ids = np.array(dict_input["input_ids"])
    logits, _ = model(**dict_input, max_tokens=0)
    lp = np.array(nn.log_softmax(logits.astype(mx.float32), axis=-1))
    nll = -lp[0, np.arange(ids.shape[1] - 1), ids[0, 1:]]
    return float(np.exp(nll.mean()))


def _qa_rows(dataset_path: str, take: int):
    import datasets

    rows = list(datasets.load_dataset(dataset_path, split="train"))
    return rows[:take]


def _question_prompts(rows, suffix: str = "") -> List[str]:
    return [_chat(r["input"].rstrip() + suffix) for r in rows]


def _answers_key(rows) -> List[str]:
    return [str(r["output"]).strip()[:1] for r in rows]


def _accuracy(attempts: List[str], key: List[str]) -> float:
    hits = sum(a.strip()[:1] == k for a, k in zip(attempts, key))
    return round(hits / max(len(key), 1), 4)


def _local_test_image():
    """Deterministic VQA image — byte-identical to bench._local_test_image."""
    from PIL import Image

    h, w = 480, 640
    yy, xx = np.mgrid[0:h, 0:w]
    arr = np.stack(
        [(xx * 255 // w), (yy * 255 // h), ((xx + yy) * 255 // (h + w))],
        axis=-1,
    ).astype(np.uint8)
    return Image.fromarray(arr)


# ---------------------------------------------------------------------------
# Config runners — mirror verify.run_cfg1..5 payloads field-for-field
# ---------------------------------------------------------------------------


def run_cfg1(ref, args) -> dict:
    model, processor = ref._load(args.blind_path or ref.PATH_ORIGINAL_PHI3_BLIND)
    try:  # fp32 gate: the TPU side loads dtype="float32"
        import mlx.core as mx

        model.set_dtype(mx.float32)
    except Exception as e:
        print(f"(cfg1) set_dtype(float32) unavailable: {e} — recording in "
              "the checkpoint dtype; compare with rtol")
    prompt = _chat(_PROMPT_CFG1)
    tokens, top = _greedy_tokens(ref, model, processor, prompt, 64)
    return {"cases": [{"prompt": prompt, "max_tokens": 64, "tokens": tokens,
                       "top_logits": top}]}


def run_cfg2(ref, args) -> dict:
    model, processor = ref._load(
        args.blind_path or ref.PATH_ORIGINAL_PHI3_BLIND,
        use_quantized_cache=True,
    )
    prompts = [_chat(p) for p in _PROMPTS_CFG2]
    tokens, _ = _greedy_tokens(ref, model, processor, prompts, 100)
    return {"cases": [{"prompt": prompts, "max_tokens": 100, "tokens": tokens}]}


def run_cfg3(ref, args) -> dict:
    model, processor = ref._load(
        args.quant_path or ref.PATH_QUANTIZED_PHI3_BLIND
    )
    rows = _qa_rows(args.dataset, args.take)
    key = _answers_key(rows)
    chosen = ref._choose_from(
        model, processor, _question_prompts(rows, "\nThe correct answer is"),
        "ABCDE", mute=True,
    )
    chosen = list(chosen) if isinstance(chosen, list) else [chosen]
    constraints = [(0, "\nThe"), (100, " The correct answer is"), "ABCDE"]
    greedy = ref._constrain(model, processor, _question_prompts(rows),
                            constraints, mute=True, verbose=False)
    beamed = ref._constrain(model, processor, _question_prompts(rows),
                            constraints, mute=True, verbose=False,
                            use_beam=True)
    as_list = lambda o: o if isinstance(o, list) else [o]
    pick = lambda outs: [o.rsplit("The correct answer is ", 1)[-1][:1]
                         for o in as_list(outs)]
    ppl = _perplexity(model, processor, _PPL_TEXT)
    return {
        "cases": [{
            "n_rows": len(rows),
            "chosen": chosen,
            "constrained": pick(greedy),
            "beamed": pick(beamed),
        }],
        "scores": {
            "choose_acc": _accuracy(chosen, key),
            "constrain_acc": _accuracy(pick(greedy), key),
            "beam_acc": _accuracy(pick(beamed), key),
            "quantized_ppl": round(ppl, 4),
        },
    }


def run_cfg4(ref, args) -> dict:
    model, processor = ref._load(
        args.vision_path or ref.PATH_ORIGINAL_PHI3_VISION
    )
    img = _local_test_image()
    prompt = _chat("<|image_1|>\nWhat is shown in this image?")
    tokens, top = _greedy_tokens(ref, model, processor, prompt, 32,
                                 images=[img])
    return {"cases": [{"prompt": prompt, "max_tokens": 32, "tokens": tokens,
                       "top_logits": top}]}


def run_cfg5(ref, args) -> dict:
    model_path = args.quant_path or ref.PATH_QUANTIZED_PHI3_BLIND
    adapter_path = os.path.join(args.golden, "cfg5_adapter_mlx")
    ref.train_lora(
        model_path=model_path, adapter_path=adapter_path,
        lora_rank=args.lora_rank, lora_layers=args.lora_layers,
        take=args.take, dataset_path=args.dataset,
    )
    first_loss = last_loss = None  # reference train_lora logs to stdout only
    model, processor = ref._load(model_path, adapter_path=adapter_path)
    rows = _qa_rows(args.dataset, args.take)
    chosen = ref._choose_from(
        model, processor, _question_prompts(rows, "\nThe correct answer is"),
        "ABCDE", mute=True,
    )
    chosen = list(chosen) if isinstance(chosen, list) else [chosen]

    # Long-context: token-measured filler prompt, quantized cache (verify
    # run_cfg5's exact construction — sizes in TOKENS, not characters).
    model_q, _ = ref._load(model_path, use_quantized_cache=True)
    filler = ("The lighthouse keeper wrote: " + "x" * 50)
    target = args.long_window - 192
    long_prompt = filler * (target // 20)
    n_tok = len(processor(long_prompt)["input_ids"][0])
    while n_tok < target:
        long_prompt += filler * max((target - n_tok) // 10, 1)
        n_tok = len(processor(long_prompt)["input_ids"][0])
    while n_tok > target:
        excess = n_tok - target
        long_prompt = long_prompt[: -max(excess, 1)]
        n_tok = len(processor(long_prompt)["input_ids"][0])
    tokens, _ = _greedy_tokens(ref, model_q, processor, long_prompt, 32)
    return {
        "cases": [{
            "chosen": chosen,
            "long_window": args.long_window,
            "long_prompt_tokens": n_tok,
            "long_tokens": tokens,
        }],
        "scores": {
            "choose_acc_after_lora": _accuracy(chosen, _answers_key(rows)),
            "first_loss": first_loss,
            "last_loss": last_loss,
        },
    }


RUNNERS = {1: run_cfg1, 2: run_cfg2, 3: run_cfg3, 4: run_cfg4, 5: run_cfg5}


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="verify_mlx_record")
    ap.add_argument("--golden", default="goldens")
    ap.add_argument("--configs", default="1,2,3,4,5")
    ap.add_argument("--dataset", default="JosefAlbers/akemiH_MedQA_Reason")
    ap.add_argument("--take", type=int, default=10)
    ap.add_argument("--long-window", type=int, default=2048)
    ap.add_argument("--lora-rank", type=int, default=16)
    ap.add_argument("--lora-layers", type=int, default=5)
    ap.add_argument("--blind-path", default=None)
    ap.add_argument("--quant-path", default=None)
    ap.add_argument("--vision-path", default=None)
    args = ap.parse_args(argv)

    ref = _ref()
    os.makedirs(args.golden, exist_ok=True)
    for n in [int(c) for c in args.configs.split(",") if c]:
        name = CFG_NAMES[n]
        payload = RUNNERS[n](ref, args)
        payload.update({"schema": 1, "config": name, "weights": "real",
                        "recorded_by": "mlx-reference"})
        path = os.path.join(args.golden, f"{name}.json")
        with open(path, "w") as f:
            json.dump(payload, f, indent=2)
        print(f"recorded {path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
