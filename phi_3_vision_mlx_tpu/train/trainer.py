"""LoRA training + evaluation harness.

Semantics parity with the reference ``train_lora`` / ``test_lora`` /
``TrainingCallback`` (/root/reference/phi_3_vision_mlx.py:898-1176,
/root/reference/phi.py:26-82):

* same data pipeline: MedQA-style rows -> ``<|user|>Q<|end|><|assistant|>S<|end|>``
  prompts, left-padded batches, per-epoch shuffled index chunks;
* same optional attention-mask-dropout augmentation (``mask_ratios``): each
  sample replicated per ratio with random maskable positions zeroed and loss
  scaled ``10**(-10*ratio)``;
* same loss: causal CE restricted to tokens after ``<|assistant|>`` (32001),
  logits in fp32, per-row mean, scaled sum;
* same LR schedule (linear warmup -> linear decay), AdamW, best-avg-loss
  adapter checkpointing in the reference's exact artifact format.

TPU-first differences: one jitted train step (value_and_grad over the LoRA
leaves only, base weights frozen structurally), batches padded to fixed
buckets so a single compilation serves the run, gradients of inactive layers
zeroed by mask (the layer subtree is stacked for ``lax.scan``).
"""

from __future__ import annotations

import json
import math
import os
import random
import time
from functools import partial
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..core.config import ID_ASS, ID_EOS
from ..core import weights as W
from ..engine.engine import round_up
from ..models import phi3
from .data import load_qa_dataset
from .lora import (
    adapter_flat_dict,
    inject_lora,
    mask_lora_grads,
    merge_lora,
    partition_lora,
)


class TrainingCallback:
    """Loss logging + best-checkpoint saving (reference phi.py:26-82)."""

    def __init__(self, lora_cfg, lr_schedule, batch_indices, sum_every=3):
        self.batch_indices = batch_indices
        self.lora_cfg = lora_cfg
        self.adapter_path = lora_cfg["adapter_path"]
        self.lr_schedule = lr_schedule
        self.sum_every = min(sum_every, len(batch_indices))
        self.current_step = 0
        self.sum_loss = 0.0
        self.best_loss = math.inf
        self.train_log = {"step_i": [], "step_loss": [], "avg_i": [], "avg_loss": []}
        self.start_time = time.perf_counter()
        os.makedirs(self.adapter_path, exist_ok=True)
        self._save_adapter = None  # bound by train_lora

    def __call__(self, step_loss: float):
        self.current_step += 1
        print(f"- Step loss at step {self.current_step}: {step_loss:.2f}")
        self.train_log["step_i"].append(self.current_step)
        self.train_log["step_loss"].append(step_loss)
        self.sum_loss += step_loss
        if self.current_step % self.sum_every == 0:
            avg_loss = self.sum_loss / self.sum_every
            self.sum_loss = 0.0
            self.train_log["avg_i"].append(self.current_step)
            self.train_log["avg_loss"].append(avg_loss)
            print(f"Avg loss at step {self.current_step}: {avg_loss:.2f}")
            if avg_loss < self.best_loss and self._save_adapter is not None:
                self.best_loss = avg_loss
                self._save_adapter()

    def end_log(self):
        train_log = self.train_log
        train_log["train_time"] = time.perf_counter() - self.start_time
        with open(f"{self.adapter_path}/adapter_config.json", "w") as f:
            json.dump(self.lora_cfg, f, indent=4)
        with open(f"{self.adapter_path}/adapter_train_log.json", "w") as f:
            json.dump(train_log, f, indent=4)
        try:
            import matplotlib

            matplotlib.use("Agg")
            import matplotlib.pyplot as plt

            fig, (ax1, ax2, ax3) = plt.subplots(3, 1)
            ax1.plot(
                train_log["step_i"], train_log["step_loss"],
                color="b", alpha=0.5, label="Step Loss",
            )
            ax1.plot(train_log["avg_i"], train_log["avg_loss"], color="r", label="Avg Loss")
            ax1.set_title("Training Loss Curves")
            ax1.legend()
            ax2.plot(np.asarray(self.lr_schedule))
            ax2.ticklabel_format(axis="y", style="sci")
            ax2.set_title("Learning Rate Schedule")
            batch_numbers = np.arange(len(self.batch_indices))
            x = np.repeat(batch_numbers, [len(s) for s in self.batch_indices])
            y = np.concatenate([np.asarray(s) for s in self.batch_indices])
            ax3.scatter(x, y, color="b", marker=".", alpha=0.5)
            ax3.set_title("Batch Indices")
            plt.tight_layout()
            fig.savefig(
                f"train_log_{self.current_step}_steps_in_"
                f"{train_log['train_time']:.0f}_sec.png"
            )
            plt.close(fig)
        except Exception as e:  # plotting must never kill a training run
            print(f"(training plot skipped: {e})")
        print(f"Training log saved to {self.adapter_path}")
        print(f"Total training time: {train_log['train_time']:.2f} seconds")


def _get_lr_schedule(lr: float, steps: int, warmup: float) -> np.ndarray:
    """Linear warmup -> linear decay (reference :1014-1016)."""
    n_warmup = int(steps * warmup)
    return np.concatenate(
        [np.linspace(1e-6, lr, n_warmup), np.linspace(lr, 1e-6, steps - n_warmup + 1)[1:]]
    ).astype(np.float32)


def _prompt_rows(rows) -> List[str]:
    """Dataset rows -> training prompts (reference ``_prompt``, :950-955)."""
    prompts = []
    for r in rows:
        q = r["input"].rsplit(" A: ", 1)[0].strip()
        s = r["summary"].strip().split("\n", 1)[0].strip()
        prompts.append(f"<|user|>\n{q}<|end|>\n<|assistant|>\n{s}<|end|>")
    return prompts


def _mask_augment(batch: dict, mask_ratios, rng: random.Random):
    """Attention-mask-dropout augmentation (reference ``_mask``, :956-983)."""
    if mask_ratios is None:
        return batch, np.ones(len(batch["input_ids"]), np.float32)
    new_batch = {k: [] for k in batch}
    num_versions = len(mask_ratios) + 1
    loss_scales = []
    for key in batch:
        if key != "mask":
            new_batch[key] = [seq for seq in batch[key] for _ in range(num_versions)]
    for i in range(len(batch["input_ids"])):
        input_tokens = list(batch["input_ids"][i])
        original_mask = list(batch["mask"][i])
        new_batch["mask"].append(original_mask)
        loss_scales.append(1.0)
        start = max((j for j, t in enumerate(input_tokens) if t < 0), default=0) + 3
        end = (
            input_tokens.index(ID_ASS) - 3
            if ID_ASS in input_tokens
            else len(input_tokens)
        )
        maskable = [j for j in range(start, end) if original_mask[j] == 1]
        for ratio in mask_ratios:
            masked = original_mask.copy()
            for idx in rng.sample(maskable, int(len(maskable) * ratio)):
                masked[idx] = 0
            new_batch["mask"].append(masked)
            loss_scales.append(10.0 ** (-10.0 * ratio))
    return new_batch, np.asarray(loss_scales, np.float32)


def _prepare_batch(processor, prompts: List[str], mask_ratios, rng, bucket: int = 64):
    """Tokenize + augment + left-pad to a fixed bucket (one jit shape)."""
    batch = processor(prompts)
    batch = {k: np.asarray(v).tolist() for k, v in batch.items()}
    if "pids" not in batch:
        l = len(batch["input_ids"][0])
        batch["pids"] = [list(range(l)) for _ in batch["input_ids"]]
        batch["mask"] = [[1] * l for _ in batch["input_ids"]]
    batch, loss_scales = _mask_augment(batch, mask_ratios, rng)
    ids = np.asarray(batch["input_ids"], np.int32)
    pids = np.asarray(batch["pids"], np.int32)
    mask = np.asarray(batch["mask"], np.int32)
    b, l = ids.shape
    l_pad = max(round_up(l, bucket), bucket)
    pad = l_pad - l
    if pad:
        ids = np.concatenate([np.zeros((b, pad), np.int32), ids], axis=1)
        pids = np.concatenate([np.ones((b, pad), np.int32), pids], axis=1)
        mask = np.concatenate([np.zeros((b, pad), np.int32), mask], axis=1)
    splits = np.asarray(
        [row.tolist().index(ID_ASS) if ID_ASS in row else l_pad - 1 for row in ids],
        np.int32,
    )
    targets = ids[:, 1:]
    loss_masks = (np.arange(targets.shape[1])[None, :] >= splits[:, None]).astype(
        np.float32
    ) * mask[:, 1:].astype(np.float32)
    return {
        "ids": ids,
        "pids": pids,
        "valid": mask.astype(bool),
        "targets": targets,
        "loss_masks": loss_masks,
        "loss_scales": loss_scales,
    }


def make_loss_fn(cfg, lora_dropout: float = 0.0):
    def loss_fn(trainable, frozen, batch):
        params = merge_lora(frozen, trainable)
        logits = phi3.forward_nocache(
            params,
            cfg,
            jnp.asarray(batch["ids"]),
            pids=jnp.asarray(batch["pids"]),
            prompt_valid=jnp.asarray(batch["valid"]),
            dropout_rng=batch.get("dropout_rng"),
            lora_dropout=lora_dropout,
            allow_flash=False,  # flash kernel is forward-only (no vjp)
        )
        logits = logits[:, :-1].astype(jnp.float32)
        ce = optax.softmax_cross_entropy_with_integer_labels(
            logits, jnp.asarray(batch["targets"])
        )
        masks = jnp.asarray(batch["loss_masks"])
        ce = (ce * masks).sum(axis=1) / jnp.maximum(masks.sum(axis=1), 1.0)
        return (ce * jnp.asarray(batch["loss_scales"])).sum()

    return loss_fn


def train_lora(
    model_path: str = None,
    adapter_path: Optional[str] = None,
    lora_targets: List[str] = ["self_attn.qkv_proj"],
    lora_layers=1,
    lora_rank: int = 1,
    epochs: int = 1,
    batch_size: int = 1,
    take: int = 10,
    lr: float = 1e-4,
    warmup: float = 0.5,
    mask_ratios=None,
    dataset_path: str = "JosefAlbers/akemiH_MedQA_Reason",
    seed: int = 0,
    lora_dropout: float = 0.0,
    resume: bool = False,
    checkpoint_every: int = 0,
):
    """Fine-tune a LoRA adapter (reference ``train_lora``, :898-1046).

    Beyond the reference: ``lora_dropout`` (the reference LoRALinear knob,
    phi.py:87), and exact mid-run resume via orbax —
    ``checkpoint_every=N`` saves (trainable, opt_state, step) under
    ``<adapter_path>/train_state`` every N steps, ``resume=True`` restores
    the latest and continues from the next batch.
    """
    from ..api import PATH_QUANTIZED_PHI3_BLIND, _get_adapter_path, _load

    model_path = model_path or PATH_QUANTIZED_PHI3_BLIND
    if adapter_path is None:
        adapter_path = _get_adapter_path(model_path)
    lm, processor = _load(model_path)
    cfg = lm.cfg
    rows = load_qa_dataset(dataset_path, take)
    list_prompts = _prompt_rows(rows)

    rng = random.Random(seed)
    batch_idx = []
    for _ in range(epochs):
        order = rng.sample(range(len(rows)), len(rows))
        batch_idx += [
            order[i : i + batch_size]
            for i in range(0, len(order) - batch_size + 1, batch_size)
        ]

    lora_cfg = {
        "model_path": str(model_path),
        "adapter_path": str(adapter_path),
        "lora_layers": lora_layers,
        "lora_targets": lora_targets,
        "lora_parameters": {
            "rank": lora_rank, "alpha": lora_rank, "dropout": lora_dropout,
            "scale": 1.0,
        },
    }
    params, layer_mask = inject_lora(
        lm.params, cfg, lora_targets, lora_layers, lora_rank,
        jax.random.PRNGKey(seed), alpha=lora_rank, scale=1.0,
    )
    trainable, frozen = partition_lora(params)

    lr_schedule = _get_lr_schedule(lr, len(batch_idx), warmup)
    tx = optax.inject_hyperparams(optax.adamw)(
        learning_rate=float(lr_schedule[0]), weight_decay=0.01
    )
    opt_state = tx.init(trainable)
    loss_fn = make_loss_fn(cfg, lora_dropout)

    @jax.jit
    def train_step(trainable, opt_state, frozen, batch, lr_value):
        lvalue, grads = jax.value_and_grad(loss_fn)(trainable, frozen, batch)
        grads = mask_lora_grads(grads, layer_mask)
        opt_state.hyperparams["learning_rate"] = lr_value
        updates, opt_state = tx.update(grads, opt_state, trainable)
        trainable = optax.apply_updates(trainable, updates)
        return trainable, opt_state, lvalue

    callback = TrainingCallback(lora_cfg, lr_schedule, batch_idx)

    def save_adapter():
        merged = merge_lora(frozen, trainable)
        flat = adapter_flat_dict(merged, layer_mask, lora_targets)
        W.save_safetensors(f"{adapter_path}/adapters.safetensors", flat)

    callback._save_adapter = save_adapter

    manager = None
    start_step = 0
    if resume or checkpoint_every:
        from .checkpoint import make_manager, restore_train_state, save_train_state

        manager = make_manager(f"{adapter_path}/train_state")
    if resume and manager is not None:
        restored = restore_train_state(
            manager,
            template={"trainable": trainable, "opt_state": opt_state, "extra": {"next_step": 0}},
        )
        if restored is not None:
            state, _ = restored
            trainable, opt_state = state["trainable"], state["opt_state"]
            start_step = int(state["extra"]["next_step"])
            callback.current_step = start_step
            print(f"Resumed training from step {start_step}")

    # Per-batch RNGs drawn up front so a resumed run augments identically to
    # an uninterrupted one (skipped batches must not shift the stream).
    batch_rngs = [random.Random(rng.random()) for _ in batch_idx]
    for i, idx in enumerate(batch_idx):
        if i < start_step:
            continue
        batch = _prepare_batch(
            processor, [list_prompts[j] for j in idx], mask_ratios, batch_rngs[i]
        )
        batch = {k: jnp.asarray(v) for k, v in batch.items()}
        if lora_dropout > 0.0:
            batch["dropout_rng"] = jax.random.fold_in(jax.random.PRNGKey(seed + 1), i)
        trainable, opt_state, lvalue = train_step(
            trainable, opt_state, frozen, batch, jnp.float32(lr_schedule[i])
        )
        callback(float(jax.device_get(lvalue)))
        if checkpoint_every and (i + 1) % checkpoint_every == 0:
            save_train_state(
                manager, i + 1, trainable, opt_state, extra={"next_step": i + 1}
            )
    callback.end_log()
    del lm


def test_lora(
    model_path: str = None,
    adapter_path=True,
    dataset_path: str = "JosefAlbers/akemiH_MedQA_Reason",
    take=(0, 10),
    batch_size: int = 1,
    test_result_path: str = "test_result.csv",
):
    """Evaluate recall + 3 answering methods (reference ``test_lora``,
    :1048-1176): 30-token recall generation, ``choose`` over A-E, greedy
    ``constrain``, and beam ``constrain``; prints scores, writes a CSV."""
    from ..api import PATH_QUANTIZED_PHI3_BLIND, _get_adapter_path, _load
    from ..engine.constrain import choose_from, constrain_decode
    from ..engine.engine import generate_text

    model_path = model_path or PATH_QUANTIZED_PHI3_BLIND
    if adapter_path is True:
        adapter_path = _get_adapter_path(model_path)
    lm, processor = _load(model_path=model_path, adapter_path=adapter_path)
    take = (0, take) if isinstance(take, int) else take
    rows = load_qa_dataset(dataset_path, take)

    def batched(items):
        for i in range(0, len(items), batch_size):
            yield i, items[i : i + batch_size]

    results = {r_i: dict(row) for r_i, row in enumerate(rows)}
    specs = [
        dict(
            a_col="summary_attempt", c_col="summary", q_until=" A: ", q_format="",
            fxn=lambda prompts: generate_text(
                lm, processor, prompts if len(prompts) > 1 else prompts[0],
                max_tokens=30, verbose=False, stream=False, mute=True,
            ),
            a_format=None,
        ),
        dict(
            a_col="choice_attempt", c_col="output", q_until=None,
            q_format="\nThe correct answer is",
            fxn=lambda prompts: choose_from(lm, processor, prompts, "ABCDE", mute=True),
            a_format=None,
        ),
        dict(
            a_col="constrained_attempt", c_col="output", q_until=None, q_format="",
            fxn=lambda prompts: constrain_decode(
                lm, processor, prompts,
                constraints=[(0, "\nThe"), (100, " The correct answer is"), "ABCDE"],
                verbose=False, mute=True, use_beam=False,
            ),
            a_format="The correct answer is ",
        ),
        dict(
            a_col="beamed_attempt", c_col="output", q_until=None, q_format="",
            fxn=lambda prompts: constrain_decode(
                lm, processor, prompts,
                constraints=[(0, "\nThe"), (100, " The correct answer is"), "ABCDE"],
                verbose=False, mute=True, use_beam=True,
            ),
            a_format="The correct answer is ",
        ),
    ]
    for spec in specs:
        for start, chunk in batched(rows):
            questions = [r["input"] for r in chunk]
            if spec["q_until"]:
                questions = [q.rsplit(spec["q_until"], 1)[0].strip() for q in questions]
            prompts = [
                f"<|user|>\n{q}<|end|>\n<|assistant|>{spec['q_format']}"
                for q in questions
            ]
            attempts = spec["fxn"](prompts)
            if isinstance(attempts, str):
                attempts = [attempts]
            for j, att in enumerate(attempts):
                ans = att
                if spec["a_format"]:
                    pos = att.find(spec["a_format"])
                    ans = (
                        att[pos + len(spec["a_format"])].strip()
                        if pos >= 0 and pos + len(spec["a_format"]) < len(att)
                        else ""
                    )
                results[start + j][spec["a_col"]] = ans

    n = len(rows)
    num_chosen = sum(
        1 for r in results.values() if r.get("output") == r.get("choice_attempt")
    )
    print(f"Score w/ _choose_from(): {num_chosen/n}({num_chosen}/{n})")
    num_constr = sum(
        1 for r in results.values() if r.get("output") == r.get("constrained_attempt")
    )
    print(f"Score w/ _constrain():   {num_constr/n}({num_constr}/{n})")
    num_beamed = sum(
        1 for r in results.values() if r.get("output") == r.get("beamed_attempt")
    )
    print(f"Score w/ _beam():        {num_beamed/n}({num_beamed}/{n})")
    import csv

    cols = sorted({k for r in results.values() for k in r})
    with open(test_result_path, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=cols)
        w.writeheader()
        for i in range(n):
            w.writerow({k: results[i].get(k, "") for k in cols})
    del lm
    return {
        "choose": num_chosen / n,
        "constrain": num_constr / n,
        "beam": num_beamed / n,
    }
