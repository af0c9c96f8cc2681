"""Full training-state checkpointing (orbax) — mid-run resume.

The reference saves only best-loss adapter weights; optimizer state is lost
and there is no mid-training resume (SURVEY.md §5 "Checkpoint / resume").
This module adds the TPU-idiomatic improvement: an orbax CheckpointManager
holding (trainable params, optimizer state, step, rng seed), enabling exact
resume.  Adapter artifacts remain in the reference's format (train/lora.py).
"""

from __future__ import annotations

import os
from typing import Any, Optional


def make_manager(directory: str, max_to_keep: int = 3):
    import orbax.checkpoint as ocp

    os.makedirs(directory, exist_ok=True)
    options = ocp.CheckpointManagerOptions(max_to_keep=max_to_keep)
    return ocp.CheckpointManager(os.path.abspath(directory), options=options)


def save_train_state(manager, step: int, trainable: Any, opt_state: Any, extra: Optional[dict] = None):
    import orbax.checkpoint as ocp

    state = {"trainable": trainable, "opt_state": opt_state, "extra": extra or {}}
    manager.save(step, args=ocp.args.StandardSave(state))
    manager.wait_until_finished()


def restore_train_state(manager, step: Optional[int] = None, template: Any = None):
    import orbax.checkpoint as ocp

    step = step if step is not None else manager.latest_step()
    if step is None:
        return None
    if template is not None:
        return manager.restore(step, args=ocp.args.StandardRestore(template)), step
    return manager.restore(step), step
