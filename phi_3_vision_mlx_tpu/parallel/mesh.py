"""Device mesh construction.

The reference is strictly single-device (SURVEY.md §2.9: no collectives, no
distributed code of any kind).  Parallelism here is a first-class new
component: a ``jax.sharding.Mesh`` over ICI with named axes

* ``data``  — batch (data parallelism; gradients psum automatically via GSPMD)
* ``model`` — tensor parallelism (heads / hidden shards, Megatron-style)

Multi-host deployments add a leading DCN axis by passing the global device
list; XLA routes collectives over ICI within a slice and DCN across slices.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(data: int = 1, model: int = 1, devices=None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    need = data * model
    if len(devices) < need:
        raise ValueError(f"need {need} devices, have {len(devices)}")
    arr = np.array(devices[:need]).reshape(data, model)
    return Mesh(arr, axis_names=("data", "model"))


def single_device_mesh() -> Mesh:
    return make_mesh(1, 1)
