"""Device mesh construction (single-host ICI and multi-host DCN).

The reference is strictly single-device (SURVEY.md §2.9: no collectives, no
distributed code of any kind).  Parallelism here is a first-class new
component: a ``jax.sharding.Mesh`` with named axes

* ``dcn``   — optional leading cross-slice/cross-host axis (data parallelism
  over the data-center network; only present when ``dcn > 1``)
* ``data``  — batch (data parallelism; gradients psum automatically via GSPMD)
* ``model`` — tensor parallelism (heads / hidden shards, Megatron-style)

XLA routes collectives over ICI within a slice and DCN across slices; keep
``model`` (the chatty axis) within a slice and put only data parallelism on
``dcn``.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(data: int = 1, model: int = 1, dcn: int = 1, devices=None) -> Mesh:
    """Build a (``dcn`` x) ``data`` x ``model`` mesh.

    With ``dcn > 1`` the leading axis groups devices host-by-host — the
    device list from ``jax.devices()`` orders all of process 0's devices
    first, so ``reshape(dcn, data, model)`` keeps each host's devices in one
    DCN slice (tensor-parallel collectives stay on ICI).
    """
    devices = list(devices if devices is not None else jax.devices())
    need = dcn * data * model
    if len(devices) < need:
        raise ValueError(f"need {need} devices, have {len(devices)}")
    if dcn > 1:
        arr = np.array(devices[:need]).reshape(dcn, data, model)
        return Mesh(arr, axis_names=("dcn", "data", "model"))
    arr = np.array(devices[:need]).reshape(data, model)
    return Mesh(arr, axis_names=("data", "model"))


def batch_axes(mesh: Mesh):
    """The mesh axes a batch dimension shards over (dcn+data when present)."""
    return ("dcn", "data") if "dcn" in mesh.axis_names else ("data",)


def single_device_mesh() -> Mesh:
    return make_mesh(1, 1)


def distributed_init(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Multi-host bring-up: ``jax.distributed.initialize`` plumbing.

    On real TPU pods the three arguments come from the environment and may
    all be None (libtpu auto-discovers); for CPU/GPU multi-process runs pass
    them explicitly (see tests/test_multihost.py for the two-process CPU
    smoke test).
    """
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
