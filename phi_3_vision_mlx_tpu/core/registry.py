"""Explicit architecture registry.

Replaces the reference's ``eval(model_arch)`` dispatch
(/root/reference/phi_3_vision_mlx.py:260-262) with a declarative table:
architecture prefix -> (model kind, processor class).
"""

from __future__ import annotations

from typing import Callable, Dict, NamedTuple


class ArchEntry(NamedTuple):
    name: str
    has_vision: bool
    processor: Callable


def _proc_text():
    from ..models.preprocess import Phi3Processor

    return Phi3Processor


def _proc_vision():
    from ..models.preprocess import Phi3VProcessor

    return Phi3VProcessor


_REGISTRY: Dict[str, dict] = {
    "Phi3ForCausalLM": {"has_vision": False, "processor": _proc_text},
    "Phi3VForCausalLM": {"has_vision": True, "processor": _proc_vision},
}


def register(architecture: str, *, has_vision: bool, processor_factory):
    """Register a new architecture (extension point for new model families)."""
    _REGISTRY[architecture] = {
        "has_vision": has_vision,
        "processor": processor_factory,
    }


def lookup(architecture: str) -> dict:
    if architecture in _REGISTRY:
        return _REGISTRY[architecture]
    # prefix match mirrors the reference's arch[:5] dispatch
    for name, entry in _REGISTRY.items():
        if architecture.startswith(name[:5]):
            return entry
    raise KeyError(f"unknown architecture: {architecture}")


def processor_for(architecture: str):
    return lookup(architecture)["processor"]()
