"""LoRA parameter surgery on the stacked-layer pytree.

Reference behavior (/root/reference/phi.py:84-133 ``LoRALinear`` and
/root/reference/phi_3_vision_mlx.py:234-245 ``_linear_to_lora_layers``):
wrap named submodules (default ``self_attn.qkv_proj``) of the last-N (or
listed) decoder layers with ``y + scale*(x @ A) @ B``; A ~ U(-1/sqrt(K),
1/sqrt(K)), B = 0.

Because our per-layer params are stacked along a leading layer axis (for the
``lax.scan`` decoder), LoRA weights are stacked too — *all* layers carry
(A, B) but inactive layers keep A=B=0, which is an exact no-op, and their
gradients are zeroed by ``layer_mask`` in the train step.  On save, only
active layers are written, in the reference's per-layer key format
(``model.layers.N.<target>.lora_a``), so adapters are artifact-compatible.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import ModelConfig


def _resolve_layers(lora_layers, num_layers: int) -> List[int]:
    if isinstance(lora_layers, int):
        return list(range(num_layers - lora_layers, num_layers))
    if isinstance(lora_layers, (list, tuple)):
        return list(lora_layers)
    raise ValueError(
        "Invalid type for lora_layers. Expected int (number of layers) or "
        "list (layer indices)."
    )


def inject_lora(
    params: dict,
    cfg: ModelConfig,
    lora_targets: List[str],
    lora_layers,
    rank: int,
    key,
    alpha: float = None,
    scale: float = 1.0,
    dropout: float = 0.0,
) -> Tuple[dict, jnp.ndarray]:
    """Add stacked LoRA leaves to the targeted linears.

    Returns (params, layer_mask) — layer_mask is (num_layers,) float, 1.0 at
    trainable layers.
    """
    del dropout  # dropout=0.0 is the reference's training default (:1011)
    alpha = rank if alpha is None else alpha
    eff_scale = scale * (alpha / rank)
    active = _resolve_layers(lora_layers, cfg.num_hidden_layers)
    mask = np.zeros((cfg.num_hidden_layers,), np.float32)
    mask[active] = 1.0

    layers = params["model"]["layers"]
    for t_i, target in enumerate(lora_targets):
        node = layers
        for part in target.split("."):
            node = node[part]
        w = node["weight"]
        nl = w.shape[0]
        if "scales" in node:
            s = node["scales"]
            if w.ndim == 5:
                # Tiled-contiguous Pallas layout (kernelize_params):
                # payload (nl, K/bk, N/bn, bk, bn/2), scales (nl, K/bk,
                # N/bn, bk/g, bn) — recover the logical (K, N).
                kdim = w.shape[1] * w.shape[3]
                ndim = s.shape[2] * s.shape[4]
            else:
                # Flat payloads: (nl, K, N) uint8/int8 or nibble-packed
                # (nl, K, N/2); scales (nl, K/g, N) carry the true N.
                kdim = w.shape[1]
                ndim = s.shape[-1]
        else:
            kdim, ndim = w.shape[1], w.shape[2]
        key, sub = jax.random.split(key)
        bound = 1.0 / np.sqrt(kdim)
        a = jax.random.uniform(
            sub, (nl, kdim, rank), jnp.float32, minval=-bound, maxval=bound
        )
        a = a * jnp.asarray(mask)[:, None, None]  # inactive layers: exact no-op
        node["lora_a"] = a
        node["lora_b"] = jnp.zeros((nl, rank, ndim), jnp.float32)
        node["lora_scale"] = jnp.full((nl,), eff_scale, jnp.float32)
    return params, jnp.asarray(mask)


def partition_lora(params: dict) -> Tuple[dict, dict]:
    """Split the pytree into (trainable lora leaves, frozen rest) — same
    nested structure, disjoint leaves."""
    def walk(node):
        if not isinstance(node, dict):
            return None, node
        train: dict = {}
        frozen: dict = {}
        for k, v in node.items():
            if k in ("lora_a", "lora_b"):
                train[k] = v
            elif isinstance(v, dict):
                t, f = walk(v)
                if t:
                    train[k] = t
                frozen[k] = f
            else:
                frozen[k] = v
        return train, frozen

    t, f = walk(params)
    return t or {}, f


def merge_lora(frozen: dict, trainable: dict) -> dict:
    """Inverse of :func:`partition_lora` (pure; no aliasing of inputs)."""
    if not trainable:
        return frozen
    out = dict(frozen)
    for k, v in trainable.items():
        if isinstance(v, dict):
            out[k] = merge_lora(frozen.get(k, {}), v)
        else:
            out[k] = v
    return out


def mask_lora_grads(grads: dict, layer_mask) -> dict:
    """Zero gradients of inactive layers (leading axis = layer)."""
    return jax.tree_util.tree_map(
        lambda g: g * layer_mask.reshape((-1,) + (1,) * (g.ndim - 1)), grads
    )


def adapter_flat_dict(
    params: dict, layer_mask, lora_targets: List[str]
) -> Dict[str, np.ndarray]:
    """Trainable weights -> reference adapter key format (active layers only),
    matching ``tree_flatten(model.trainable_parameters())`` of the reference
    save (phi.py:56)."""
    flat: Dict[str, np.ndarray] = {}
    layers = params["model"]["layers"]
    active = [i for i, m in enumerate(np.asarray(layer_mask)) if m > 0]
    for target in lora_targets:
        node = layers
        for part in target.split("."):
            node = node[part]
        for i in active:
            flat[f"model.layers.{i}.{target}.lora_a"] = np.asarray(node["lora_a"][i])
            flat[f"model.layers.{i}.{target}.lora_b"] = np.asarray(node["lora_b"][i])
    return flat
