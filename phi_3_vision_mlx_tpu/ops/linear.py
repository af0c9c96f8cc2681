"""Linear-layer application with quantization and LoRA dispatch.

A "linear" parameter leaf is a dict:

* full precision: ``{'weight': (K, N)}`` (optionally ``'bias': (N,)``)
* quantized (affine group, see ops/quant.py): ``{'weight': uint8 (K, N),
  'scales': (K//g, N), 'biases': (K//g, N)}``
* LoRA-wrapped (either base): adds ``'lora_a': (K, r)``, ``'lora_b': (r, N)``
  — applied as ``y + scale * (x @ A) @ B`` exactly like the reference
  ``LoRALinear`` (/root/reference/phi.py:84-133).

Weights are stored transposed relative to HF (``(in, out)``) so the hot path
is a plain ``x @ w`` on the MXU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .quant import QTensor, quantized_matmul


def matmul_precision(dtype):
    """fp32 runs at HIGHEST precision (token-exact parity gate, BASELINE.md);
    bf16 uses the default MXU path."""
    return jax.lax.Precision.HIGHEST if dtype == jnp.float32 else None


def is_quantized(p: dict) -> bool:
    return "scales" in p


def embedding(p: dict, ids, dtype=None):
    """Token-embedding lookup; supports quantized tables.

    Quantized embeddings store ``{'weight': (V, E) uint8, 'scales': (V, E//g),
    'biases': (V, E//g)}`` with groups along the embedding dim (mirroring MLX
    ``QuantizedEmbedding``, applied by ``nn.quantize`` at reference
    phi_3_vision_mlx.py:264).  Only the looked-up rows are dequantized.
    """
    w = p["weight"]
    rows = jnp.take(w, ids, axis=0)
    if is_quantized(p):
        s = jnp.take(p["scales"], ids, axis=0)
        *lead, e = rows.shape
        groups = s.shape[-1]
        g = e // groups
        rf = rows.astype(jnp.float32).reshape(*lead, groups, g)
        if "biases" in p:
            b = jnp.take(p["biases"], ids, axis=0)
            rows = (rf * s[..., None] + b[..., None]).reshape(*lead, e)
        else:
            from .quant import SYMMETRIC_MID

            rows = ((rf - SYMMETRIC_MID) * s[..., None]).reshape(*lead, e)
        return rows.astype(dtype or s.dtype)
    return rows if dtype is None else rows.astype(dtype)


def dense(p: dict, x, *, lora_scale: float = 1.0, dropout_mask=None):
    """Apply a linear layer parameter dict to ``x`` (..., K) -> (..., N).

    Quantized leaves dispatch on payload dtype: ``int8`` payloads are in the
    Pallas kernel's interleaved layout (ops/kernels/quant_matmul.py, applied
    by ``weights.kernelize_params`` on TPU); ``uint8`` payloads use the XLA
    fallback everywhere else.
    """
    if is_quantized(p):
        lead = x.shape[:-1]
        rows = 1
        for d in lead:
            rows *= d
        q = p["weight"]
        biases = p.get("biases")
        if q.ndim == 4:
            # Tiled kernel layout (ops/kernels/quant_matmul.py v2).
            from .kernels.quant_matmul import (
                from_tiled_layout,
                permute_activation,
                quant_matmul_tiled,
            )

            kdim = x.shape[-1]
            group = q.shape[2] // p["scales"].shape[2]  # bk // gk
            if rows <= 256:
                xp = permute_activation(
                    x.reshape(-1, kdim), group, block_k=q.shape[2]
                )
                y = quant_matmul_tiled(
                    xp, q, p["scales"], biases, out_dtype=x.dtype
                ).reshape(*lead, -1)
            else:
                qq, ss, bb = from_tiled_layout(q, p["scales"], biases)
                y = quantized_matmul(x, QTensor(qq, ss, bb))
            if "bias" in p:
                y = y + p["bias"].astype(y.dtype)
            if "lora_a" in p:
                y = _apply_lora(p, x, y, lora_scale, dropout_mask)
            return y
        n_scales = p["scales"].shape[-1]
        packed = q.dtype == jnp.uint8 and q.shape[-1] * 2 == n_scales
        interleaved = packed or q.dtype == jnp.int8
        if interleaved and rows <= 256:
            # Decode regime: memory-bound -> Pallas dequant-in-VMEM kernel.
            from .kernels.quant_matmul import quant_matmul, quant_matmul_packed
            from .kernels.quant_matmul import permute_activation

            kdim = x.shape[-1]
            group = kdim // p["scales"].shape[-2]
            xp = permute_activation(x.reshape(-1, kdim), group)
            if packed:
                y = quant_matmul_packed(
                    xp, q, p["scales"], p["biases"], out_dtype=x.dtype
                )
            else:
                from .kernels.quant_matmul import quant_matmul_interleaved

                y = quant_matmul_interleaved(
                    xp, q, p["scales"], p["biases"], out_dtype=x.dtype
                )
            y = y.reshape(*lead, y.shape[-1])
        else:
            # Prefill/training regime (large M, compute-bound) or fallback layout.
            if interleaved:
                from .kernels.quant_matmul import unpack_nibbles, unpermute_payload

                if packed:
                    q = unpack_nibbles(q).astype(jnp.uint8)
                q = unpermute_payload(q, group=q.shape[-2] // p["scales"].shape[-2])
            y = quantized_matmul(x, QTensor(q, p["scales"], p.get("biases")))
    else:
        y = jnp.matmul(x, p["weight"].astype(x.dtype), precision=matmul_precision(x.dtype))
    if "bias" in p:
        y = y + p["bias"].astype(y.dtype)
    if "lora_a" in p:
        y = _apply_lora(p, x, y, lora_scale, dropout_mask)
    return y


def _apply_lora(p: dict, x, y, lora_scale: float = 1.0, dropout_mask=None):
    """y + scale * (x @ A) @ B (reference LoRALinear, phi.py:129-133)."""
    xa = x if dropout_mask is None else x * dropout_mask
    z = jnp.matmul(
        jnp.matmul(
            xa.astype(jnp.float32),
            p["lora_a"].astype(jnp.float32),
            precision=jax.lax.Precision.HIGHEST,
        ),
        p["lora_b"].astype(jnp.float32),
        precision=jax.lax.Precision.HIGHEST,
    )
    scale = p.get("lora_scale", lora_scale)
    if hasattr(scale, "dtype"):
        scale = jax.lax.stop_gradient(scale).astype(jnp.float32)
    return (y.astype(jnp.float32) + scale * z).astype(x.dtype)


def dense_stacked(heavy: dict, light: dict, x, layer_idx, dropout_mask=None):
    """Linear over layer ``layer_idx`` of *stacked* quantized weights.

    ``heavy``: {'weight': (nl, K, N//2) packed uint8 | (nl, K, N) int8,
    'scales'/'biases': (nl, K//g, N)} — kept out of the layer scan so no
    per-layer weight copies are ever materialized (the Pallas kernel's
    BlockSpec index map selects the layer in HBM).  ``light`` holds the
    per-layer LoRA leaves (already sliced by the scan), applied on top.
    """
    q = heavy["weight"]
    lead = x.shape[:-1]
    rows = 1
    for d in lead:
        rows *= d
    kdim = x.shape[-1]
    if q.ndim == 5 and rows <= 256:
        # Tiled stacked kernel layout (nl, nk, nn, bk, bn//2).
        from .kernels.quant_matmul import permute_activation, quant_matmul_tiled_stacked

        group = q.shape[3] // heavy["scales"].shape[3]  # bk // gk
        xp = permute_activation(x.reshape(-1, kdim), group, block_k=q.shape[3])
        y = quant_matmul_tiled_stacked(
            xp, q, heavy["scales"], heavy.get("biases"), layer_idx, out_dtype=x.dtype
        ).reshape(*lead, -1)
        if light and "lora_a" in light:
            y = _apply_lora(light, x, y, dropout_mask=dropout_mask)
        return y
    if q.ndim == 5:
        # Large-M fallback: slice the layer, un-tile, use the XLA path.
        from .kernels.quant_matmul import from_tiled_layout

        node_q = jax.lax.dynamic_index_in_dim(q, layer_idx, 0, keepdims=False)
        node_s = jax.lax.dynamic_index_in_dim(
            heavy["scales"], layer_idx, 0, keepdims=False
        )
        node_b = (
            None
            if "biases" not in heavy
            else jax.lax.dynamic_index_in_dim(heavy["biases"], layer_idx, 0, keepdims=False)
        )
        qq, ss, bb = from_tiled_layout(node_q, node_s, node_b)
        y = quantized_matmul(x, QTensor(qq, ss, bb))
        if light and "lora_a" in light:
            y = _apply_lora(light, x, y, dropout_mask=dropout_mask)
        return y
    n_scales = heavy["scales"].shape[-1]
    packed = q.dtype == jnp.uint8 and q.shape[-1] * 2 == n_scales
    group = kdim // heavy["scales"].shape[-2]
    if packed and rows <= 256:
        from .kernels.quant_matmul import (
            permute_activation,
            quant_matmul_packed_stacked,
        )

        xp = permute_activation(x.reshape(-1, kdim), group)
        y = quant_matmul_packed_stacked(
            xp, q, heavy["scales"], heavy["biases"], layer_idx, out_dtype=x.dtype
        )
        y = y.reshape(*lead, y.shape[-1])
    else:
        node = {
            k: jax.lax.dynamic_index_in_dim(v, layer_idx, 0, keepdims=False)
            for k, v in heavy.items()
        }
        if light:
            node = {**node, **light}
        return dense(node, x)
    if light and "lora_a" in light:
        y = _apply_lora(light, x, y, dropout_mask=dropout_mask)
    return y
