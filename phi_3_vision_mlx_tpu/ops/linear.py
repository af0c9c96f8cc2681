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
        b = jnp.take(p["biases"], ids, axis=0)
        *lead, e = rows.shape
        groups = s.shape[-1]
        g = e // groups
        rf = rows.astype(jnp.float32).reshape(*lead, groups, g)
        rows = (rf * s[..., None] + b[..., None]).reshape(*lead, e)
        return rows.astype(dtype or s.dtype)
    return rows if dtype is None else rows.astype(dtype)


def dense(p: dict, x, *, lora_scale: float = 1.0, dropout_mask=None):
    """Apply a linear layer parameter dict to ``x`` (..., K) -> (..., N)."""
    if is_quantized(p):
        y = quantized_matmul(x, QTensor(p["weight"], p["scales"], p["biases"]))
    else:
        y = jnp.matmul(x, p["weight"].astype(x.dtype), precision=matmul_precision(x.dtype))
    if "bias" in p:
        y = y + p["bias"].astype(y.dtype)
    if "lora_a" in p:
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
        y = (y.astype(jnp.float32) + scale * z).astype(x.dtype)
    return y
