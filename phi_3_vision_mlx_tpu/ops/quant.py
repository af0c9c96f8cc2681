"""Affine group quantization for weights and KV cache.

Scheme parity with the reference stack (MLX ``nn.quantize`` /
``mx.quantize``, used at /root/reference/phi_3_vision_mlx.py:264,296 and
/root/reference/phi.py:532-537): per-group affine quantization

    w ~= scales[g] * q + biases[g],   q in [0, 2**bits - 1]

with groups along the *input* (contraction) dimension — group 64 for weights,
group 32 for the KV cache.

Storage layout: our linear weights live transposed relative to HF, i.e.
``(in_features, out_features)`` so activations multiply as ``x @ w``.  The
quantized payload ``q`` is stored as ``uint8`` (one nibble value per byte for
4-bit; full byte for 8-bit).  The Pallas kernels in :mod:`ops.kernels` read
this layout directly and dequantize in VMEM; :func:`quantized_matmul` is the
XLA fallback.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core.config import QuantConfig


class QTensor(NamedTuple):
    """Quantized tensor: payload + per-group affine params.

    q:      (..., K, N) uint8 (values in [0, 2**bits - 1])
    scales: (..., K // group, N) float
    biases: (..., K // group, N) float
    """

    q: jax.Array
    scales: jax.Array
    biases: jax.Array


def quantize(w: jax.Array, group_size: int = 64, bits: int = 4, axis: int = -2) -> QTensor:
    """Quantize ``w`` along ``axis`` in groups of ``group_size``.

    For linear weights stored ``(K, N)``, ``axis=-2`` groups along K (the
    contraction dim), matching the reference's group-along-input convention.
    """
    if axis != -2:
        w = jnp.moveaxis(w, axis, -2)
    *lead, k, n = w.shape
    assert k % group_size == 0, f"K={k} not divisible by group={group_size}"
    levels = (1 << bits) - 1
    wf = w.astype(jnp.float32).reshape(*lead, k // group_size, group_size, n)
    w_min = wf.min(axis=-2, keepdims=True)
    w_max = wf.max(axis=-2, keepdims=True)
    scale = (w_max - w_min) / levels
    scale = jnp.where(scale == 0, 1.0, scale)
    q = jnp.clip(jnp.round((wf - w_min) / scale), 0, levels)
    q = q.reshape(*lead, k, n).astype(jnp.uint8)
    scales = scale.squeeze(-2)
    biases = w_min.squeeze(-2)
    out = QTensor(q=q, scales=scales, biases=biases)
    if axis != -2:
        out = QTensor(
            q=jnp.moveaxis(out.q, -2, axis),
            scales=jnp.moveaxis(out.scales, -2, axis),
            biases=jnp.moveaxis(out.biases, -2, axis),
        )
    return out


def dequantize(t: QTensor, dtype=jnp.bfloat16, axis: int = -2) -> jax.Array:
    """Inverse of :func:`quantize` (up to rounding)."""
    q, scales, biases = t
    if axis != -2:
        q = jnp.moveaxis(q, axis, -2)
        scales = jnp.moveaxis(scales, axis, -2)
        biases = jnp.moveaxis(biases, axis, -2)
    *lead, k, n = q.shape
    groups = scales.shape[-2]
    group_size = k // groups
    qf = q.astype(jnp.float32).reshape(*lead, groups, group_size, n)
    w = qf * scales[..., :, None, :].astype(jnp.float32) + biases[
        ..., :, None, :
    ].astype(jnp.float32)
    w = w.reshape(*lead, k, n).astype(dtype)
    if axis != -2:
        w = jnp.moveaxis(w, -2, axis)
    return w


def quantized_matmul(x: jax.Array, t: QTensor, dtype=None) -> jax.Array:
    """``x @ dequantize(t)`` — XLA fallback path.

    The production path for decode is the Pallas kernel
    (:func:`ops.kernels.quant_matmul`), which keeps the payload in int and
    dequantizes tiles in VMEM; this fallback lets every feature work before
    the kernel exists and on non-TPU backends.
    """
    dtype = dtype or x.dtype
    w = dequantize(t, dtype=dtype)
    precision = jax.lax.Precision.HIGHEST if dtype == jnp.float32 else None
    return jnp.matmul(x, w, precision=precision)


def quantize_for_saving(w_out_in: jax.Array, qcfg: QuantConfig) -> dict:
    """Quantize an HF-layout ``(out, in)`` weight for checkpoint storage.

    Returns arrays in the reference's on-disk convention: ``weight`` (packed
    payload), ``scales``, ``biases`` with groups along the input dim — so a
    converted checkpoint directory is self-describing, like the reference's
    ``quantized_model.safetensors`` (phi_3_vision_mlx.py:291-305).
    """
    t = quantize(w_out_in.T, group_size=qcfg.group_size, bits=qcfg.bits)
    return {"weight": t.q, "scales": t.scales, "biases": t.biases}
