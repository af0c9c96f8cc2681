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

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..core.config import QuantConfig


class QTensor(NamedTuple):
    """Quantized tensor: payload + per-group params.

    q:      (..., K, N) uint8 (values in [0, 2**bits - 1])
    scales: (..., K // group, N) float
    biases: (..., K // group, N) float, or None (symmetric mode:
            ``w ~= scales * (q - 2**(bits-1))``)
    """

    q: jax.Array
    scales: jax.Array
    biases: Optional[jax.Array]


def quantize(
    w: jax.Array,
    group_size: int = 64,
    bits: int = 4,
    axis: int = -2,
    mode: str = "affine",
) -> QTensor:
    """Quantize ``w`` along ``axis`` in groups of ``group_size``.

    For linear weights stored ``(K, N)``, ``axis=-2`` groups along K (the
    contraction dim), matching the reference's group-along-input convention.
    ``mode="symmetric"`` stores no biases: the payload is centered at
    ``mid = 2**(bits-1)`` and ``w ~= scales * (q - mid)``.
    """
    if axis != -2:
        w = jnp.moveaxis(w, axis, -2)
    *lead, k, n = w.shape
    assert k % group_size == 0, f"K={k} not divisible by group={group_size}"
    levels = (1 << bits) - 1
    wf = w.astype(jnp.float32).reshape(*lead, k // group_size, group_size, n)
    w_min = wf.min(axis=-2, keepdims=True)
    w_max = wf.max(axis=-2, keepdims=True)
    if mode == "symmetric":
        mid = 1 << (bits - 1)
        # q - mid spans [-mid, levels - mid]; size the scale so both extremes fit.
        scale = jnp.maximum(w_max / (levels - mid), w_min / (-mid))
        scale = jnp.where(scale <= 0, 1.0, scale)
        q = jnp.clip(jnp.round(wf / scale) + mid, 0, levels)
        biases = None
    else:
        scale = (w_max - w_min) / levels
        scale = jnp.where(scale == 0, 1.0, scale)
        q = jnp.clip(jnp.round((wf - w_min) / scale), 0, levels)
        biases = w_min.squeeze(-2)
    q = q.reshape(*lead, k, n).astype(jnp.uint8)
    out = QTensor(q=q, scales=scale.squeeze(-2), biases=biases)
    if axis != -2:
        out = QTensor(
            q=jnp.moveaxis(out.q, -2, axis),
            scales=jnp.moveaxis(out.scales, -2, axis),
            biases=None if out.biases is None else jnp.moveaxis(out.biases, -2, axis),
        )
    return out


# Zero point of symmetric payloads.  Symmetric mode is 4-bit only (it exists
# for the decode kernels, which are int4); affine covers other widths.
SYMMETRIC_MID = 8


def dequantize(t: QTensor, dtype=jnp.bfloat16, axis: int = -2) -> jax.Array:
    """Inverse of :func:`quantize` (up to rounding)."""
    q, scales, biases = t
    if axis != -2:
        q = jnp.moveaxis(q, axis, -2)
        scales = jnp.moveaxis(scales, axis, -2)
        biases = None if biases is None else jnp.moveaxis(biases, axis, -2)
    *lead, k, n = q.shape
    groups = scales.shape[-2]
    group_size = k // groups
    qf = q.astype(jnp.float32).reshape(*lead, groups, group_size, n)
    if biases is None:
        w = (qf - SYMMETRIC_MID) * scales[..., :, None, :].astype(jnp.float32)
    else:
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
    t = quantize(
        w_out_in.T, group_size=qcfg.group_size, bits=qcfg.bits, mode=qcfg.mode
    )
    out = {"weight": t.q, "scales": t.scales}
    if t.biases is not None:
        out["biases"] = t.biases
    return out
