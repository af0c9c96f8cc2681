"""Normalization ops (fp32 accumulation, cast back to input dtype)."""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def rms_norm(x, weight, eps: float = 1e-5):
    """RMSNorm as in the reference decoder (phi.py:478-479, 571)."""
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    out = xf * lax.rsqrt(var + eps) * weight.astype(jnp.float32)
    return out.astype(x.dtype)


def layer_norm(x, weight, bias, eps: float = 1e-5):
    """LayerNorm for the CLIP tower / GTE embedder (phi.py:165-167)."""
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    out = (xf - mu) * lax.rsqrt(var + eps)
    out = out * weight.astype(jnp.float32) + bias.astype(jnp.float32)
    return out.astype(x.dtype)
