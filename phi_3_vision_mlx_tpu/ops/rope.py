"""Su-scaled (LongRoPE) rotary position embeddings.

Behavioral spec from the reference ``SuRoPE`` (/root/reference/phi.py:487-507):

* pick ``long_factor`` when the *total* window (prompt + max new tokens)
  exceeds ``original_max_position_embeddings``, else ``short_factor``;
* global attention scale ``sqrt(1 + log(max/orig)/log(orig))``;
* cos/sin are precomputed **once per generation** for the whole window and
  sliced per step — the key perf trick we keep;
* per-row position ids (``pids``) support left-padded batches: each row's
  positions continue from its own last prompt pid (phi.py:496-497).

All trig is done in float32 regardless of the compute dtype (parity with the
MLX reference which also computes RoPE tables in fp32).
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np

from ..core.config import ModelConfig


def su_rope_tables(cfg: ModelConfig, l_all: int, pids=None):
    """Precompute cos/sin for an entire decode window.

    Args:
      cfg: model config (rope_theta, rope_scaling, position limits).
      l_all: total window length = padded prompt length + max new tokens.
      pids: optional (B, L_prompt) int32 per-row position ids for left-padded
        batches.  Positions beyond the prompt continue each row's count.

    Returns:
      (cos, sin): float32 arrays of shape (B, l_all, head_dim) — B=1 when
      ``pids`` is None.
    """
    dim = cfg.head_dim
    if cfg.rope_scaling is not None and cfg.rope_scaling.long_factor:
        scaling_factor = math.sqrt(
            1.0
            + math.log(cfg.max_position_embeddings / cfg.original_max_position_embeddings)
            / math.log(cfg.original_max_position_embeddings)
        )
        su = (
            cfg.rope_scaling.long_factor
            if l_all > cfg.original_max_position_embeddings
            else cfg.rope_scaling.short_factor
        )
        su_factor = jnp.asarray(su, dtype=jnp.float32)
    else:
        scaling_factor = 1.0
        su_factor = jnp.ones((dim // 2,), dtype=jnp.float32)

    if pids is None:
        position_ids = jnp.arange(l_all, dtype=jnp.float32)[None]  # (1, L)
    else:
        pids = jnp.asarray(pids, dtype=jnp.float32)
        ext = pids[:, -1][:, None] + 1.0 + jnp.arange(
            l_all - pids.shape[1], dtype=jnp.float32
        )[None, :]
        position_ids = jnp.concatenate([pids, ext], axis=1)  # (B, L)

    inv_freq = 1.0 / (
        su_factor
        * (cfg.rope_theta ** (jnp.arange(0, dim, 2, dtype=jnp.float32) / dim))
    )  # (dim/2,)
    freqs = position_ids[:, :, None] * inv_freq[None, None, :]  # (B, L, dim/2)
    emb = jnp.concatenate([freqs, freqs], axis=-1)  # (B, L, dim)
    return jnp.cos(emb) * scaling_factor, jnp.sin(emb) * scaling_factor


def apply_rotary(x, cos, sin):
    """Rotate-half RoPE application (reference ``_rotate_half``, phi.py:418-423).

    Args:
      x: (B, H, L, D) queries or keys.
      cos/sin: (B, L, D) float32 tables for the same L positions.
    """
    half = x.shape[-1] // 2
    x1 = x[..., :half]
    x2 = x[..., half:]
    rotated = jnp.concatenate([-x2, x1], axis=-1)
    c = cos[:, None, :, :].astype(jnp.float32)
    s = sin[:, None, :, :].astype(jnp.float32)
    out = x.astype(jnp.float32) * c + rotated.astype(jnp.float32) * s
    return out.astype(x.dtype)


def su_rope_tables_np(cfg: ModelConfig, l_all: int, pids=None):
    """NumPy twin of :func:`su_rope_tables` for host-side precompute."""
    cos, sin = su_rope_tables(cfg, l_all, pids)
    return np.asarray(cos), np.asarray(sin)
