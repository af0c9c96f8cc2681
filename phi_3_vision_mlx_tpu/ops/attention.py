"""Attention ops — XLA reference paths.

The reference decoder materializes an ``L_all x L_all`` additive ``Mask4D``
once per generation and computes full-score attention
(/root/reference/phi.py:454-457, 550-563).  On TPU we never materialize a
window-sized mask: masks are derived on the fly from three integer facts —
the cache write offset, per-key validity bits (left-padding / attention-mask
dropout), and the causal rule ``key_pos <= query_pos``.

Two shapes of the problem:

* :func:`prefill_attention` — self-attention over the fresh prompt chunk
  (L x L scores).  The Pallas flash-attention kernel
  (ops/kernels/flash_attention.py) replaces this for long prompts.
* :func:`decode_attention` — few queries against the whole KV cache window.

All softmax math is float32.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = -0.7 * float(jnp.finfo(jnp.float32).max)


def _gqa_scores(q, k, scale):
    """(B,H,Lq,D) x (B,KV,Lk,D) -> (B,H,Lq,Lk) with GQA head grouping."""
    b, h, lq, d = q.shape
    kv = k.shape[1]
    g = h // kv
    qg = q.reshape(b, kv, g, lq, d)
    s = jnp.einsum(
        "bkgqd,bkld->bkgql",
        qg * scale,
        k,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST if q.dtype == jnp.float32 else None,
    )
    return s.reshape(b, h, lq, k.shape[2])


def _gqa_out(p, v):
    """(B,H,Lq,Lk) x (B,KV,Lk,D) -> (B,H,Lq,D)."""
    b, h, lq, lk = p.shape
    kv = v.shape[1]
    g = h // kv
    pg = p.reshape(b, kv, g, lq, lk)
    o = jnp.einsum(
        "bkgql,bkld->bkgqd",
        pg,
        v.astype(p.dtype),
        precision=jax.lax.Precision.HIGHEST if v.dtype == jnp.float32 else None,
    )
    return o.reshape(b, h, lq, v.shape[3])


def masked_attention(q, k, v, allowed, scale):
    """softmax((q*scale) @ k^T + mask) @ v with a boolean ``allowed`` mask.

    Args:
      q: (B, H, Lq, D)
      k, v: (B, KV, Lk, D)
      allowed: broadcastable to (B, 1, Lq, Lk) bool — True where attention may
        flow.  Fully-masked rows produce a uniform distribution (their output
        is ignored downstream), never NaN.
      scale: softmax scale (1/sqrt(D)).
    Returns: (B, H, Lq, D) in q.dtype.
    """
    s = _gqa_scores(q, k, scale)
    s = jnp.where(allowed, s, NEG_INF)
    s = s - s.max(axis=-1, keepdims=True)
    p = jnp.exp(s)
    p = p / p.sum(axis=-1, keepdims=True)
    o = _gqa_out(p.astype(jnp.float32), v.astype(jnp.float32))
    return o.astype(q.dtype)


def prefill_attention(q, k, v, valid, scale):
    """Causal self-attention over a fresh prompt chunk.

    Args:
      q: (B, H, L, D); k, v: (B, KV, L, D)
      valid: (B, L) bool — False at left-pad positions.
    """
    l = q.shape[2]
    pos = jnp.arange(l)
    causal = pos[None, :] <= pos[:, None]  # (Lq, Lk)
    allowed = causal[None, None] & valid[:, None, None, :]
    return masked_attention(q, k, v, allowed, scale)


def blockwise_attention(q, k, v, valid, scale, q_block: int = 512,
                        k_block: int = 1024):
    """Causal self-attention with O(L * block) memory — and DIFFERENTIABLE.

    The Pallas flash kernel (ops/kernels/flash_attention.py) is forward-only;
    this is the training/backprop-safe counterpart for long sequences: a
    scan over query blocks, each running an online-softmax scan over key
    blocks, with ``jax.checkpoint`` on the per-query-block body so the
    backward pass recomputes instead of storing every (qblk, kblk) score
    tile.  Peak memory is O(q_block * L) instead of O(L^2).

    Args/returns match :func:`prefill_attention`; L must divide by q_block
    (the engine's prompt bucketing guarantees multiples of 64 — pad q_block
    down if needed).
    """
    b, h, l, d = q.shape
    kv = k.shape[1]
    if kv != h:  # expand GQA heads once; simpler than grouped einsums here
        k = jnp.repeat(k, h // kv, axis=1)
        v = jnp.repeat(v, h // kv, axis=1)
    q_block = min(q_block, l)
    while l % q_block:
        q_block //= 2
    k_block = min(k_block, l)
    while l % k_block:
        k_block //= 2
    nq, nk = l // q_block, l // k_block
    key_valid = valid  # (B, L)

    @jax.checkpoint
    def one_q_block(qi, q_blk):
        q_pos = qi * q_block + jnp.arange(q_block)

        def kv_step(carry, ki):
            m_run, l_run, acc = carry
            ks = jax.lax.dynamic_slice_in_dim(k, ki * k_block, k_block, 2)
            vs = jax.lax.dynamic_slice_in_dim(v, ki * k_block, k_block, 2)
            vmask = jax.lax.dynamic_slice_in_dim(key_valid, ki * k_block, k_block, 1)
            key_pos = ki * k_block + jnp.arange(k_block)
            ok = (key_pos[None, :] <= q_pos[:, None])[None, None] & vmask[
                :, None, None, :
            ]
            s = jnp.einsum(
                "bhqd,bhkd->bhqk", q_blk * scale, ks,
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST
                if q_blk.dtype == jnp.float32
                else None,
            )
            s = jnp.where(ok, s, NEG_INF)
            m_blk = s.max(axis=-1)
            m_new = jnp.maximum(m_run, m_blk)
            alpha = jnp.exp(m_run - m_new)
            p = jnp.exp(s - m_new[..., None])
            l_new = alpha * l_run + p.sum(axis=-1)
            acc = acc * alpha[..., None] + jnp.einsum(
                "bhqk,bhkd->bhqd", p, vs.astype(jnp.float32),
                precision=jax.lax.Precision.HIGHEST
                if q_blk.dtype == jnp.float32
                else None,
            )
            return (m_new, l_new, acc), None

        m0 = jnp.full((b, h, q_block), NEG_INF, jnp.float32)
        l0 = jnp.zeros((b, h, q_block), jnp.float32)
        acc0 = jnp.zeros((b, h, q_block, d), jnp.float32)
        (m_f, l_f, acc_f), _ = jax.lax.scan(
            kv_step, (m0, l0, acc0), jnp.arange(nk)
        )
        l_f = jnp.where(l_f == 0.0, 1.0, l_f)
        return acc_f / l_f[..., None]

    def q_step(_, qi):
        q_blk = jax.lax.dynamic_slice_in_dim(q, qi * q_block, q_block, 2)
        return None, one_q_block(qi, q_blk)

    _, blocks = jax.lax.scan(q_step, None, jnp.arange(nq))
    # (nq, B, H, q_block, D) -> (B, H, L, D)
    out = jnp.moveaxis(blocks, 0, 2).reshape(b, h, l, d)
    return out.astype(q.dtype)


def decode_attention(q, k_cache, v_cache, valid, q_pos, scale):
    """Attention of a small query chunk against the full cache window.

    Args:
      q: (B, H, Lq, D) — Lq is 1 for plain decode, >1 for constrained-decoding
        chunk scoring (reference _constrain, phi_3_vision_mlx.py:545,570).
      k_cache, v_cache: (B, KV, Lmax, D) — new keys already written at
        [offset, offset+Lq).
      valid: (B, Lmax) bool — key validity (False at left-pads and at
        positions >= offset+Lq that are stale/unwritten).
      q_pos: (Lq,) int32 absolute positions of the queries (offset + i).
    """
    lmax = k_cache.shape[2]
    key_pos = jnp.arange(lmax)
    causal = key_pos[None, :] <= q_pos[:, None]  # (Lq, Lmax)
    allowed = causal[None, None] & valid[:, None, None, :]
    return masked_attention(q, k_cache, v_cache, allowed, scale)
