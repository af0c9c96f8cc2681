"""Ring attention — context parallelism over a mesh axis.

The reference's 128K story is single-device (su-RoPE + cache quantization,
SURVEY.md §5); the TPU-idiomatic extension for contexts that exceed one
chip's HBM is to shard the *sequence* dimension and rotate K/V blocks around
a ring (`jax.lax.ppermute` — point-to-point over ICI) while every device
keeps online-softmax statistics for its local queries.  After P-1 rotations
each query has seen every key; communication is overlapped with compute and
totals one all-gather's worth of bytes.

Used via ``shard_map`` over a mesh axis (see tests/test_ring_attention.py);
single-shard meshes reduce to ordinary causal attention.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

NEG_INF = -0.7 * float(jnp.finfo(jnp.float32).max)


def _block_attend(q, k, v, allowed, scale):
    """One partial-attention block: returns (scores-exp @ v, m, l) stats."""
    s = jnp.einsum(
        "bhqd,bhkd->bhqk", q * scale, k, preferred_element_type=jnp.float32
    )
    s = jnp.where(allowed, s, NEG_INF)
    m = s.max(axis=-1)  # (B, H, Lq)
    p = jnp.exp(s - m[..., None])
    l = p.sum(axis=-1)
    o = jnp.einsum("bhqk,bhkd->bhqd", p.astype(v.dtype), v).astype(jnp.float32)
    return o, m, l


def ring_self_attention(q, k, v, valid, scale: float, axis_name: str):
    """Causal self-attention with sequence sharded on ``axis_name``.

    Call inside ``shard_map``; per-device shapes:
      q, k, v: (B, H|KV, L_local, D)   valid: (B, L_local)
    Positions are global: shard i holds [i*L_local, (i+1)*L_local).
    """
    p = lax.axis_size(axis_name)
    my = lax.axis_index(axis_name)
    b, h, lq, d = q.shape
    kvh = k.shape[1]
    if kvh != h:  # GQA: expand kv heads for the einsum
        k = jnp.repeat(k, h // kvh, axis=1)
        v = jnp.repeat(v, h // kvh, axis=1)

    q_pos = my * lq + jnp.arange(lq)  # (Lq,)
    perm = [(i, (i + 1) % p) for i in range(p)]

    def body(carry, step):
        m_run, l_run, acc, k_blk, v_blk, valid_blk = carry
        src = (my - step) % p
        key_pos = src * lq + jnp.arange(lq)
        allowed = (key_pos[None, :] <= q_pos[:, None])[None, None] & valid_blk[
            :, None, None, :
        ]
        o_blk, m_blk, l_blk = _block_attend(q, k_blk, v_blk, allowed, scale)
        m_new = jnp.maximum(m_run, m_blk)
        alpha = jnp.exp(m_run - m_new)
        beta = jnp.exp(m_blk - m_new)
        l_new = alpha * l_run + beta * l_blk
        acc = acc * alpha[..., None] + o_blk * beta[..., None]
        # rotate kv to the next device (skipping on the final step would
        # save one hop; kept unconditional for a single traced program)
        k_blk = lax.ppermute(k_blk, axis_name, perm)
        v_blk = lax.ppermute(v_blk, axis_name, perm)
        valid_blk = lax.ppermute(valid_blk, axis_name, perm)
        return (m_new, l_new, acc, k_blk, v_blk, valid_blk), None

    m0 = jnp.full((b, h, lq), NEG_INF, jnp.float32)
    l0 = jnp.zeros((b, h, lq), jnp.float32)
    acc0 = jnp.zeros((b, h, lq, d), jnp.float32)
    (m_f, l_f, acc_f, *_), _ = lax.scan(
        body, (m0, l0, acc0, k, v, valid), jnp.arange(p)
    )
    l_f = jnp.where(l_f == 0.0, 1.0, l_f)
    return (acc_f / l_f[..., None]).astype(q.dtype)


def make_ring_attention(mesh, seq_axis: str = "data"):
    """shard_map-wrapped ring attention over ``seq_axis`` of ``mesh``."""
    from jax.sharding import PartitionSpec as P

    spec_qkv = P(None, None, seq_axis, None)
    spec_valid = P(None, seq_axis)

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(spec_qkv, spec_qkv, spec_qkv, spec_valid),
        out_specs=spec_qkv,
        check_vma=False,
    )
    def fn(q, k, v, valid):
        d = q.shape[-1]
        return ring_self_attention(q, k, v, valid, d**-0.5, seq_axis)

    return fn
