"""Pallas TPU flash attention (forward) for prefill.

The reference materializes the full L x L score matrix plus an L_all x L_all
additive mask (phi.py:454-457, 550-563) — an O(L^2)-memory cliff that makes
long-context prefill impossible (SURVEY.md §5).  This kernel computes
``softmax((q k^T) * scale + mask) v`` with online-softmax tiling: the score
tile only ever exists in VMEM, memory is O(L), and 128K-token prompts prefill
in blocks.

Masking is derived, not materialized: a query at absolute position
``q_pos0 + i`` may attend key ``j`` iff ``key_pos[j] <= q_pos`` (causal over
the shared cache window) and ``valid[j]`` (left-padding / attention-dropout
bits) — the same three facts the XLA path uses (ops/attention.py).

Grid: (B*KV, Lq tiles, Lk tiles) with the Lk axis as the sequential online-
softmax reduction.  GQA folds the q-head group into the query-tile rows.
Head dim is zero-padded to 128 lanes by the wrapper (zeros contribute
nothing to either matmul).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -0.7 * float(jnp.finfo(jnp.float32).max)
LANES = 128


def _kernel(
    qpos_ref,  # scalar prefetch: (1,) int32 — absolute position of q row 0
    q_ref,  # (1, blq*g, d)
    k_ref,  # (1, blk, d)
    v_ref,  # (1, blk, d)
    valid_ref,  # (1, 1, blk) int32
    o_ref,  # (1, blq*g, d)
    m_ref,  # VMEM (blq*g, LANES) f32
    l_ref,
    acc_ref,
    *,
    blq: int,
    blk: int,
    g: int,
    scale: float,
):
    kv_idx = pl.program_id(2)

    @pl.when(kv_idx == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    q = q_ref[0]  # (blq*g, d)
    k = k_ref[0]
    v = v_ref[0]

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (blq*g, blk)
    s *= scale

    # causal + validity mask from indices
    q_rows = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0) // g
    q_pos = qpos_ref[0] + pl.program_id(1) * blq + q_rows
    key_pos = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + kv_idx * blk
    ok = (key_pos <= q_pos) & (valid_ref[0, 0][None, :] > 0)
    s = jnp.where(ok, s, NEG_INF)

    m_prev = m_ref[...]
    l_prev = l_ref[...]
    m_curr = jnp.max(s, axis=1, keepdims=True)  # (rows, 1)
    m_next = jnp.maximum(m_prev, jnp.broadcast_to(m_curr, m_prev.shape))
    alpha = jnp.exp(m_prev - m_next)
    p = jnp.exp(s - m_next[:, :1])
    l_next = alpha * l_prev + jnp.broadcast_to(
        jnp.sum(p, axis=1, keepdims=True), l_prev.shape
    )
    m_ref[...] = m_next
    l_ref[...] = l_next
    acc_ref[...] = acc_ref[...] * alpha[:, : acc_ref.shape[1]] + jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(kv_idx == pl.num_programs(2) - 1)
    def _store():
        l = l_ref[...][:, : acc_ref.shape[1]]
        l = jnp.where(l == 0.0, 1.0, l)
        o_ref[0] = (acc_ref[...] / l).astype(o_ref.dtype)


import os as _os

# Tile-size knobs (import-time env read, like engine.PREFILL_CHUNK).
# r3 on-chip sweep, 32K-window chunked prefill tok/s (see ROADMAP):
#   (bq, bk) @ chunk 8192:  (256,512) 2643 -> (512,1024) 3381 ->
#   (1024,2048) 3375;  @ chunk 16384: (1024,2048) 3902;
#   @ chunk 32768 (one-shot): 4315.  (2048,2048)/(1024,4096) exceed the
# 16 MB scoped-VMEM limit.  Defaults pick the biggest VMEM-safe tiles.
_BLOCK_Q = int(_os.environ.get("PHI3V_TPU_FLASH_BQ", "1024"))
_BLOCK_K = int(_os.environ.get("PHI3V_TPU_FLASH_BK", "2048"))


@functools.partial(
    jax.jit, static_argnames=("scale", "block_q", "block_k")
)
def flash_attention(
    q, k, v, valid, q_pos0, *, scale: float, block_q: int = _BLOCK_Q,
    block_k: int = _BLOCK_K,
):
    """Flash attention against a (cached) key window.

    Args:
      q: (B, H, Lq, D) — fresh queries (D <= 128; padded to lanes here).
      k, v: (B, KV, Lk, D) — the full key window (cache contents included).
      valid: (B, Lk) bool — key visibility.
      q_pos0: () int32 — absolute position of the first query (cache offset).
      scale: softmax scale.
    Returns (B, H, Lq, D) in q.dtype.
    """
    b, h, lq, d = q.shape
    _, kvh, lk, _ = k.shape
    g = h // kvh
    assert d <= LANES
    d_pad = LANES - d
    if d_pad:
        pad = [(0, 0)] * 3 + [(0, d_pad)]
        q = jnp.pad(q, pad)
        k = jnp.pad(k, pad)
        v = jnp.pad(v, pad)

    blq = max(8, min(block_q // g, lq))  # keep row tiles bounded under GQA
    blk = min(block_k, lk)
    # pad sequence dims to block multiples (masked out via positions/valid)
    lq_pad = -lq % blq
    lk_pad = -lk % blk
    if lq_pad:
        q = jnp.pad(q, [(0, 0), (0, 0), (0, lq_pad), (0, 0)])
    if lk_pad:
        k = jnp.pad(k, [(0, 0), (0, 0), (0, lk_pad), (0, 0)])
        v = jnp.pad(v, [(0, 0), (0, 0), (0, lk_pad), (0, 0)])
        valid = jnp.pad(valid, [(0, 0), (0, lk_pad)])
    lq_t, lk_t = lq + lq_pad, lk + lk_pad

    # Fold GQA: query rows for kv-head kv are the g consecutive q-heads.
    # (B, H, Lq, D) -> (B*KV, Lq*g, D) with row r = query (r // g) of head
    # (kv*g + r % g): interleave heads into rows.
    qr = (
        q.reshape(b, kvh, g, lq_t, LANES)
        .transpose(0, 1, 3, 2, 4)
        .reshape(b * kvh, lq_t * g, LANES)
    )
    kr = k.reshape(b * kvh, lk_t, LANES)
    vr = v.reshape(b * kvh, lk_t, LANES)
    validr = jnp.repeat(valid.astype(jnp.int32), kvh, axis=0)[:, None, :]

    rows = blq * g
    grid = (b * kvh, lq_t // blq, lk_t // blk)
    out = pl.pallas_call(
        functools.partial(_kernel, blq=blq, blk=blk, g=g, scale=scale),
        out_shape=jax.ShapeDtypeStruct((b * kvh, lq_t * g, LANES), q.dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                # NB: with scalar prefetch, index maps receive the scalar ref
                # appended after the grid indices.
                pl.BlockSpec((1, rows, LANES), lambda bh, i, j, qp: (bh, i, 0)),
                pl.BlockSpec((1, blk, LANES), lambda bh, i, j, qp: (bh, j, 0)),
                pl.BlockSpec((1, blk, LANES), lambda bh, i, j, qp: (bh, j, 0)),
                pl.BlockSpec((1, 1, blk), lambda bh, i, j, qp: (bh, 0, j)),
            ],
            out_specs=pl.BlockSpec((1, rows, LANES), lambda bh, i, j, qp: (bh, i, 0)),
            scratch_shapes=[
                pltpu.VMEM((rows, LANES), jnp.float32),
                pltpu.VMEM((rows, LANES), jnp.float32),
                pltpu.VMEM((rows, LANES), jnp.float32),
            ],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )(jnp.asarray([q_pos0], jnp.int32), qr, kr, vr, validr)
    # (B*KV, Lq*g, 128) -> (B, H, Lq, D)
    out = (
        out.reshape(b, kvh, lq_t, g, LANES)
        .transpose(0, 1, 3, 2, 4)
        .reshape(b, h, lq_t, LANES)
    )
    return out[:, :, :lq, :d]
