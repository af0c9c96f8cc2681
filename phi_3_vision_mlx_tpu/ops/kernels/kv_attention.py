"""Pallas decode attention over the int4/int8-quantized KV cache.

The reference's quantized cache costs 3-4x decode throughput because it
dequantizes + re-concatenates the whole cache every step
(/root/reference/phi.py:536-539, SURVEY.md §6).  Our XLA fallback already
avoids the concat but still materializes a dequantized bf16 copy of the
cache per step (engine/state.py:read_kv).  This kernel removes that too: the
quantized payload streams HBM->VMEM once and is dequantized tile-by-tile
inside the online-softmax loop — decode traffic is the payload bytes, full
stop.

**Lane-interleaved head dim.**  KV quantization groups run along the head
dim (group 32, reference parity).  Expanding per-group scales to per-column
inside a kernel needs an element-repeat along lanes; `pltpu.repeat` tiles
instead (out[:, c] = in[:, c mod G]).  So the cache stores the head dim
column-permuted — column c holds original dim (c mod G)*32 + c//G — making
one `pltpu.repeat(scales, 32, axis=1)` the exact per-column scale matrix.
Queries get the same permutation (dot is permutation-invariant); the
attention output is un-permuted at the end (see engine/state.py helpers).

Grid: (B*KV, Lk tiles); Lk is the sequential online-softmax reduction.
Query rows = g q-heads x Lq (both tiny at decode), padded to the sublane
tile.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -0.7 * float(jnp.finfo(jnp.float32).max)


def d_perm(d: int, groups: int) -> np.ndarray:
    """Column permutation: new column c -> original dim (c % G)*gs + c//G."""
    gs = d // groups
    c = np.arange(d)
    return (c % groups) * gs + c // groups


def d_unperm(d: int, groups: int) -> np.ndarray:
    return np.argsort(d_perm(d, groups))


def _kernel(
    L_ref,  # scalar prefetch: (1,) int32 [layer]  (stacked cache)
    off_ref,  # scalar prefetch: (1,) int32 [offset]
    q_ref,  # (1, rows, d) bf16 — D-permuted queries (g heads x Lq rows)
    kv_ref,  # (1, 1, 1, d, blk) uint8 nibble-packed [k | v<<4] (D-interleaved)
    sc_ref,  # (1, 1, 1, 4G, blk) bf16 fused [ks; kb; vs; vb]
    valid_ref,  # (1, 1, blk) int32
    o_ref,  # (1, rows, d)
    m_ref,
    l_ref,
    acc_ref,
    *,
    blk: int,
    g: int,
    lq: int,
    scale: float,
):
    kv_idx = pl.program_id(2)

    @pl.when(kv_idx == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    d = q_ref.shape[-1]
    groups = sc_ref.shape[-2] // 4
    reps = d // groups
    payload = kv_ref[0, 0, 0].astype(jnp.int32)  # (d, blk): k lo, v hi nibble
    sc = sc_ref[0, 0, 0]  # (4G, blk) — one DMA for all scales/biases

    def dequant(qp, scs):
        # rows are group-interleaved (row r -> group r % G), so a sublane
        # tile-repeat of the (G, blk) scales is the per-row scale matrix.
        # The BIAS plane is NOT applied here: each pltpu.repeat +
        # elementwise pass over (d, blk) costs ~2.5 ms per 4 GB window and
        # the kernel is VPU-bound on exactly these passes
        # (experiments/qdecode_sweep.py: noscale 10.9 ms vs production
        # 20.9 ms at a 32K window).  The bias factors out algebraically —
        # q.(p4*sf + bf_rep) == q.(p4*sf) + sum_g qs_g*bf_g — and is added
        # on (rows, blk)/(rows, d) tiles below (rows ~ 8, so ~free).
        # Measured: 20.9 -> 16.9 ms/step, max drift 4.4e-5.
        sf = pltpu.repeat(scs, reps, 0).astype(jnp.float32)
        return (qp.astype(jnp.float32) * sf).astype(jnp.bfloat16)

    k_t = dequant(payload & 15, sc[:groups])  # (d, blk)
    q = q_ref[0]  # (rows, d)
    s = jax.lax.dot_general(
        q, k_t, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # (rows, blk)
    # factored k-bias: s += sum_g (sum_{d%G==g} q[r,d]) * bf_k[g, c]
    qf = q.astype(jnp.float32)
    dio_q = jax.lax.broadcasted_iota(jnp.int32, qf.shape, 1) % groups
    bfk = sc[groups : 2 * groups].astype(jnp.float32)
    for gg in range(groups):
        qs_g = jnp.sum(jnp.where(dio_q == gg, qf, 0.0), axis=1, keepdims=True)
        s = s + qs_g * bfk[gg : gg + 1, :]
    s *= scale

    q_rows = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0) % lq
    q_pos = off_ref[0] + q_rows
    key_pos = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + kv_idx * blk
    ok = (key_pos <= q_pos) & (valid_ref[0, 0][None, :] > 0)
    s = jnp.where(ok, s, NEG_INF)

    m_prev = m_ref[...]
    l_prev = l_ref[...]
    m_curr = jnp.max(s, axis=1, keepdims=True)
    m_next = jnp.maximum(m_prev, jnp.broadcast_to(m_curr, m_prev.shape))
    alpha = jnp.exp(m_prev - m_next)
    p = jnp.exp(s - m_next[:, :1])
    l_next = alpha * l_prev + jnp.broadcast_to(
        jnp.sum(p, axis=1, keepdims=True), l_prev.shape
    )
    m_ref[...] = m_next
    l_ref[...] = l_next
    v_t = dequant(payload >> 4, sc[2 * groups : 3 * groups])  # (d, blk)
    # o += p @ v: contract the blk dim of both (no transposes needed)
    upd = jax.lax.dot_general(
        p.astype(v_t.dtype), v_t, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    # factored v-bias: p.(p4v*sfv + bfv_rep)^T == p.(p4v*sfv)^T + pb[r, d%G]
    # where pb = p . bfv^T (rows, G).
    pb = jax.lax.dot_general(
        p.astype(jnp.bfloat16), sc[3 * groups :], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (rows, G)
    dio_v = jax.lax.broadcasted_iota(jnp.int32, upd.shape, 1) % groups
    for gg in range(groups):
        upd = upd + jnp.where(dio_v == gg, pb[:, gg : gg + 1], 0.0)
    acc_ref[...] = acc_ref[...] * alpha[:, : acc_ref.shape[1]] + upd

    @pl.when(kv_idx == pl.num_programs(2) - 1)
    def _store():
        l = l_ref[...][:, : acc_ref.shape[1]]
        l = jnp.where(l == 0.0, 1.0, l)
        o_ref[0] = (acc_ref[...] / l).astype(o_ref.dtype)


def _dense_kernel(
    x_ref,  # scalar prefetch: (1,) int32 [layer]
    off_ref,  # scalar prefetch: (1,) int32 [offset]
    q_ref,  # (1, rows, d)
    k_ref,  # (1, 1, 1, blk, d) — block of the stacked cache
    v_ref,
    valid_ref,  # (1, 1, blk) int32
    o_ref,
    m_ref,
    l_ref,
    acc_ref,
    *,
    blk: int,
    g: int,
    lq: int,
    scale: float,
):
    kv_idx = pl.program_id(2)

    @pl.when(kv_idx == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    k = k_ref[0, 0, 0].astype(jnp.bfloat16)  # (blk, d)
    q = q_ref[0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    s *= scale
    q_rows = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0) % lq
    q_pos = off_ref[0] + q_rows
    key_pos = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + kv_idx * blk
    ok = (key_pos <= q_pos) & (valid_ref[0, 0][None, :] > 0)
    s = jnp.where(ok, s, NEG_INF)

    m_prev = m_ref[...]
    l_prev = l_ref[...]
    m_curr = jnp.max(s, axis=1, keepdims=True)
    m_next = jnp.maximum(m_prev, jnp.broadcast_to(m_curr, m_prev.shape))
    alpha = jnp.exp(m_prev - m_next)
    p = jnp.exp(s - m_next[:, :1])
    l_next = alpha * l_prev + jnp.broadcast_to(
        jnp.sum(p, axis=1, keepdims=True), l_prev.shape
    )
    m_ref[...] = m_next
    l_ref[...] = l_next
    v = v_ref[0, 0, 0].astype(jnp.bfloat16)
    acc_ref[...] = acc_ref[...] * alpha[:, : acc_ref.shape[1]] + jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(kv_idx == pl.num_programs(2) - 1)
    def _store():
        l = l_ref[...][:, : acc_ref.shape[1]]
        l = jnp.where(l == 0.0, 1.0, l)
        o_ref[0] = (acc_ref[...] / l).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "block_k"))
def dense_kv_attention(
    q, k_stack, v_stack, valid, offset, layer_idx, *, scale: float, block_k: int = 512
):
    """Decode attention reading layer ``layer_idx`` of the *stacked* dense
    cache in place — no per-layer cache slice is ever materialized.

    q: (B, H, Lq, D); k_stack/v_stack: (nl, B, KV, Lmax, D); valid: (B, Lmax).
    """
    b, h, lq, d = q.shape
    nl, _, kvh, lmax, _ = k_stack.shape
    g = h // kvh
    blk = next(
        bb
        for bb in (8192, 4096, 2048, 1024, block_k, 256, 128, lmax)
        if bb <= lmax and lmax % bb == 0
    )

    rows = g * lq
    rows_pad = max(8, -(-rows // 8) * 8)
    qr = q.reshape(b, kvh, g, lq, d).reshape(b * kvh, g * lq, d).astype(jnp.bfloat16)
    if rows_pad != rows:
        qr = jnp.pad(qr, [(0, 0), (0, rows_pad - rows), (0, 0)])
    validr = jnp.repeat(valid.astype(jnp.int32), kvh, axis=0)[:, None, :]

    grid = (b, kvh, lmax // blk)
    out = pl.pallas_call(
        functools.partial(_dense_kernel, blk=blk, g=g, lq=lq, scale=scale),
        out_shape=jax.ShapeDtypeStruct((b * kvh, rows_pad, d), q.dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=[
                pl.BlockSpec(
                    (1, rows_pad, d),
                    lambda bi, hi, j, L, O: (bi * pl.num_programs(1) + hi, 0, 0),
                ),
                pl.BlockSpec(
                    (1, 1, 1, blk, d), lambda bi, hi, j, L, O: (L[0], bi, hi, j, 0)
                ),
                pl.BlockSpec(
                    (1, 1, 1, blk, d), lambda bi, hi, j, L, O: (L[0], bi, hi, j, 0)
                ),
                pl.BlockSpec(
                    (1, 1, blk),
                    lambda bi, hi, j, L, O: (bi * pl.num_programs(1) + hi, 0, j),
                ),
            ],
            out_specs=pl.BlockSpec(
                (1, rows_pad, d),
                lambda bi, hi, j, L, O: (bi * pl.num_programs(1) + hi, 0, 0),
            ),
            scratch_shapes=[
                pltpu.VMEM((rows_pad, 128), jnp.float32),
                pltpu.VMEM((rows_pad, 128), jnp.float32),
                pltpu.VMEM((rows_pad, d), jnp.float32),
            ],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
    )(
        jnp.asarray(layer_idx, jnp.int32).reshape(1),
        jnp.asarray(offset, jnp.int32).reshape(1),
        qr,
        k_stack,
        v_stack,
        validr,
    )
    return out[:, :rows].reshape(b, kvh, g, lq, d).reshape(b, h, lq, d)


def _paged_kernel(
    pt_ref,  # scalar prefetch: (S*mp,) int32 flattened page table
    off_ref,  # scalar prefetch: (S,) int32 per-slot offsets
    q_ref,  # (1, rows, d)
    k_ref,  # (1, 1, pg, d) — THE page selected by the index map
    v_ref,
    valid_ref,  # (1, 1, pg) int32 — this page's validity slice
    o_ref,
    m_ref,
    l_ref,
    acc_ref,
    *,
    pg: int,
    lq: int,
    scale: float,
):
    si = pl.program_id(0)
    pj = pl.program_id(2)

    @pl.when(pj == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    k = k_ref[0, 0].astype(jnp.bfloat16)  # (pg, d)
    q = q_ref[0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    s *= scale
    q_rows = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0) % lq
    off = off_ref[si]
    q_pos = off + q_rows
    key_pos = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + pj * pg
    # Fresh columns [offset, q_pos] are visible even though their validity
    # bits commit only after the step (write-then-attend); for lq == 1 this
    # is exactly the key_pos == q_pos diagonal, for speculative multi-query
    # passes it causally exposes the pass's earlier draft columns.
    ok = ((key_pos < off) & (valid_ref[0, 0, 0][None, :] > 0)) | (
        (key_pos >= off) & (key_pos <= q_pos)
    )
    s = jnp.where(ok, s, NEG_INF)

    m_prev = m_ref[...]
    l_prev = l_ref[...]
    m_curr = jnp.max(s, axis=1, keepdims=True)
    m_next = jnp.maximum(m_prev, jnp.broadcast_to(m_curr, m_prev.shape))
    alpha = jnp.exp(m_prev - m_next)
    p = jnp.exp(s - m_next[:, :1])
    l_next = alpha * l_prev + jnp.broadcast_to(
        jnp.sum(p, axis=1, keepdims=True), l_prev.shape
    )
    m_ref[...] = m_next
    l_ref[...] = l_next
    v = v_ref[0, 0].astype(jnp.bfloat16)
    acc_ref[...] = acc_ref[...] * alpha[:, : acc_ref.shape[1]] + jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(pj == pl.num_programs(2) - 1)
    def _store():
        l = l_ref[...][:, : acc_ref.shape[1]]
        l = jnp.where(l == 0.0, 1.0, l)
        o_ref[0] = (acc_ref[...] / l).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "interpret"))
def paged_kv_attention(
    q, pool_k, pool_v, page_tables, valid, offsets, *, scale: float,
    interpret: bool = False,
):
    """Paged decode attention: each grid step DMAs exactly ONE page, selected
    by the page table through the BlockSpec index map (scalar prefetch) — no
    gather, no logical-window materialization (engine/paging.py's XLA path
    does both).

    q: (S, H, Lq, D); pool_k/pool_v: (P, KV, pg, D) (one layer's pool);
    page_tables: (S, max_pages) int32 (sentinel >= P for unallocated);
    valid: (S, W) bool with W = max_pages * pg; offsets: (S,) int32.
    Returns (S, H, Lq, D).
    """
    s, h, lq, d = q.shape
    p_pages, kvh, pg, _ = pool_k.shape
    mp = page_tables.shape[1]
    g = h // kvh

    rows = g * lq
    rows_pad = max(8, -(-rows // 8) * 8)
    qr = q.reshape(s, kvh, g, lq, d).reshape(s * kvh, g * lq, d).astype(jnp.bfloat16)
    if rows_pad != rows:
        qr = jnp.pad(qr, [(0, 0), (0, rows_pad - rows), (0, 0)])
    # (S*KV, mp, 1, pg): the page dim indexes blocks; trailing (1, pg) keeps
    # Mosaic's last-two-dims block rule satisfied.
    validr = jnp.repeat(
        valid.reshape(s, 1, mp, pg).astype(jnp.int32), kvh, axis=1
    ).reshape(s * kvh, mp, 1, pg)

    pt_flat = jnp.minimum(page_tables, p_pages - 1).reshape(-1)  # clamp sentinel

    grid = (s, kvh, mp)
    out = pl.pallas_call(
        functools.partial(_paged_kernel, pg=pg, lq=lq, scale=scale),
        out_shape=jax.ShapeDtypeStruct((s * kvh, rows_pad, d), q.dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=[
                pl.BlockSpec(
                    (1, rows_pad, d),
                    lambda si, hi, pj, PT, O: (si * pl.num_programs(1) + hi, 0, 0),
                ),
                pl.BlockSpec(
                    (1, 1, pg, d),
                    lambda si, hi, pj, PT, O: (
                        PT[si * pl.num_programs(2) + pj], hi, 0, 0
                    ),
                ),
                pl.BlockSpec(
                    (1, 1, pg, d),
                    lambda si, hi, pj, PT, O: (
                        PT[si * pl.num_programs(2) + pj], hi, 0, 0
                    ),
                ),
                pl.BlockSpec(
                    (1, 1, 1, pg),
                    lambda si, hi, pj, PT, O: (
                        si * pl.num_programs(1) + hi, pj, 0, 0
                    ),
                ),
            ],
            out_specs=pl.BlockSpec(
                (1, rows_pad, d),
                lambda si, hi, pj, PT, O: (si * pl.num_programs(1) + hi, 0, 0),
            ),
            scratch_shapes=[
                pltpu.VMEM((rows_pad, 128), jnp.float32),
                pltpu.VMEM((rows_pad, 128), jnp.float32),
                pltpu.VMEM((rows_pad, d), jnp.float32),
            ],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(
        pt_flat,
        jnp.asarray(offsets, jnp.int32),
        qr,
        pool_k,
        pool_v,
        validr,
    )
    return out[:, :rows].reshape(s, kvh, g, lq, d).reshape(s, h, lq, d)


def _paged_q_kernel(
    pt_ref,  # scalar prefetch: (S*mp,) int32 flattened page table
    off_ref,  # scalar prefetch: (S,) int32 per-slot offsets
    q_ref,  # (1, rows, d) — D-permuted queries
    kv_ref,  # (1, 1, d, pg) uint8 nibble-packed [k | v<<4] page
    sc_ref,  # (1, 1, 4G, pg) bf16 fused scale planes
    valid_ref,  # (1, 1, 1, pg) int32
    o_ref,
    m_ref,
    l_ref,
    acc_ref,
    *,
    pg: int,
    lq: int,
    scale: float,
):
    si = pl.program_id(0)
    pj = pl.program_id(2)

    @pl.when(pj == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    d = q_ref.shape[-1]
    groups = sc_ref.shape[-2] // 4
    reps = d // groups
    payload = kv_ref[0, 0].astype(jnp.int32)  # (d, pg)
    sc = sc_ref[0, 0]  # (4G, pg)

    def dequant(qp, scs, bis):
        sf = pltpu.repeat(scs, reps, 0).astype(jnp.float32)
        bf = pltpu.repeat(bis, reps, 0).astype(jnp.float32)
        return (qp.astype(jnp.float32) * sf + bf).astype(jnp.bfloat16)

    k_t = dequant(payload & 15, sc[:groups], sc[groups : 2 * groups])  # (d, pg)
    q = q_ref[0]
    s = jax.lax.dot_general(
        q, k_t, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    s *= scale
    q_rows = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0) % lq
    off = off_ref[si]
    q_pos = off + q_rows
    key_pos = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + pj * pg
    # fresh-region rule: see _paged_kernel (supports speculative lq > 1)
    ok = ((key_pos < off) & (valid_ref[0, 0, 0][None, :] > 0)) | (
        (key_pos >= off) & (key_pos <= q_pos)
    )
    s = jnp.where(ok, s, NEG_INF)

    m_prev = m_ref[...]
    l_prev = l_ref[...]
    m_curr = jnp.max(s, axis=1, keepdims=True)
    m_next = jnp.maximum(m_prev, jnp.broadcast_to(m_curr, m_prev.shape))
    alpha = jnp.exp(m_prev - m_next)
    p = jnp.exp(s - m_next[:, :1])
    l_next = alpha * l_prev + jnp.broadcast_to(
        jnp.sum(p, axis=1, keepdims=True), l_prev.shape
    )
    m_ref[...] = m_next
    l_ref[...] = l_next
    v_t = dequant(payload >> 4, sc[2 * groups : 3 * groups], sc[3 * groups :])
    acc_ref[...] = acc_ref[...] * alpha[:, : acc_ref.shape[1]] + jax.lax.dot_general(
        p.astype(v_t.dtype), v_t, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(pj == pl.num_programs(2) - 1)
    def _store():
        l = l_ref[...][:, : acc_ref.shape[1]]
        l = jnp.where(l == 0.0, 1.0, l)
        o_ref[0] = (acc_ref[...] / l).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "interpret"))
def paged_quantized_kv_attention(
    q, pool_payload, pool_scales, page_tables, valid, offsets, *, scale: float,
    interpret: bool = False,
):
    """Paged decode attention over the nibble-packed quantized page pool.

    q: (S, H, Lq, D) — already D-permuted (see module docstring).
    pool_payload: (P, KV, D, pg) uint8 [k | v<<4]; pool_scales: (P, KV, 4G, pg).
    page_tables: (S, max_pages) int32; valid: (S, W); offsets: (S,).
    Returns (S, H, Lq, D), still D-permuted.
    """
    s, h, lq, d = q.shape
    p_pages, kvh, _, pg = pool_payload.shape
    mp = page_tables.shape[1]
    g = h // kvh
    gq4 = pool_scales.shape[2]

    rows = g * lq
    rows_pad = max(8, -(-rows // 8) * 8)
    qr = q.reshape(s, kvh, g, lq, d).reshape(s * kvh, g * lq, d).astype(jnp.bfloat16)
    if rows_pad != rows:
        qr = jnp.pad(qr, [(0, 0), (0, rows_pad - rows), (0, 0)])
    validr = jnp.repeat(
        valid.reshape(s, 1, mp, pg).astype(jnp.int32), kvh, axis=1
    ).reshape(s * kvh, mp, 1, pg)
    pt_flat = jnp.minimum(page_tables, p_pages - 1).reshape(-1)

    grid = (s, kvh, mp)
    out = pl.pallas_call(
        functools.partial(_paged_q_kernel, pg=pg, lq=lq, scale=scale),
        out_shape=jax.ShapeDtypeStruct((s * kvh, rows_pad, d), q.dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=[
                pl.BlockSpec(
                    (1, rows_pad, d),
                    lambda si, hi, pj, PT, O: (si * pl.num_programs(1) + hi, 0, 0),
                ),
                pl.BlockSpec(
                    (1, 1, d, pg),
                    lambda si, hi, pj, PT, O: (
                        PT[si * pl.num_programs(2) + pj], hi, 0, 0
                    ),
                ),
                pl.BlockSpec(
                    (1, 1, gq4, pg),
                    lambda si, hi, pj, PT, O: (
                        PT[si * pl.num_programs(2) + pj], hi, 0, 0
                    ),
                ),
                pl.BlockSpec(
                    (1, 1, 1, pg),
                    lambda si, hi, pj, PT, O: (
                        si * pl.num_programs(1) + hi, pj, 0, 0
                    ),
                ),
            ],
            out_specs=pl.BlockSpec(
                (1, rows_pad, d),
                lambda si, hi, pj, PT, O: (si * pl.num_programs(1) + hi, 0, 0),
            ),
            scratch_shapes=[
                pltpu.VMEM((rows_pad, 128), jnp.float32),
                pltpu.VMEM((rows_pad, 128), jnp.float32),
                pltpu.VMEM((rows_pad, d), jnp.float32),
            ],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(
        pt_flat,
        jnp.asarray(offsets, jnp.int32),
        qr,
        pool_payload,
        pool_scales,
        validr,
    )
    return out[:, :rows].reshape(s, kvh, g, lq, d).reshape(s, h, lq, d)


@functools.partial(jax.jit, static_argnames=("scale", "block_k", "interpret"))
def quantized_kv_attention(
    q, kv_payload, kv_scales, valid, offset, layer_idx, *, scale: float,
    block_k: int = 16384, interpret: bool = False,
):
    """Decode attention reading layer ``layer_idx`` of the *stacked*
    quantized cache directly (transposed storage; see module docstring).

    q: (B, H, Lq, D) queries, already D-permuted.
    kv_payload: (nl, B, KV, D, Lmax) uint8 nibble-packed [k | v<<4] payload.
    kv_scales: (nl, B, KV, 4G, Lmax) bf16 fused [ks; kb; vs; vb].
    valid: (B, Lmax) bool.  offset: () int32.  layer_idx: () int32.
    Returns: (B, H, Lq, D) in q.dtype, still D-permuted.
    """
    b, h, lq, d = q.shape
    nl, _, kvh, _, lmax = kv_payload.shape
    g = h // kvh
    # Prefer block_k (default 16K: large contiguous DMAs are what the HBM
    # controller wants — the payload's last two dims are row-major), falling
    # back to the largest divisor of Lmax below it.
    blk = next(
        bb
        for bb in (block_k, 8192, 4096, 2048, 1024, 512, 256, 128, lmax)
        if bb <= lmax and lmax % bb == 0
    )
    gq4 = kv_scales.shape[-2]

    rows = g * lq
    rows_pad = max(8, -(-rows // 8) * 8)
    qr = q.reshape(b, kvh, g, lq, d).reshape(b * kvh, g * lq, d).astype(jnp.bfloat16)
    if rows_pad != rows:
        qr = jnp.pad(qr, [(0, 0), (0, rows_pad - rows), (0, 0)])
    validr = jnp.repeat(valid.astype(jnp.int32), kvh, axis=0)[:, None, :]

    grid = (b, kvh, lmax // blk)
    out = pl.pallas_call(
        functools.partial(_kernel, blk=blk, g=g, lq=lq, scale=scale),
        out_shape=jax.ShapeDtypeStruct((b * kvh, rows_pad, d), q.dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=[
                pl.BlockSpec(
                    (1, rows_pad, d),
                    lambda bi, hi, j, L, O: (bi * pl.num_programs(1) + hi, 0, 0),
                ),
                pl.BlockSpec(
                    (1, 1, 1, d, blk),
                    lambda bi, hi, j, L, O: (L[0], bi, hi, 0, j),
                ),
                pl.BlockSpec(
                    (1, 1, 1, gq4, blk),
                    lambda bi, hi, j, L, O: (L[0], bi, hi, 0, j),
                ),
                pl.BlockSpec(
                    (1, 1, blk),
                    lambda bi, hi, j, L, O: (bi * pl.num_programs(1) + hi, 0, j),
                ),
            ],
            out_specs=pl.BlockSpec(
                (1, rows_pad, d),
                lambda bi, hi, j, L, O: (bi * pl.num_programs(1) + hi, 0, 0),
            ),
            scratch_shapes=[
                pltpu.VMEM((rows_pad, 128), jnp.float32),
                pltpu.VMEM((rows_pad, 128), jnp.float32),
                pltpu.VMEM((rows_pad, d), jnp.float32),
            ],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(
        jnp.asarray(layer_idx, jnp.int32).reshape(1),
        jnp.asarray(offset, jnp.int32).reshape(1),
        qr,
        kv_payload,
        kv_scales,
        validr,
    )
    return out[:, :rows].reshape(b, kvh, g, lq, d).reshape(b, h, lq, d)


# ---------------------------------------------------------------------------
# Quantized-cache FLASH attention (prefill-sized query blocks)
# ---------------------------------------------------------------------------


def _qflash_kernel(
    L_ref,  # scalar prefetch: (1,) int32 [layer]
    qp_ref,  # scalar prefetch: (1,) int32 [absolute position of q row 0]
    q_ref,  # (1, blq*g, d) bf16 — D-permuted queries, heads interleaved
    kv_ref,  # (1, 1, 1, d, blk) uint8 nibble-packed [k | v<<4]
    sc_ref,  # (1, 1, 1, 4G, blk) bf16 fused [ks; kb; vs; vb]
    valid_ref,  # (1, 1, blk) int32
    o_ref,  # (1, blq*g, d)
    m_ref,
    l_ref,
    acc_ref,
    *,
    blq: int,
    blk: int,
    g: int,
    scale: float,
):
    kv_idx = pl.program_id(3)

    @pl.when(kv_idx == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    d = q_ref.shape[-1]
    groups = sc_ref.shape[-2] // 4
    reps = d // groups
    payload = kv_ref[0, 0, 0].astype(jnp.int32)  # (d, blk)
    sc = sc_ref[0, 0, 0]  # (4G, blk)

    def dequant(qp, scs, bis):
        sf = pltpu.repeat(scs, reps, 0).astype(jnp.float32)
        bf = pltpu.repeat(bis, reps, 0).astype(jnp.float32)
        return (qp.astype(jnp.float32) * sf + bf).astype(jnp.bfloat16)

    k_t = dequant(payload & 15, sc[:groups], sc[groups : 2 * groups])  # (d, blk)
    q = q_ref[0]  # (blq*g, d)
    s = jax.lax.dot_general(
        q, k_t, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # (rows, blk)
    s *= scale

    # causal + validity mask from indices (flash_attention's derivation; rows
    # interleave the g q-heads of one query: row r -> query r // g)
    q_rows = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0) // g
    q_pos = qp_ref[0] + pl.program_id(2) * blq + q_rows
    key_pos = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + kv_idx * blk
    ok = (key_pos <= q_pos) & (valid_ref[0, 0][None, :] > 0)
    s = jnp.where(ok, s, NEG_INF)

    m_prev = m_ref[...]
    l_prev = l_ref[...]
    m_curr = jnp.max(s, axis=1, keepdims=True)
    m_next = jnp.maximum(m_prev, jnp.broadcast_to(m_curr, m_prev.shape))
    alpha = jnp.exp(m_prev - m_next)
    p = jnp.exp(s - m_next[:, :1])
    l_next = alpha * l_prev + jnp.broadcast_to(
        jnp.sum(p, axis=1, keepdims=True), l_prev.shape
    )
    m_ref[...] = m_next
    l_ref[...] = l_next
    v_t = dequant(payload >> 4, sc[2 * groups : 3 * groups], sc[3 * groups :])
    acc_ref[...] = acc_ref[...] * alpha[:, : acc_ref.shape[1]] + jax.lax.dot_general(
        p.astype(v_t.dtype), v_t, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(kv_idx == pl.num_programs(3) - 1)
    def _store():
        l = l_ref[...][:, : acc_ref.shape[1]]
        l = jnp.where(l == 0.0, 1.0, l)
        o_ref[0] = (acc_ref[...] / l).astype(o_ref.dtype)


# r3 on-chip tile sweep (lq=1024 scoring vs a 32K window, 32 layers):
# (256,1024) 215 ms -> (512,1024) 180 -> (256,2048) 192 -> (512,2048) 171
# -> (1024,2048) 161 -> (1024,1024) 163.  Env: PHI3V_TPU_QFLASH_BQ/BK.
_QF_BLOCK_Q = int(os.environ.get("PHI3V_TPU_QFLASH_BQ", "1024"))
_QF_BLOCK_K = int(os.environ.get("PHI3V_TPU_QFLASH_BK", "2048"))


@functools.partial(
    jax.jit, static_argnames=("scale", "block_q", "block_k", "interpret")
)
def quantized_flash_attention(
    q, kv_payload, kv_scales, valid, q_pos0, layer_idx, *, scale: float,
    block_q: int = _QF_BLOCK_Q, block_k: int = _QF_BLOCK_K,
    interpret: bool = False,
):
    """Flash attention reading the stacked nibble-packed quantized cache IN
    PLACE — the prefill-sized counterpart of :func:`quantized_kv_attention`.

    Chunked long prefill previously materialized a dequantized copy of the
    full window per chunk per layer (engine read_kv; VERDICT r2 item 2); this
    kernel streams the payload once per (q-tile, k-tile) pair and dequantizes
    tile-by-tile inside the online-softmax loop.

    q: (B, H, Lq, D) queries, already D-permuted (see module docstring).
    kv_payload: (nl, B, KV, D, Lmax) uint8 [k | v<<4]; kv_scales:
    (nl, B, KV, 4G, Lmax) bf16.  valid: (B, Lmax).  q_pos0: () int32 —
    absolute position of the first query (cache offset).  Returns
    (B, H, Lq, D) in q.dtype, still D-permuted.
    """
    b, h, lq, d = q.shape
    nl, _, kvh, _, lmax = kv_payload.shape
    g = h // kvh
    gq4 = kv_scales.shape[-2]
    blq = max(8, min(block_q // g, lq))
    lq_pad = -lq % blq
    if lq_pad:
        q = jnp.pad(q, [(0, 0), (0, 0), (0, lq_pad), (0, 0)])
    lq_t = lq + lq_pad
    blk = next(
        bb
        for bb in (block_k, 512, 256, 128, lmax)
        if bb <= lmax and lmax % bb == 0
    )

    # flash_attention's GQA fold: row r of a q-tile = query (r // g) of head
    # (kv*g + r % g)
    qr = (
        q.reshape(b, kvh, g, lq_t, d)
        .transpose(0, 1, 3, 2, 4)
        .reshape(b * kvh, lq_t * g, d)
        .astype(jnp.bfloat16)
    )
    validr = jnp.repeat(valid.astype(jnp.int32), kvh, axis=0)[:, None, :]

    rows = blq * g
    grid = (b, kvh, lq_t // blq, lmax // blk)
    out = pl.pallas_call(
        functools.partial(_qflash_kernel, blq=blq, blk=blk, g=g, scale=scale),
        out_shape=jax.ShapeDtypeStruct((b * kvh, lq_t * g, d), q.dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=[
                pl.BlockSpec(
                    (1, rows, d),
                    lambda bi, hi, qi, kj, L, QP: (
                        bi * pl.num_programs(1) + hi, qi, 0
                    ),
                ),
                pl.BlockSpec(
                    (1, 1, 1, d, blk),
                    lambda bi, hi, qi, kj, L, QP: (L[0], bi, hi, 0, kj),
                ),
                pl.BlockSpec(
                    (1, 1, 1, gq4, blk),
                    lambda bi, hi, qi, kj, L, QP: (L[0], bi, hi, 0, kj),
                ),
                pl.BlockSpec(
                    (1, 1, blk),
                    lambda bi, hi, qi, kj, L, QP: (
                        bi * pl.num_programs(1) + hi, 0, kj
                    ),
                ),
            ],
            out_specs=pl.BlockSpec(
                (1, rows, d),
                lambda bi, hi, qi, kj, L, QP: (
                    bi * pl.num_programs(1) + hi, qi, 0
                ),
            ),
            scratch_shapes=[
                pltpu.VMEM((rows, 128), jnp.float32),
                pltpu.VMEM((rows, 128), jnp.float32),
                pltpu.VMEM((rows, d), jnp.float32),
            ],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary", "arbitrary"),
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(
        jnp.asarray(layer_idx, jnp.int32).reshape(1),
        jnp.asarray(q_pos0, jnp.int32).reshape(1),
        qr,
        kv_payload,
        kv_scales,
        validr,
    )
    out = (
        out.reshape(b, kvh, lq_t, g, d)
        .transpose(0, 1, 3, 2, 4)
        .reshape(b, h, lq_t, d)
    )
    return out[:, :, :lq]
