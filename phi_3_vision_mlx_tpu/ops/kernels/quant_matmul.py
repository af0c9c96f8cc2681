"""Pallas TPU kernel: activation x group-quantized weight matmul.

The decode hot path is HBM-bandwidth-bound on weight reads (SURVEY.md §6 —
the reference's 2.4x speedup from 4-bit weights is pure bandwidth).  The XLA
fallback (`ops.quant.quantized_matmul`) materializes the dequantized bf16
weight in HBM every call, tripling traffic; this kernel streams the int8
payload HBM->VMEM once, dequantizes whole tiles with a single fused
VPU op, and feeds the MXU directly:

    y[M, N] = x[M, K] @ (scales[g(K), N] * q[K, N] + biases[g(K), N])

**Interleaved layout trick.** Expanding per-group scales to per-row inside a
kernel needs an element-repeat, which Mosaic lowers poorly (reshapes/rolls).
`pltpu.repeat` instead *tiles* its input: out[r] = in[r mod G].  So
:func:`to_kernel_layout` row-permutes the payload within every K-block such
that the group of row ``r`` IS ``r mod G`` — after that, one cheap
`pltpu.repeat` of the (G, bn) scale tile is exactly the right per-row scale
matrix, and dequant is a single (bk, bn) fused multiply-add.  Activations
get the matching column permutation (a static gather on a tiny (M, K) array,
fused into the surrounding XLA program for free).

Grid: (N tiles, K tiles); K is the sequential reduction dimension with an
f32 VMEM accumulator.  M (decode batch) is small and lives entirely in VMEM.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK_K = 512


def _perm_for(k: int, group: int, block_k: int) -> np.ndarray:
    """Row permutation: within each K-block, row r holds original element
    k0 = block_start + (r % gk) * group + r // gk  (gk = block_k // group)."""
    gk = block_k // group
    perm = np.arange(k).reshape(k // block_k, gk, group)
    perm = perm.transpose(0, 2, 1).reshape(k)  # new_row -> original_k
    return perm


def to_kernel_layout(q, scales, biases, block_k: int = BLOCK_K):
    """(K, N) uint8 payload -> interleaved (K, N) int8 + f32 scales/biases."""
    k, n = q.shape
    groups = scales.shape[0]
    group = k // groups
    block_k = min(block_k, k)
    perm = _perm_for(k, group, block_k)
    q_perm = jnp.asarray(q)[perm].astype(jnp.int8)
    return q_perm, scales.astype(jnp.float32), biases.astype(jnp.float32)


def unpermute_payload(q_perm, group: int = 64, block_k: int = BLOCK_K):
    """Kernel-interleaved payload -> plain (K, N) uint8 (for the XLA path)."""
    k = q_perm.shape[-2]
    perm = _perm_for(k, group, min(block_k, k))
    inv = np.argsort(perm)
    return jnp.asarray(q_perm)[..., inv, :].astype(jnp.uint8)


def permute_activation(x, group: int, block_k: int = BLOCK_K):
    """Apply the matching K-column permutation to activations.

    Expressed as reshape-transpose-reshape, NOT a gather: the permutation is
    exactly a within-block (gk, group) transpose, and TPU lowers small
    transposes orders of magnitude faster than generic gathers (a profiled
    x[..., perm] gather cost ~65us per 8K-wide activation).
    """
    k = x.shape[-1]
    block_k = min(block_k, k)
    gk = block_k // group
    lead = x.shape[:-1]
    x3 = x.reshape(*lead, k // block_k, gk, group)
    return jnp.swapaxes(x3, -1, -2).reshape(*lead, k)


PACK_BLOCK_N = 512


def pack_nibbles(q_perm, block_n: int = PACK_BLOCK_N):
    """Interleaved (K, N) 4-bit payload -> (K, N//2) uint8, two nibbles/byte.

    Within each ``block_n``-column block, byte j packs column j (low nibble)
    and column j + block_n//2 (high nibble) — so the kernel unpacks with two
    bit-ops and one lane-dim concat, no shuffles.
    """
    k, n = q_perm.shape
    assert n % block_n == 0
    half = block_n // 2
    q = jnp.asarray(q_perm).astype(jnp.uint8).reshape(k, n // block_n, block_n)
    lo = q[:, :, :half]
    hi = q[:, :, half:]
    packed = (lo | (hi << 4)).reshape(k, n // 2)
    return packed


def _packed_kernel(x_ref, q_ref, s_ref, b_ref, o_ref, acc_ref, *, out_dtype):
    @pl.when(pl.program_id(1) == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    bk = q_ref.shape[0]
    bn = s_ref.shape[1]
    half = bn // 2
    reps = bk // s_ref.shape[0]
    v = q_ref[...].astype(jnp.int32)  # (bk, bn//2)
    lo = (v & 15).astype(jnp.float32)
    hi = (v >> 4).astype(jnp.float32)
    # Scales are stored bf16 (half the HBM traffic) but dequant math runs in
    # f32 — bf16 VPU arithmetic measured slower on this target.
    s_full = pltpu.repeat(s_ref[...], reps, 0).astype(jnp.float32)
    b_full = pltpu.repeat(b_ref[...], reps, 0).astype(jnp.float32)
    w = jnp.concatenate(
        [
            lo * s_full[:, :half] + b_full[:, :half],
            hi * s_full[:, half:] + b_full[:, half:],
        ],
        axis=1,
    ).astype(jnp.bfloat16)
    acc_ref[...] += jax.lax.dot_general(
        x_ref[...].astype(jnp.bfloat16),
        w,
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(pl.program_id(1) == pl.num_programs(1) - 1)
    def _store():
        o_ref[...] = acc_ref[...].astype(out_dtype)


@functools.partial(jax.jit, static_argnames=("block_k", "out_dtype"))
def quant_matmul_packed(
    x_perm, q_packed, scales, biases, *, block_k: int = BLOCK_K, out_dtype=None
):
    """Packed-int4 variant; expects pre-permuted x and packed payload."""
    m, k = x_perm.shape
    kk, n_half = q_packed.shape
    assert k == kk
    n = n_half * 2
    out_dtype = out_dtype or x_perm.dtype
    block_n = PACK_BLOCK_N
    block_k = min(block_k, k)
    assert k % block_k == 0 and n % block_n == 0, (k, n)
    groups = scales.shape[0]
    group = k // groups
    gk = block_k // group

    m_pad = max(8, -(-m // 8) * 8)
    if m_pad != m:
        x_perm = jnp.pad(x_perm, ((0, m_pad - m), (0, 0)))

    grid = (n // block_n, k // block_k)
    out = pl.pallas_call(
        functools.partial(_packed_kernel, out_dtype=out_dtype),
        out_shape=jax.ShapeDtypeStruct((m_pad, n), out_dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((m_pad, block_k), lambda j, kk: (0, kk)),
            pl.BlockSpec((block_k, block_n // 2), lambda j, kk: (kk, j)),
            pl.BlockSpec((gk, block_n), lambda j, kk: (kk, j)),
            pl.BlockSpec((gk, block_n), lambda j, kk: (kk, j)),
        ],
        out_specs=pl.BlockSpec((m_pad, block_n), lambda j, kk: (0, j)),
        scratch_shapes=[pltpu.VMEM((m_pad, block_n), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
    )(x_perm, q_packed, scales, biases)
    return out[:m] if m_pad != m else out


def _packed_kernel_stacked(
    idx_ref, x_ref, q_ref, s_ref, b_ref, o_ref, acc_ref, *, out_dtype
):
    """Stacked-layer variant: payload/scales keep their (num_layers, ...)
    leading axis in HBM and the BlockSpec index map selects the layer — the
    decode loop never materializes per-layer weight slices (profiled at
    ~2.6 ms/step of pure copy before this)."""
    @pl.when(pl.program_id(1) == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    bk = q_ref.shape[1]
    bn = s_ref.shape[2]
    half = bn // 2
    reps = bk // s_ref.shape[1]
    v = q_ref[0].astype(jnp.int32)
    lo = (v & 15).astype(jnp.float32)
    hi = (v >> 4).astype(jnp.float32)
    s_full = pltpu.repeat(s_ref[0], reps, 0).astype(jnp.float32)
    b_full = pltpu.repeat(b_ref[0], reps, 0).astype(jnp.float32)
    w = jnp.concatenate(
        [
            lo * s_full[:, :half] + b_full[:, :half],
            hi * s_full[:, half:] + b_full[:, half:],
        ],
        axis=1,
    ).astype(jnp.bfloat16)
    acc_ref[...] += jax.lax.dot_general(
        x_ref[...].astype(jnp.bfloat16),
        w,
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(pl.program_id(1) == pl.num_programs(1) - 1)
    def _store():
        o_ref[...] = acc_ref[...].astype(out_dtype)


@functools.partial(jax.jit, static_argnames=("block_k", "out_dtype"))
def quant_matmul_packed_stacked(
    x_perm, q_packed, scales, biases, layer_idx, *, block_k: int = BLOCK_K,
    out_dtype=None,
):
    """Packed-int4 matmul against layer ``layer_idx`` of stacked weights.

    q_packed: (nl, K, N//2) uint8; scales/biases: (nl, K//g, N).
    """
    m, k = x_perm.shape
    nl, kk, n_half = q_packed.shape
    assert k == kk
    n = n_half * 2
    out_dtype = out_dtype or x_perm.dtype
    block_n = PACK_BLOCK_N
    block_k = min(block_k, k)
    assert k % block_k == 0 and n % block_n == 0, (k, n)
    groups = scales.shape[1]
    group = k // groups
    gk = block_k // group

    m_pad = max(8, -(-m // 8) * 8)
    if m_pad != m:
        x_perm = jnp.pad(x_perm, ((0, m_pad - m), (0, 0)))

    grid = (n // block_n, k // block_k)
    out = pl.pallas_call(
        functools.partial(_packed_kernel_stacked, out_dtype=out_dtype),
        out_shape=jax.ShapeDtypeStruct((m_pad, n), out_dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((m_pad, block_k), lambda j, kk, L: (0, kk)),
                pl.BlockSpec(
                    (1, block_k, block_n // 2), lambda j, kk, L: (L[0], kk, j)
                ),
                pl.BlockSpec((1, gk, block_n), lambda j, kk, L: (L[0], kk, j)),
                pl.BlockSpec((1, gk, block_n), lambda j, kk, L: (L[0], kk, j)),
            ],
            out_specs=pl.BlockSpec((m_pad, block_n), lambda j, kk, L: (0, j)),
            scratch_shapes=[pltpu.VMEM((m_pad, block_n), jnp.float32)],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
    )(
        jnp.asarray(layer_idx, jnp.int32).reshape(1),
        x_perm,
        q_packed,
        scales,
        biases,
    )
    return out[:m] if m_pad != m else out


def unpack_nibbles(q_packed, block_n: int = PACK_BLOCK_N):
    """Inverse of :func:`pack_nibbles` (still row-interleaved)."""
    k, n_half = q_packed.shape[-2:]
    n = n_half * 2
    half = block_n // 2
    q = jnp.asarray(q_packed).reshape(*q_packed.shape[:-2], k, n // block_n, half)
    lo = q & 15
    hi = q >> 4
    return jnp.concatenate([lo, hi], axis=-1).reshape(*q_packed.shape[:-2], k, n)


def _kernel(x_ref, q_ref, s_ref, b_ref, o_ref, acc_ref, *, group, out_dtype):
    @pl.when(pl.program_id(1) == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    bk, bn = q_ref.shape
    reps = bk // s_ref.shape[0]
    # Rows are group-interleaved, so tiling the scale block `reps`-fold gives
    # the exact per-row scale matrix (out[r] = s[r mod G]).
    s_full = pltpu.repeat(s_ref[...], reps, 0)
    b_full = pltpu.repeat(b_ref[...], reps, 0)
    w = (q_ref[...].astype(jnp.int32).astype(jnp.float32) * s_full + b_full).astype(
        jnp.bfloat16
    )
    acc_ref[...] += jax.lax.dot_general(
        x_ref[...].astype(jnp.bfloat16),
        w,
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(pl.program_id(1) == pl.num_programs(1) - 1)
    def _store():
        o_ref[...] = acc_ref[...].astype(out_dtype)


@functools.partial(jax.jit, static_argnames=("block_n", "block_k", "out_dtype"))
def quant_matmul_interleaved(
    x_perm, q_perm, scales, biases, *, block_n: int = 1024, block_k: int = BLOCK_K,
    out_dtype=None,
):
    """Core call; expects pre-permuted x (see :func:`permute_activation`)."""
    m, k = x_perm.shape
    kk, n = q_perm.shape
    assert k == kk
    groups = scales.shape[0]
    group = k // groups
    out_dtype = out_dtype or x_perm.dtype

    block_k = min(block_k, k)
    block_n = min(block_n, n)
    if n % block_n != 0:  # fall back to the smaller lane block (e.g. padded
        block_n = 512     # lm_head: 32256 = 63 * 512)
    assert k % block_k == 0 and n % block_n == 0, (k, n, block_n)
    gk = block_k // group

    m_pad = max(8, -(-m // 8) * 8)
    if m_pad != m:
        x_perm = jnp.pad(x_perm, ((0, m_pad - m), (0, 0)))

    grid = (n // block_n, k // block_k)
    out = pl.pallas_call(
        functools.partial(_kernel, group=group, out_dtype=out_dtype),
        out_shape=jax.ShapeDtypeStruct((m_pad, n), out_dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((m_pad, block_k), lambda j, kk: (0, kk)),
            pl.BlockSpec((block_k, block_n), lambda j, kk: (kk, j)),
            pl.BlockSpec((gk, block_n), lambda j, kk: (kk, j)),
            pl.BlockSpec((gk, block_n), lambda j, kk: (kk, j)),
        ],
        out_specs=pl.BlockSpec((m_pad, block_n), lambda j, kk: (0, j)),
        scratch_shapes=[pltpu.VMEM((m_pad, block_n), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
    )(x_perm, q_perm, scales, biases)
    return out[:m] if m_pad != m else out


def quant_matmul(x, q_perm, scales, biases, **kw):
    """x: (M, K) activations (unpermuted); weight in kernel layout."""
    groups = scales.shape[0]
    group = x.shape[-1] // groups
    return quant_matmul_interleaved(
        permute_activation(x, group), q_perm, scales, biases, **kw
    )


# ---------------------------------------------------------------------------
# Tiled-contiguous layout (v2): every DMA is one fully contiguous HBM block
# ---------------------------------------------------------------------------
#
# The flat (K, N//2) payload gives each grid step a (block_k, block_n//2)
# window whose rows are short strided chunks (256 B at the default blocks) —
# measured uniformly ~260 GB/s across all four decode matmuls, well under the
# chip's effective HBM peak.  Storing the payload pre-tiled as
# (K/bk, N/bn, bk, bn//2) makes each payload DMA a single contiguous 128 KiB
# read and each scale DMA a contiguous 8 KiB read.  Same bytes, better DMA.
#
# Symmetric (bias-free) payloads additionally drop the bias plane: dequant is
# ``(v - 8) * s`` and total weight traffic falls ~6%.


def to_tiled_layout(
    q, scales, biases=None, *, block_k: int = BLOCK_K, block_n: int = PACK_BLOCK_N
):
    """Plain (K, N) uint8 payload -> tiled kernel layout.

    Returns ``(q_tiles, s_tiles, b_tiles)``:
      q_tiles: (K/bk, N/bn, bk, bn//2) uint8 — group-interleaved rows, two
        nibbles per byte (column j | column j + bn//2), each tile contiguous.
      s_tiles/b_tiles: (K/bk, N/bn, gk, bn) bf16 (b_tiles None for symmetric).
    """
    k, n = q.shape
    groups = scales.shape[0]
    group = k // groups
    block_k = min(block_k, k)
    gk = block_k // group
    perm = _perm_for(k, group, block_k)
    qp = pack_nibbles(jnp.asarray(q)[perm], block_n)  # (K, N//2)
    bnh = block_n // 2
    q_tiles = qp.reshape(k // block_k, block_k, n // block_n, bnh).swapaxes(1, 2)

    def tile_s(s):
        s4 = jnp.asarray(s).astype(jnp.bfloat16)
        return s4.reshape(k // block_k, gk, n // block_n, block_n).swapaxes(1, 2)

    return (
        q_tiles,
        tile_s(scales),
        None if biases is None else tile_s(biases),
    )


def from_tiled_layout(q_tiles, s_tiles, b_tiles=None):
    """Tiled layout -> plain (K, N) uint8 payload + f32 scales/biases.

    Used by the XLA fallback path (prefill / large-M) and tests.  The block
    sizes are carried by the tile shapes themselves.
    """
    nk, nn, bk, bnh = q_tiles.shape[-4:]
    lead = q_tiles.shape[:-4]
    k = nk * bk
    n = nn * 2 * bnh
    block_n = 2 * bnh
    qp = jnp.swapaxes(q_tiles, -3, -2).reshape(*lead, k, n // 2)
    q_perm = unpack_nibbles(qp, block_n).astype(jnp.uint8)
    gk = s_tiles.shape[-2]
    group = bk // gk

    def untile_s(s):
        return jnp.swapaxes(s, -3, -2).reshape(*lead, k // group, n).astype(jnp.float32)

    perm = _perm_for(k, group, bk)
    inv = np.argsort(perm)
    q_plain = q_perm[..., inv, :]
    return (
        q_plain,
        untile_s(s_tiles),
        None if b_tiles is None else untile_s(b_tiles),
    )


def _tiled_kernel(x_ref, q_ref, s_ref, *rest, out_dtype, symmetric):
    if symmetric:
        o_ref, acc_ref = rest
        b_ref = None
    else:
        b_ref, o_ref, acc_ref = rest

    @pl.when(pl.program_id(1) == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    q_tile = q_ref[0, 0] if q_ref.ndim == 4 else q_ref[0, 0, 0]
    s_tile = s_ref[0, 0] if s_ref.ndim == 4 else s_ref[0, 0, 0]
    bk = q_tile.shape[0]
    bn = s_tile.shape[1]
    half = bn // 2
    reps = bk // s_tile.shape[0]
    v = q_tile.astype(jnp.int32)  # (bk, bn//2)
    s_full = pltpu.repeat(s_tile, reps, 0).astype(jnp.float32)
    if symmetric:
        lo = ((v & 15) - 8).astype(jnp.float32)
        hi = ((v >> 4) - 8).astype(jnp.float32)
        w = jnp.concatenate(
            [lo * s_full[:, :half], hi * s_full[:, half:]], axis=1
        ).astype(jnp.bfloat16)
    else:
        b_tile = b_ref[0, 0] if b_ref.ndim == 4 else b_ref[0, 0, 0]
        lo = (v & 15).astype(jnp.float32)
        hi = (v >> 4).astype(jnp.float32)
        b_full = pltpu.repeat(b_tile, reps, 0).astype(jnp.float32)
        w = jnp.concatenate(
            [
                lo * s_full[:, :half] + b_full[:, :half],
                hi * s_full[:, half:] + b_full[:, half:],
            ],
            axis=1,
        ).astype(jnp.bfloat16)
    acc_ref[...] += jax.lax.dot_general(
        x_ref[...].astype(jnp.bfloat16),
        w,
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(pl.program_id(1) == pl.num_programs(1) - 1)
    def _store():
        o_ref[...] = acc_ref[...].astype(out_dtype)


@functools.partial(jax.jit, static_argnames=("out_dtype", "interpret"))
def quant_matmul_tiled(
    x_perm, q_tiles, s_tiles, b_tiles=None, *, out_dtype=None, interpret=False
):
    """Tiled-layout matmul; expects pre-permuted x (see permute_activation).

    q_tiles: (nk, nn, bk, bn//2) uint8; s/b_tiles: (nk, nn, gk, bn) bf16.
    """
    m, k = x_perm.shape
    nk, nn, bk, bnh = q_tiles.shape
    assert k == nk * bk, (k, q_tiles.shape)
    bn = 2 * bnh
    n = nn * bn
    gk = s_tiles.shape[-2]
    out_dtype = out_dtype or x_perm.dtype
    symmetric = b_tiles is None

    m_pad = max(8, -(-m // 8) * 8)
    if m_pad != m:
        x_perm = jnp.pad(x_perm, ((0, m_pad - m), (0, 0)))

    grid = (nn, nk)
    in_specs = [
        pl.BlockSpec((m_pad, bk), lambda j, kk: (0, kk)),
        pl.BlockSpec((1, 1, bk, bnh), lambda j, kk: (kk, j, 0, 0)),
        pl.BlockSpec((1, 1, gk, bn), lambda j, kk: (kk, j, 0, 0)),
    ]
    args = [x_perm, q_tiles, s_tiles]
    if not symmetric:
        in_specs.append(pl.BlockSpec((1, 1, gk, bn), lambda j, kk: (kk, j, 0, 0)))
        args.append(b_tiles)
    out = pl.pallas_call(
        functools.partial(_tiled_kernel, out_dtype=out_dtype, symmetric=symmetric),
        out_shape=jax.ShapeDtypeStruct((m_pad, n), out_dtype),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((m_pad, bn), lambda j, kk: (0, j)),
        scratch_shapes=[pltpu.VMEM((m_pad, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*args)
    return out[:m] if m_pad != m else out


def _tiled_kernel_stacked(idx_ref, x_ref, q_ref, s_ref, *rest, out_dtype, symmetric):
    del idx_ref  # consumed by the BlockSpec index maps
    _tiled_kernel(x_ref, q_ref, s_ref, *rest, out_dtype=out_dtype, symmetric=symmetric)


@functools.partial(jax.jit, static_argnames=("out_dtype", "interpret"))
def quant_matmul_tiled_stacked(
    x_perm, q_tiles, s_tiles, b_tiles, layer_idx, *, out_dtype=None, interpret=False
):
    """Tiled matmul against layer ``layer_idx`` of stacked weights.

    q_tiles: (nl, nk, nn, bk, bn//2); s/b_tiles: (nl, nk, nn, gk, bn).
    The BlockSpec index map selects the layer in HBM — the decode scan never
    materializes per-layer weight slices.
    """
    m, k = x_perm.shape
    nl, nk, nn, bk, bnh = q_tiles.shape
    assert k == nk * bk
    bn = 2 * bnh
    n = nn * bn
    gk = s_tiles.shape[-2]
    out_dtype = out_dtype or x_perm.dtype
    symmetric = b_tiles is None

    m_pad = max(8, -(-m // 8) * 8)
    if m_pad != m:
        x_perm = jnp.pad(x_perm, ((0, m_pad - m), (0, 0)))

    grid = (nn, nk)
    in_specs = [
        pl.BlockSpec((m_pad, bk), lambda j, kk, L: (0, kk)),
        pl.BlockSpec((1, 1, 1, bk, bnh), lambda j, kk, L: (L[0], kk, j, 0, 0)),
        pl.BlockSpec((1, 1, 1, gk, bn), lambda j, kk, L: (L[0], kk, j, 0, 0)),
    ]
    args = [x_perm, q_tiles, s_tiles]
    if not symmetric:
        in_specs.append(
            pl.BlockSpec((1, 1, 1, gk, bn), lambda j, kk, L: (L[0], kk, j, 0, 0))
        )
        args.append(b_tiles)
    out = pl.pallas_call(
        functools.partial(
            _tiled_kernel_stacked, out_dtype=out_dtype, symmetric=symmetric
        ),
        out_shape=jax.ShapeDtypeStruct((m_pad, n), out_dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=in_specs,
            out_specs=pl.BlockSpec((m_pad, bn), lambda j, kk, L: (0, j)),
            scratch_shapes=[pltpu.VMEM((m_pad, bn), jnp.float32)],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(jnp.asarray(layer_idx, jnp.int32).reshape(1), *args)
    return out[:m] if m_pad != m else out
