"""W4A8 experiment (VERDICT r2 item 9): int8-MXU dequant-matmul vs the
production bf16-MXU tiled path at decode batch sizes M=1..16.

Question: the decode hot matmul is HBM-bound on the int4 payload; the
production kernel dequantizes tiles to bf16 in VMEM and feeds the bf16 MXU.
Would quantizing activations to int8 and using the int8 MXU (2x peak) help?

Analysis said no (the MXU is idle either way at M<=16; the payload DMA is the
clock), but the judge asked for data.  This kernel implements the honest
W4A8 contraction for the symmetric tiled layout:

    y[m, n] = sx[m] * sum_g s[g, n] * (x_q[m, kg] @ (q[kg, n] - 8))

i.e. a per-group int8->int32 batched matmul (batch dim = quant group) with
fp32 group-scale accumulation — the per-(group, n) weight scale cannot be
factored out of a single big matmul, so int8 necessarily fragments the K
reduction into group-sized (64) segments.

Run on the chip:  python experiments/w4a8_bench.py
Writes a markdown table to stdout; results recorded in ROADMAP.md.
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")

from phi_3_vision_mlx_tpu.ops.kernels.quant_matmul import (  # noqa: E402
    permute_activation,
    quant_matmul_tiled,
    to_tiled_layout,
)


def _w4a8_kernel(x_ref, sx_ref, q_ref, s_ref, o_ref, acc_ref):
    """Grid (nn, n_groups): one quant group per sequential step — the
    per-(group, n) weight scale forces the int8 contraction to fragment K
    into group-sized (64) MXU calls; that fragmentation is exactly W4A8's
    structural cost and lives on the grid, not in unsupported i8 reshapes."""

    @pl.when(pl.program_id(1) == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    v = q_ref[0, 0].astype(jnp.int32)  # (group, bn//2) nibble pair
    lo = ((v & 15) - 8).astype(jnp.int8)
    hi = ((v >> 4) - 8).astype(jnp.int8)
    w8 = jnp.concatenate([lo, hi], axis=1)  # (group, bn)
    part = jax.lax.dot_general(
        x_ref[0], w8, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )  # (m, bn)
    sf = s_ref[0, 0].astype(jnp.float32)  # (1, bn)
    acc_ref[...] += part.astype(jnp.float32) * sf

    @pl.when(pl.program_id(1) == pl.num_programs(1) - 1)
    def _store():
        o_ref[...] = acc_ref[...] * sx_ref[...].astype(jnp.float32)


def w4a8_layout(q: np.ndarray, scales: np.ndarray, bn: int):
    """Contiguous-group nibble-packed layout for the W4A8 kernel: payload
    (n_groups, nn, group, bn//2) uint8 (columns j | j + bn//2 per n-block,
    natural column order after the kernel's concat), scales
    (n_groups, nn, 1, bn) f32.  Same bytes/element as the production tiled
    layout — the HBM traffic term of the A/B is identical."""
    k, n = q.shape
    n_groups = scales.shape[0]
    group = k // n_groups
    nn = n // bn
    bnh = bn // 2
    q4 = q.reshape(n_groups, group, nn, bn)
    packed = (q4[..., :bnh] | (q4[..., bnh:] << 4)).astype(np.uint8)
    packed = packed.transpose(0, 2, 1, 3)  # (n_groups, nn, group, bnh)
    s4 = scales.reshape(n_groups, 1, nn, bn).transpose(0, 2, 1, 3)
    return jnp.asarray(packed), jnp.asarray(s4.astype(np.float32))


@functools.partial(jax.jit, static_argnames=("interpret",))
def w4a8_matmul(x, q_g, s_g, *, interpret=False):
    """x (M, K) fp (natural K order) -> per-row int8 quantization on the fly,
    then the W4A8 Pallas contraction."""
    m, k = x.shape
    n_groups, nn, group, bnh = q_g.shape
    bn = 2 * bnh
    # A8: per-row absmax int8 activation quantization (fused XLA prologue).
    sx = jnp.max(jnp.abs(x), axis=1, keepdims=True) / 127.0
    sx = jnp.where(sx == 0, 1.0, sx).astype(jnp.float32)
    x8 = jnp.clip(
        jnp.round(x.astype(jnp.float32) / sx), -127, 127
    ).astype(jnp.int8)
    m_pad = max(8, -(-m // 8) * 8)
    if m_pad != m:
        x8 = jnp.pad(x8, ((0, m_pad - m), (0, 0)))
        sx = jnp.pad(sx, ((0, m_pad - m), (0, 0)))
    # Group-major activation layout: a (1, m, group) block's minor dim equals
    # the full array minor, satisfying Mosaic's lane-dim block rule.
    x8g = x8.reshape(m_pad, n_groups, group).transpose(1, 0, 2)
    out = pl.pallas_call(
        _w4a8_kernel,
        out_shape=jax.ShapeDtypeStruct((m_pad, nn * bn), jnp.float32),
        grid=(nn, n_groups),
        in_specs=[
            pl.BlockSpec((1, m_pad, group), lambda j, gg: (gg, 0, 0)),
            pl.BlockSpec((m_pad, 1), lambda j, gg: (0, 0)),
            pl.BlockSpec((1, 1, group, bnh), lambda j, gg: (gg, j, 0, 0)),
            pl.BlockSpec((1, 1, 1, bn), lambda j, gg: (gg, j, 0, 0)),
        ],
        out_specs=pl.BlockSpec((m_pad, bn), lambda j, gg: (0, j)),
        scratch_shapes=[pltpu.VMEM((m_pad, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(x8g, sx, q_g, s_g)
    return out[:m]


def _chained(fn, iters):
    """One jitted program that runs ``fn`` ``iters`` times with a data-
    dependency chain (each output perturbs the next input, so XLA cannot
    hoist or dedup) and returns a scalar.  Per-dispatch tunnel latency here
    is ~25-45 ms — larger than the kernel itself — so single calls measure
    the tunnel, not the kernel; the chain amortizes one dispatch over
    ``iters`` kernel executions."""

    @jax.jit
    def run(x):
        def body(carry, _):
            y = fn(carry)
            carry = carry + y[:, : carry.shape[1]].astype(carry.dtype) * 1e-6
            return carry, ()

        c, _ = jax.lax.scan(body, x, None, length=iters)
        return jnp.sum(c)

    return run


def _time(fn, x, iters=64, base=8):
    """Per-kernel-call ms: (t[iters] - t[base]) / (iters - base) cancels the
    dispatch/fetch overhead shared by both chained programs."""

    seq = iter(range(1, 10))

    def once(run):
        float(run(x))  # compile + sync
        x2 = x * (1.0 + 1e-3 * next(seq))  # distinct input: dodge memoization
        t0 = time.perf_counter()
        float(run(x2))
        return time.perf_counter() - t0

    t_long = once(_chained(fn, iters))
    t_short = once(_chained(fn, base))
    return 1e3 * (t_long - t_short) / (iters - base)


def main():
    rng = np.random.default_rng(0)
    interpret_only = jax.default_backend() != "tpu"
    # gate_up_proj shape, the decode heavy-hitter (tiny in CPU interpret mode)
    K, N, group = (512, 512, 64) if interpret_only else (3072, 9216, 64)
    q = rng.integers(0, 16, (K, N)).astype(np.uint8)
    scales = (rng.standard_normal((K // group, N)).astype(np.float32) * 0.01)
    qp, st, _ = to_tiled_layout(jnp.asarray(q), jnp.asarray(scales), None)
    bn = 2 * qp.shape[-1]
    q8, s8 = w4a8_layout(q, scales, bn)
    interpret = interpret_only

    # correctness first (tiny M, interpret tolerant)
    x = jnp.asarray(rng.standard_normal((4, K)), jnp.bfloat16)
    xp = permute_activation(x, group)
    y_bf16 = quant_matmul_tiled(xp, qp, st, interpret=interpret)
    y_w4a8 = w4a8_matmul(x, q8, s8, interpret=interpret)
    ref = np.asarray(y_bf16, np.float32)
    got = np.asarray(y_w4a8, np.float32)
    denom = np.abs(ref).mean() + 1e-6
    rel = np.abs(got - ref).mean() / denom
    print(f"# W4A8 vs bf16-MXU tiled  (K={K}, N={N}, g={group})")
    print(f"mean |Δ|/|y| vs bf16 path: {rel:.4f}  (int8 activation error)")
    assert rel < 0.05, "w4a8 kernel is numerically wrong, not just quantized"

    if interpret:
        print("(CPU interpret mode: correctness only, no timing)")
        return
    print("| M | bf16-MXU ms | W4A8 int8-MXU ms | ratio |")
    print("|---|---|---|---|")
    for m in (1, 2, 4, 8, 16, 64, 256):
        x = jnp.asarray(rng.standard_normal((m, K)), jnp.bfloat16)
        xp = permute_activation(x, group)
        t_b = _time(lambda a: quant_matmul_tiled(a, qp, st), xp)
        t_8 = _time(lambda a: w4a8_matmul(a, q8, s8), x)
        print(f"| {m} | {t_b:.3f} | {t_8:.3f} | {t_8 / t_b:.2f}x |")


if __name__ == "__main__":
    main()
