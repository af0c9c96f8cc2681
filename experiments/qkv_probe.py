"""Bottleneck probe for the quantized-cache decode kernel.

Three variants, same data layout, same wrapper as
ops/kernels/kv_attention.quantized_kv_attention:

  full    - the production kernel (dequant + online softmax)
  convert - dequant replaced by a plain uint8->bf16 convert (no scales DMA,
            no FMA): isolates MXU passes + payload DMA
  mxuonly - convert + NO softmax/mask VPU work (just the two matmuls + max)

If `convert` ~= `full`, the dequant VPU work is NOT the bottleneck and the
kernel is at its structural floor (2 MXU passes per head*layer*128-token
chunk with 8-row queries, plus payload DMA).

Run: python experiments/qkv_probe.py [lmax]
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")
from phi_3_vision_mlx_tpu.ops.kernels import kv_attention as kva

NL, B, KVH, D, G = 32, 1, 32, 96, 3
SCALE = 96.0**-0.5
NEG_INF = kva.NEG_INF


def _probe_kernel(L_ref, off_ref, q_ref, kv_ref, valid_ref, o_ref, m_ref, l_ref,
                  acc_ref, *, blk, g, lq, scale, softmax):
    kv_idx = pl.program_id(2)

    @pl.when(kv_idx == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    payload = kv_ref[0, 0, 0]
    k_t = (payload & 15).astype(jnp.bfloat16)
    q = q_ref[0]
    s = jax.lax.dot_general(q, k_t, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    s *= scale
    if softmax:
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
            jnp.sum(p, axis=1, keepdims=True), l_prev.shape)
        m_ref[...] = m_next
        l_ref[...] = l_next
    else:
        m_ref[...] = jnp.maximum(m_ref[...], jnp.max(s, axis=1, keepdims=True))
        p = s
        alpha = jnp.ones_like(m_ref[...])
    v_t = (payload >> 4).astype(jnp.bfloat16)
    acc_ref[...] = acc_ref[...] * alpha[:, : acc_ref.shape[1]] + jax.lax.dot_general(
        p.astype(v_t.dtype), v_t, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(kv_idx == pl.num_programs(2) - 1)
    def _store():
        l = l_ref[...][:, : acc_ref.shape[1]]
        l = jnp.where(l == 0.0, 1.0, l)
        o_ref[0] = (acc_ref[...] / l).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "block_k", "softmax"))
def probe_attention(q, kv_payload, valid, offset, layer_idx, *, scale,
                    block_k=16384, softmax=True):
    b, h, lq, d = q.shape
    nl, _, kvh, _, lmax = kv_payload.shape
    g = h // kvh
    blk = min(block_k, lmax)
    rows = g * lq
    rows_pad = max(8, -(-rows // 8) * 8)
    qr = q.reshape(b, kvh, g, lq, d).reshape(b * kvh, g * lq, d).astype(jnp.bfloat16)
    if rows_pad != rows:
        qr = jnp.pad(qr, [(0, 0), (0, rows_pad - rows), (0, 0)])
    validr = jnp.repeat(valid.astype(jnp.int32), kvh, axis=0)[:, None, :]
    grid = (b, kvh, lmax // blk)
    out = pl.pallas_call(
        functools.partial(_probe_kernel, blk=blk, g=g, lq=lq, scale=scale,
                          softmax=softmax),
        out_shape=jax.ShapeDtypeStruct((b * kvh, rows_pad, d), q.dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, rows_pad, d),
                             lambda bi, hi, j, L, O: (bi * pl.num_programs(1) + hi, 0, 0)),
                pl.BlockSpec((1, 1, 1, d, blk),
                             lambda bi, hi, j, L, O: (L[0], bi, hi, 0, j)),
                pl.BlockSpec((1, 1, blk),
                             lambda bi, hi, j, L, O: (bi * pl.num_programs(1) + hi, 0, j)),
            ],
            out_specs=pl.BlockSpec(
                (1, rows_pad, d),
                lambda bi, hi, j, L, O: (bi * pl.num_programs(1) + hi, 0, 0)),
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
    )(jnp.asarray(layer_idx, jnp.int32).reshape(1),
      jnp.asarray(offset, jnp.int32).reshape(1), qr, kv_payload, validr)
    return out[:, :rows].reshape(b, kvh, g, lq, d).reshape(b, h, lq, d)


def bench(stepfn, q, *rest, reps=8):
    @jax.jit
    def step(q, *rest):
        def body(c, l):
            o = stepfn(q, *rest, l)
            return c + o.astype(jnp.float32), None
        out, _ = jax.lax.scan(body, jnp.zeros(q.shape, jnp.float32),
                              jnp.arange(NL))
        return out
    out = step(q, *rest)
    jax.device_get(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        qc = (q + (out[0, 0, 0, 0] * 0).astype(q.dtype)).astype(q.dtype)
        out = step(qc, *rest)
    jax.device_get(out)
    return (time.perf_counter() - t0) / reps


def main():
    lmax = int(sys.argv[1]) if len(sys.argv) > 1 else 32768
    import ml_dtypes
    import numpy as np

    rng = np.random.default_rng(0)
    payload = jax.device_put(
        rng.integers(0, 256, (NL, B, KVH, D, lmax), dtype=np.uint8))
    scales = jax.device_put(
        (rng.random((NL, B, KVH, 4 * G, lmax), dtype=np.float32) * 0.02
         ).astype(ml_dtypes.bfloat16))
    q = jax.device_put(
        (rng.standard_normal((B, KVH, 1, D)) * 0.3).astype(ml_dtypes.bfloat16))
    valid = jnp.ones((B, lmax), bool)
    offset = jnp.asarray(lmax - 1, jnp.int32)

    dt = bench(functools.partial(kva.quantized_kv_attention, scale=SCALE),
               q, payload, scales, valid, offset)
    pb = payload.nbytes + scales.nbytes
    print(f"full     {dt*1e3:8.2f} ms  {pb/dt/1e9:6.1f} GB/s", flush=True)

    dt = bench(functools.partial(probe_attention, scale=SCALE, softmax=True),
               q, payload, valid, offset)
    print(f"convert  {dt*1e3:8.2f} ms  {payload.nbytes/dt/1e9:6.1f} GB/s", flush=True)

    dt = bench(functools.partial(probe_attention, scale=SCALE, softmax=False),
               q, payload, valid, offset)
    print(f"mxuonly  {dt*1e3:8.2f} ms  {payload.nbytes/dt/1e9:6.1f} GB/s", flush=True)


if __name__ == "__main__":
    main()
