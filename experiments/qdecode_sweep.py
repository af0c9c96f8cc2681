"""Sweep dequant arithmetic + block size for the quantized decode-attention
kernel at long windows (32K/48K), where BENCH_EXTRA sits at ~65-78% of the
HBM roofline (ROADMAP round-4 roofline table).

Hypothesis: the kernel is VPU-bound, not DMA-bound, at these windows — the
fp32 dequant does uint8->int32->fp32 multiply-add over (d, blk) twice per
block (k and v planes), ~6 vector passes per plane.  Per 16K block that is
~19M vector ops vs ~4.6us of DMA; the two are within 10% of each other, so
any serialization shows up as lost bandwidth.  Variants:

  fp32  — current production kernel (baseline).
  bf16  — dequant multiply-add in bf16 (int4 values 0..15 are exact in bf16;
          scales/biases are stored bf16 already, so the only change is the
          rounding of the intermediate product).
  u8    — nibble extraction on the uint8 payload itself (no int32
          expansion), then a direct uint8->bf16 convert.

Run on the real chip:  python experiments/qdecode_sweep.py
Writes experiments/qdecode_sweep.json.
"""

import functools
import json
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -0.7 * float(jnp.finfo(jnp.float32).max)


def _kernel(
    L_ref, off_ref, q_ref, kv_ref, sc_ref, valid_ref, o_ref,
    m_ref, l_ref, acc_ref, *, blk, g, lq, scale, mode,
):
    kv_idx = pl.program_id(2)

    @pl.when(kv_idx == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    groups = sc_ref.shape[-2] // 4
    sc = sc_ref[0, 0, 0]

    if mode == "mxu":
        # q_ref here is (1, rows*G, d+8): Q3[r*G+g, :d] = q[r]·(dim%G==g),
        # column d holds qs[r,g] = sum of q[r] over group-g dims.
        rows3, dq = q_ref.shape[-2:]
        d = dq - 8
        rows = rows3 // groups
        payload = kv_ref[0, 0, 0].astype(jnp.int32)
        k4 = (payload & 15).astype(jnp.bfloat16)  # (d, blk) — NO scale pass
        v4 = (payload >> 4).astype(jnp.bfloat16)
        q3 = q_ref[0][:, :d]  # (rows*G, d) bf16
        qs = q_ref[0][:, d : d + 1].astype(jnp.float32)  # (rows*G, 1)
        a = jax.lax.dot_general(
            q3, k4, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (rows*G, blk): a[r*G+g] = q_g . k4
        sfr = pltpu.repeat(sc[:groups], rows, 0).astype(jnp.float32)
        bfr = pltpu.repeat(sc[groups : 2 * groups], rows, 0).astype(jnp.float32)
        c = a * sfr + qs * bfr  # scale applied on (rows*G, blk), not (d, blk)
        s = c.reshape(rows, groups, blk).sum(axis=1) * scale
    else:
        d = q_ref.shape[-1]
        reps = d // groups
        payload = kv_ref[0, 0, 0].astype(jnp.int32)
        if mode == "bf16":

            def dequant(qp, scs, bis):
                sf = pltpu.repeat(scs, reps, 0)
                bf = pltpu.repeat(bis, reps, 0)
                return qp.astype(jnp.bfloat16) * sf + bf

        elif mode == "noscale":
            # DIAGNOSTIC (wrong numerics): skip the scale/bias application
            # entirely — isolates DMA + nibble extraction + conversion + dots.
            def dequant(qp, scs, bis):
                return qp.astype(jnp.float32).astype(jnp.bfloat16)

        elif mode == "nomul":
            # DIAGNOSTIC (wrong numerics): repeat but no multiply-add.
            def dequant(qp, scs, bis):
                sf = pltpu.repeat(scs, reps, 0).astype(jnp.float32)
                return (qp.astype(jnp.float32) + sf).astype(jnp.bfloat16)

        elif mode == "fbias":
            # Factored bias: q.(p4*sf + bf_rep) == q.(p4*sf) + sum_g qs_g*bf_g
            # — only ONE repeat+mul pass per plane on (d, blk); the bias
            # terms are added on (rows, blk)/(rows, d) tiles below.
            def dequant(qp, scs, bis):
                sf = pltpu.repeat(scs, reps, 0).astype(jnp.float32)
                return (qp.astype(jnp.float32) * sf).astype(jnp.bfloat16)

        else:  # fp32 — production

            def dequant(qp, scs, bis):
                sf = pltpu.repeat(scs, reps, 0).astype(jnp.float32)
                bf = pltpu.repeat(bis, reps, 0).astype(jnp.float32)
                return (qp.astype(jnp.float32) * sf + bf).astype(jnp.bfloat16)

        k4 = payload & 15
        v4 = payload >> 4
        k_t = dequant(k4, sc[:groups], sc[groups : 2 * groups])
        q = q_ref[0]
        s = jax.lax.dot_general(
            q, k_t, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        if mode == "fbias":
            qf = q.astype(jnp.float32)
            rows = s.shape[0]
            dio_q = jax.lax.broadcasted_iota(jnp.int32, (rows, d), 1) % groups
            bfk = sc[groups : 2 * groups].astype(jnp.float32)
            for gg in range(groups):
                qs_g = jnp.sum(
                    jnp.where(dio_q == gg, qf, 0.0), axis=1, keepdims=True
                )
                s = s + qs_g * bfk[gg : gg + 1, :]
        s *= scale
        rows = s.shape[0]

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
    if mode == "mxu":
        sfv = sc[2 * groups : 3 * groups]  # (G, blk)
        bfv = sc[3 * groups :]
        p3 = jnp.broadcast_to(p[:, None, :], (rows, groups, blk)).reshape(
            rows * groups, blk
        )
        pw = p3 * pltpu.repeat(sfv, rows, 0).astype(jnp.float32)
        o3 = jax.lax.dot_general(
            pw.astype(jnp.bfloat16), v4, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (rows*G, d): row r*G+g = scale-g-weighted p . v4
        d_iota = jax.lax.broadcasted_iota(jnp.int32, o3.shape, 1)
        g_iota = jax.lax.broadcasted_iota(jnp.int32, o3.shape, 0) % groups
        o_sel = jnp.where(d_iota % groups == g_iota, o3, 0.0)
        upd = o_sel.reshape(rows, groups, d).sum(axis=1)
        pb = jax.lax.dot_general(
            p.astype(jnp.bfloat16), bfv, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (rows, G)
        db_iota = jax.lax.broadcasted_iota(jnp.int32, (rows, d), 1) % groups
        for gg in range(groups):
            upd = upd + jnp.where(db_iota == gg, pb[:, gg : gg + 1], 0.0)
        acc_ref[...] = acc_ref[...] * alpha[:, : acc_ref.shape[1]] + upd
    else:
        v_t = dequant(v4, sc[2 * groups : 3 * groups], sc[3 * groups :])
        upd = jax.lax.dot_general(
            p.astype(v_t.dtype), v_t, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if mode == "fbias":
            # p.(p4v*sfv + bfv_rep)^T == p.(p4v*sfv)^T + pb[r, d%G] where
            # pb = p . bfv^T (rows, G) — bias applied on (rows, d).
            bfv = sc[3 * groups :]
            pb = jax.lax.dot_general(
                p.astype(jnp.bfloat16), bfv, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (rows, G)
            dio = jax.lax.broadcasted_iota(
                jnp.int32, upd.shape, 1
            ) % groups
            for gg in range(groups):
                upd = upd + jnp.where(dio == gg, pb[:, gg : gg + 1], 0.0)
        acc_ref[...] = acc_ref[...] * alpha[:, : acc_ref.shape[1]] + upd

    @pl.when(kv_idx == pl.num_programs(2) - 1)
    def _store():
        l = l_ref[...][:, : acc_ref.shape[1]]
        l = jnp.where(l == 0.0, 1.0, l)
        o_ref[0] = (acc_ref[...] / l).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "block_k", "mode"))
def qkv_attn(q, kv_payload, kv_scales, valid, offset, layer_idx, *,
             scale, block_k, mode):
    b, h, lq, d = q.shape
    nl, _, kvh, _, lmax = kv_payload.shape
    g = h // kvh
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
    if mode == "mxu":
        groups = gq4 // 4
        dd = jnp.arange(d)
        gsel = (dd[None, :] % groups == jnp.arange(groups)[:, None]).astype(
            qr.dtype
        )  # (G, d)
        # Q3[:, r*G+g, :] = qr[:, r, :] * gsel[g]; qs = per-group row sums
        q3 = (qr[:, :, None, :] * gsel[None, None]).reshape(
            qr.shape[0], rows_pad * groups, d
        )
        qs = q3.sum(-1, keepdims=True)  # (bk, rows*G, 1)
        qr = jnp.concatenate(
            [q3, qs, jnp.zeros((qr.shape[0], rows_pad * groups, 7), qr.dtype)],
            axis=-1,
        )  # (bk, rows*G, d+8)
    validr = jnp.repeat(valid.astype(jnp.int32), kvh, axis=0)[:, None, :]
    grid = (b, kvh, lmax // blk)
    out = pl.pallas_call(
        functools.partial(_kernel, blk=blk, g=g, lq=lq, scale=scale, mode=mode),
        out_shape=jax.ShapeDtypeStruct((b * kvh, rows_pad, d), q.dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1,) + tuple(qr.shape[-2:]),
                             lambda bi, hi, j, L, O: (bi * pl.num_programs(1) + hi, 0, 0)),
                pl.BlockSpec((1, 1, 1, d, blk),
                             lambda bi, hi, j, L, O: (L[0], bi, hi, 0, j)),
                pl.BlockSpec((1, 1, 1, gq4, blk),
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
    )(
        jnp.asarray(layer_idx, jnp.int32).reshape(1),
        jnp.asarray(offset, jnp.int32).reshape(1),
        qr, kv_payload, kv_scales, validr,
    )
    return out[:, :rows].reshape(b, kvh, g, lq, d).reshape(b, h, lq, d)


def main():
    nl, b, kvh, h, d, g32 = 32, 1, 32, 32, 96, 3  # Phi-3.5-mini, G=3 (gs=32)
    lmax = int(__import__("os").environ.get("QD_LMAX", "32768"))
    key = jax.random.PRNGKey(0)
    kv_payload = jax.random.randint(key, (nl, b, kvh, d, lmax), 0, 256, jnp.int32).astype(jnp.uint8)
    kv_scales = (0.01 * jax.random.normal(key, (nl, b, kvh, 4 * g32, lmax))).astype(jnp.bfloat16)
    valid = jnp.ones((b, lmax), jnp.bool_)
    q = jax.random.normal(key, (b, h, 1, d), jnp.bfloat16)
    scale = 1.0 / np.sqrt(d)

    # All nl layer calls inside ONE jitted function (as production's scanned
    # decode step does) — per-dispatch tunnel RTT otherwise swamps the
    # kernel time at ~4.5 ms per call.
    @functools.partial(jax.jit, static_argnames=("block_k", "mode"))
    def step(q, kv_payload, kv_scales, valid, offset, *, block_k, mode):
        def body(layer, acc):
            o = qkv_attn(q, kv_payload, kv_scales, valid, offset, layer,
                         scale=scale, block_k=block_k, mode=mode)
            return acc + o.astype(jnp.float32)
        return jax.lax.fori_loop(0, nl, body, jnp.zeros(q.shape, jnp.float32))

    results = {}
    # Error baseline: ALWAYS the fp32 production numerics, regardless of the
    # QD_MODES ordering — a deliberately-wrong diagnostic mode (noscale/nomul)
    # listed first must not become the reference (ADVICE r4).
    ref = np.asarray(
        step(q, kv_payload, kv_scales, valid, lmax - 1, block_k=16384,
             mode="fp32"),
        np.float32,
    )
    import os as _os
    modes = tuple(
        _os.environ.get("QD_MODES", "fp32,mxu").split(",")
    )
    for mode in modes:
        for blk in (16384, 8192):
            name = f"{mode}/blk{blk}"
            try:
                out = step(q, kv_payload, kv_scales, valid, lmax - 1,
                           block_k=blk, mode=mode)
                out.block_until_ready()
            except Exception as e:  # noqa: BLE001
                results[name] = {"error": str(e)[:200]}
                print(name, "FAILED", str(e)[:200])
                continue
            err = float(np.max(np.abs(np.asarray(out, np.float32) - ref)))
            t0 = time.perf_counter()
            iters = 20
            for _ in range(iters):
                outs = step(q, kv_payload, kv_scales, valid, lmax - 1,
                            block_k=blk, mode=mode)
            outs.block_until_ready()
            dt = (time.perf_counter() - t0) / iters
            # payload + bf16 scales, per batch row and kv head (ADVICE r4:
            # the b/kvh factors were previously omitted, understating HBM
            # traffic ~32x)
            bytes_moved = nl * b * kvh * (d + 8 * g32) * lmax
            gbps = bytes_moved / dt / 1e9
            results[name] = {"step_ms": dt * 1e3, "GBps": gbps, "max_err": err}
            print(f"{name}: {dt*1e3:.2f} ms/step  {gbps:.0f} GB/s  err={err}")

    with open("experiments/qdecode_sweep.json", "w") as f:
        json.dump({"lmax": lmax, "results": results}, f, indent=2)


if __name__ == "__main__":
    main()
