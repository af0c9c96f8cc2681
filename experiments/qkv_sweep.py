"""Tile sweep + variant bench for the quantized-cache decode kernel.

The r4 roofline shows quantized-cache decode at 65-78% of HBM bandwidth for
32K-48K windows (ROADMAP.md).  Hypothesis: the in-kernel dequant is VPU
elementwise work of O(d*blk) per block — comparable to the block's DMA time —
so the kernel is compute-limited, not bandwidth-limited.  This script
measures, on the real chip:

  1. blk sweep for `quantized_kv_attention` (the knob was previously dead at
     large Lmax — fixed alongside this script),
  2. the folded-scale kernel variant (scales folded into per-group matmuls,
     no materialized dequantized K/V) if present.

Run:  python experiments/qkv_sweep.py [lmax ...]
Writes experiments/qkv_sweep.json.
"""

import functools
import json
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from phi_3_vision_mlx_tpu.ops.kernels import kv_attention as kva

NL, B, KVH, D, G = 32, 1, 32, 96, 3
SCALE = 96.0**-0.5


def make_cache(lmax, seed=0):
    import ml_dtypes
    import numpy as np

    rng = np.random.default_rng(seed)
    payload = jax.device_put(
        rng.integers(0, 256, (NL, B, KVH, D, lmax), dtype=np.uint8))
    scales = jax.device_put(
        (rng.random((NL, B, KVH, 4 * G, lmax), dtype=np.float32) * 0.02
         ).astype(ml_dtypes.bfloat16))
    q = jax.device_put(
        (rng.standard_normal((B, KVH, 1, D)) * 0.3
         ).astype(ml_dtypes.bfloat16))
    valid = jnp.ones((B, lmax), bool)
    return payload, scales, q, valid


def bench(fn, q, payload, scales, valid, offset, reps=8):
    """Time NL sequential kernel calls (one full decode step's attention).

    The axon tunnel does not reliably block on repeated IDENTICAL dispatches
    (block_until_ready can return early), so each timed call is chained on
    the previous result (data dependency → no dedup, no overlap ambiguity)
    and the loop is closed with a device_get.
    """

    @jax.jit
    def step(q, payload, scales, valid, offset):
        def body(c, l):
            o = fn(q, payload, scales, valid, offset, l)
            return c + o.astype(jnp.float32), None

        out, _ = jax.lax.scan(body, jnp.zeros(q.shape, jnp.float32), jnp.arange(NL))
        return out

    out = step(q, payload, scales, valid, offset)
    jax.device_get(out)  # real call: fills the dispatch cache (AOT doesn't)
    first = out
    t0 = time.perf_counter()
    for _ in range(reps):
        qc = (q + (out[0, 0, 0, 0] * 0).astype(q.dtype)).astype(q.dtype)
        out = step(qc, payload, scales, valid, offset)
    jax.device_get(out)
    dt = (time.perf_counter() - t0) / reps
    return dt, first


def main():
    lmaxes = [int(a) for a in sys.argv[1:]] or [32768]
    rows = []
    for lmax in lmaxes:
        payload, scales, q, valid = make_cache(lmax)
        offset = jnp.asarray(lmax - 1, jnp.int32)
        bytes_step = payload.nbytes + scales.nbytes  # one full window read
        ref_out = None
        for name, fn in [
            ("base_blk", None),
            ("folded", getattr(kva, "quantized_kv_attention_folded", None)),
        ]:
            if name == "base_blk":
                for blk in (2048, 4096, 8192, 16384, 32768):
                    if lmax % blk or blk > lmax:
                        continue
                    f = functools.partial(
                        kva.quantized_kv_attention, scale=SCALE, block_k=blk
                    )
                    dt, out = bench(f, q, payload, scales, valid, offset)
                    if ref_out is None:
                        ref_out = out
                    err = float(jnp.max(jnp.abs(out - ref_out)))
                    gbs = bytes_step / dt / 1e9
                    rows.append(
                        dict(kernel="base", lmax=lmax, blk=blk,
                             ms=round(dt * 1e3, 3), gbs=round(gbs, 1),
                             max_abs_err=err)
                    )
                    print(rows[-1], flush=True)
            elif fn is not None:
                for blk in (4096, 8192, 16384, 32768):
                    if lmax % blk or blk > lmax:
                        continue
                    f = functools.partial(fn, scale=SCALE, block_k=blk)
                    dt, out = bench(f, q, payload, scales, valid, offset)
                    err = float(jnp.max(jnp.abs(out - ref_out)))
                    gbs = bytes_step / dt / 1e9
                    rows.append(
                        dict(kernel=name, lmax=lmax, blk=blk,
                             ms=round(dt * 1e3, 3), gbs=round(gbs, 1),
                             max_abs_err=err)
                    )
                    print(rows[-1], flush=True)
        del payload, scales
    with open("/root/repo/experiments/qkv_sweep.json", "w") as f:
        json.dump(rows, f, indent=1)


if __name__ == "__main__":
    main()
