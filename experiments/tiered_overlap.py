"""Where does the tiered cold-stream bandwidth go, and can we overlap it?

ROADMAP r4 roofline: the tiered decode stream achieves ~5-6 GB/s effective
vs the measured ~14 GB/s pinned_host->HBM link.  Candidate explanations:

  (a) the per-layer HOST slice of the (nl, ...) stacked array (scan xs
      lowering) memcpys on one CPU core before the DMA can start;
  (b) the copy serializes with the layer's dequant+attention compute;
  (c) per-transfer fixed overhead (2 transfers x nl x n_chunks per step).

This harness times isolated variants on a configurable window so the fix
lands where the time actually goes:

  raw      - one device_put of the whole stacked cold payload (the link
             ceiling the 12.9-GB scan measured).
  scanslice- jitted scan over layers: device_put(xs slice) + trivial
             reduce.  Isolates (a)+(c) without model compute.
  scanbig  - like scanslice but the per-chunk arrays are first merged
             into ONE (nl, ...) host array per tensor, so each layer
             does 2 transfers instead of 2*n_chunks.  Isolates (c)
             (per-transfer fixed overhead) against scanslice.
  scancomp - scanslice + a realistic per-layer compute proxy (dequant
             + blockwise attention-shaped einsums) SERIAL with the
             copy, today's engine pattern.  (b) = scancomp - scanslice.
  scanpre  - scancomp with one-layer lookahead: xs carries layer i+1's
             host slices (layer axis pre-rolled), the carry holds layer
             i's device copies, so the i+1 copy can overlap the i
             compute.  If scanpre ~= max(scanslice, compute) the engine
             should adopt the rolled-carry pattern; if scanpre ~=
             scancomp, XLA does not overlap and the lever is dead.
  scanfull - the real _tiered_layers decode step (mode A, today's code).

Usage: python experiments/tiered_overlap.py [window] [variants...]
       (default window 32768; variants default to all)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

WINDOW = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() else 32768
PC = int(os.environ.get("OVERLAP_PC", "8192"))
HOT = 256
REPS = 3


def _sharding(kind):
    return jax.sharding.SingleDeviceSharding(jax.devices()[0], memory_kind=kind)


def synth_cold(cfg, n_chunks, b=1, seed=0):
    """Random packed cold tier into pinned_host.

    Placement goes through a jitted identity with host ``out_shardings`` —
    the same mechanism the engine's prefill eviction uses — because an
    EAGER ``device_put(np_array, pinned_host_sharding)`` is not reliably
    honored by every PJRT plugin (a silent device placement makes every
    'stream' below a device-local read and the numbers nonsense).  The
    memory kind is asserted after placement.
    """
    rng = np.random.default_rng(seed)
    nl, kvh, d = cfg.num_hidden_layers, cfg.num_key_value_heads, cfg.head_dim
    g = max(1, d // cfg.kv_quant.group_size)
    host = _sharding("pinned_host")
    to_host = jax.jit(lambda x: x, out_shardings=host)
    cold_k, cold_s = [], []
    for _ in range(n_chunks):
        pay = rng.integers(0, 256, (nl, b, kvh, d, PC), dtype=np.uint8)
        sc = (rng.standard_normal((nl, b, kvh, 4 * g, PC)) * 0.02).astype(
            jnp.bfloat16.dtype)
        cold_k.append(to_host(pay))
        cold_s.append(to_host(sc))
    jax.block_until_ready((cold_k, cold_s))
    for a in (cold_k[0], cold_s[0]):
        assert a.sharding.memory_kind == "pinned_host", a.sharding
    return cold_k, cold_s


def gbytes(cold_k, cold_s):
    return sum(x.size * x.dtype.itemsize for x in cold_k + cold_s) / 1e9


def time_fn(f, reps=REPS):
    f()  # compile + warm
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(f())
        ts.append(time.perf_counter() - t0)
    return min(ts)


def variant_raw(cold_k, cold_s):
    dev = _sharding("device")

    def f():
        return jax.device_put((cold_k, cold_s), dev)

    dt = time_fn(f)
    return dt


def variant_scanslice(cold_k, cold_s):
    """Per-layer slice + copy + trivial reduce, no model compute."""
    dev = _sharding("device")

    @jax.jit
    def f(cold_k, cold_s):
        def body(acc, xs):
            total = acc
            for c, s in zip(xs[0], xs[1]):
                cd = jax.device_put(c, dev)
                sd = jax.device_put(s, dev)
                total = total + jnp.sum(cd, dtype=jnp.int32) + jnp.sum(
                    sd.astype(jnp.float32))
            return total, None

        acc, _ = lax.scan(body, jnp.zeros((), jnp.float32),
                          (tuple(cold_k), tuple(cold_s)))
        return acc

    return time_fn(lambda: f(tuple(cold_k), tuple(cold_s)))


def variant_scanbig(cold_k, cold_s):
    """One merged host array per tensor -> 2 transfers per layer total.
    Same bytes as scanslice; isolates per-transfer fixed overhead (c)."""
    dev = _sharding("device")
    host = _sharding("pinned_host")
    big_k = jax.device_put(
        np.concatenate([np.asarray(c) for c in cold_k], axis=-1), host)
    big_s = jax.device_put(
        np.concatenate([np.asarray(c) for c in cold_s], axis=-1), host)
    jax.block_until_ready((big_k, big_s))

    @jax.jit
    def f(big_k, big_s):
        def body(acc, xs):
            c, s = xs
            cd = jax.device_put(c, dev)
            sd = jax.device_put(s, dev)
            return acc + jnp.sum(cd, dtype=jnp.int32) + jnp.sum(
                sd.astype(jnp.float32)), None

        acc, _ = lax.scan(body, jnp.zeros((), jnp.float32), (big_k, big_s))
        return acc

    return time_fn(lambda: f(big_k, big_s))


def _compute_proxy(cfg, ck_d, cs_d, q, k_block):
    """Per-layer per-chunk work shaped like the real tiered step: packed
    int4 dequant + blockwise attention stats, reduced to a scalar."""
    from phi_3_vision_mlx_tpu.engine.state import LayerKV, read_kv
    from phi_3_vision_mlx_tpu.engine.tiered import (_stats_over, _zero_stats)

    k, v = read_kv(LayerKV(k=ck_d, k_scales=cs_d), jnp.bfloat16, 4)
    b, kvh, pc, d = k.shape
    ok = jnp.ones((b, pc), bool)
    st = _zero_stats(b, kvh, q.shape[2], q.shape[3], d)
    st = _stats_over(q, k, v, ok, d ** -0.5, k_block, st)
    return jnp.sum(st.acc) + jnp.sum(st.l)


def _q_for(cfg):
    kvh, d = cfg.num_key_value_heads, cfg.head_dim
    g = cfg.num_attention_heads // kvh
    return jnp.ones((1, kvh, g, 1, d), jnp.bfloat16)


def variant_scancomp(cfg, cold_k, cold_s, k_block=2048):
    """Copy + realistic compute, serial (today's engine pattern)."""
    dev = _sharding("device")
    q = _q_for(cfg)

    @jax.jit
    def f(cold_k, cold_s):
        def body(acc, xs):
            for c, s in zip(xs[0], xs[1]):
                cd = jax.device_put(c, dev)
                sd = jax.device_put(s, dev)
                acc = acc + _compute_proxy(cfg, cd, sd, q, k_block)
            return acc, None

        acc, _ = lax.scan(body, jnp.zeros((), jnp.float32),
                          (tuple(cold_k), tuple(cold_s)))
        return acc

    return time_fn(lambda: f(tuple(cold_k), tuple(cold_s)))


def variant_scanpre(cfg, cold_k, cold_s, k_block=2048):
    """Copy of layer i+1 starts while layer i computes: the carry holds the
    CURRENT layer's device copies, xs delivers the NEXT layer's host
    slices.  (Synthetic data -> no need to actually roll the layer axis;
    the timing structure is what matters.)"""
    dev = _sharding("device")
    q = _q_for(cfg)
    cur0_k = tuple(jax.device_put(np.asarray(c[0]), dev) for c in cold_k)
    cur0_s = tuple(jax.device_put(np.asarray(c[0]), dev) for c in cold_s)
    jax.block_until_ready((cur0_k, cur0_s))

    @jax.jit
    def f(cold_k, cold_s, cur_k, cur_s):
        def body(carry, xs):
            acc, cur_k, cur_s = carry
            nxt_k = tuple(jax.device_put(c, dev) for c in xs[0])
            nxt_s = tuple(jax.device_put(s, dev) for s in xs[1])
            for cd, sd in zip(cur_k, cur_s):
                acc = acc + _compute_proxy(cfg, cd, sd, q, k_block)
            return (acc, nxt_k, nxt_s), None

        (acc, _, _), _ = lax.scan(
            body, (jnp.zeros((), jnp.float32), cur_k, cur_s),
            (tuple(cold_k), tuple(cold_s)))
        return acc

    return time_fn(lambda: f(tuple(cold_k), tuple(cold_s), cur0_k, cur0_s))


def _engine(window):
    from bench import synth_quantized_params
    from phi_3_vision_mlx_tpu.core.config import QuantConfig, preset
    from phi_3_vision_mlx_tpu.engine.engine import LM
    from phi_3_vision_mlx_tpu.engine.tiered import TieredEngine

    cfg = preset("phi35_mini").replace(
        quantized=QuantConfig(group_size=64, bits=4, mode="affine"),
        use_quantized_cache=True,
    )
    params = synth_quantized_params(cfg, jax.random.PRNGKey(0))
    if jax.default_backend() == "tpu":
        from phi_3_vision_mlx_tpu.core.weights import kernelize_params

        params = kernelize_params(params, cfg)
    jax.block_until_ready(params)
    return TieredEngine(LM(cfg, params), chunk=PC, hot=HOT)


def variant_scanfull(eng, window, n_steps=4):
    from phi_3_vision_mlx_tpu.models.preprocess import Phi3Processor
    from phi_3_vision_mlx_tpu.models.tokenizer import ByteTokenizer

    proc = Phi3Processor(tokenizer=ByteTokenizer())
    prompt = ("streaming test " * 6000)[: window - HOT - 8]
    t0 = time.perf_counter()
    logits, state = eng.prefill(proc(prompt))
    prefill_s = time.perf_counter() - t0
    tok = np.argmax(logits, -1)[:, None].astype(np.int32)

    def f():
        toks, _ = eng.decode_chunk(state, tok, n_steps)
        return toks

    # decode_chunk mutates state.hot.offset; fine for timing (hot stays tiny)
    dt = time_fn(f)
    return dt / n_steps, prefill_s


SYNTH_VARIANTS = ("raw", "scanslice", "scanbig", "scancomp", "scanpre")


def main():
    variants = [v for v in sys.argv[1:] if not v.isdigit()] or [
        "raw", "scanslice", "scanbig", "scancomp", "scanpre", "scanfull"]
    out = {"window": WINDOW, "pc": PC}
    n_chunks = WINDOW // PC

    if any(v in variants for v in SYNTH_VARIANTS):
        from phi_3_vision_mlx_tpu.core.config import QuantConfig, preset

        cfg = preset("phi35_mini").replace(
            quantized=QuantConfig(group_size=64, bits=4, mode="affine"),
            use_quantized_cache=True,
        )
        cold_k, cold_s = synth_cold(cfg, n_chunks)
        gb = gbytes(cold_k, cold_s)
        out["cold_gb"] = round(gb, 2)
        runners = {
            "raw": lambda: variant_raw(cold_k, cold_s),
            "scanslice": lambda: variant_scanslice(cold_k, cold_s),
            "scanbig": lambda: variant_scanbig(cold_k, cold_s),
            "scancomp": lambda: variant_scancomp(cfg, cold_k, cold_s),
            "scanpre": lambda: variant_scanpre(cfg, cold_k, cold_s),
        }
        for name in SYNTH_VARIANTS:
            if name not in variants:
                continue
            try:
                dt = runners[name]()
            except Exception as e:  # keep sweeping; record the failure
                out[f"{name}_error"] = f"{type(e).__name__}: {e}"[:300]
                print(json.dumps({"variant": name,
                                  "error": out[f"{name}_error"]}), flush=True)
                continue
            out[f"{name}_gbps"] = round(gb / dt, 2)
            print(json.dumps({"variant": name, "s": round(dt, 3),
                              "gbps": out[f"{name}_gbps"]}), flush=True)
        del cold_k, cold_s

    if "scanfull" in variants:
        eng = _engine(WINDOW)
        per_step, prefill_s = variant_scanfull(eng, WINDOW)
        out["scanfull_s_per_tok"] = round(per_step, 3)
        out["scanfull_tps"] = round(1.0 / per_step, 3)
        print(json.dumps({"variant": "scanfull",
                          "s_per_tok": round(per_step, 3),
                          "tps": round(1.0 / per_step, 3),
                          "prefill_s": round(prefill_s, 1)}), flush=True)
        del eng

    with open("experiments/tiered_overlap.json", "w") as f:
        json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
