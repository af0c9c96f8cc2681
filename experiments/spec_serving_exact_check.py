"""On-chip exactness + cost check for UNIFORM spec-serving dispatch.

VERDICT r4 item 7: slot-engine speculation on TPU with the int4-quantized
cache could drift from the lq=1 vanilla engine at argmax near-ties (XLA
tiles fp reductions differently for (S,1,E) vs (S,K+1,E) dispatches).  The
uniform-dispatch mode (engine/batching.py:_spec_decode_chunk, spec_ok=)
gives every chunk ONE compiled (S,K+1) shape; this script verifies, at full
model size on the real chip, that

  (A) the accepting engine (spec_k=K, uniform)       — the production mode
  (B) the forced-reject engine (spec_accept=False)   — padded vanilla: one
      token per pass through the same compiled fn

emit BIT-IDENTICAL greedy streams over the quantized cache (the in-pass
accepted rows vs later row-0 computations — the row-position-invariance
claim), and measures against

  (C) the legacy lq=1 vanilla engine                 — the old baseline,
      expected to drift at near-ties (the documented noise class)

plus the COST of uniformity: forced-reject pass rate vs lq=1 chunk rate
(both at 1 token per weight pass — the worst case for the padded shape).

Writes experiments/spec_serving_exact_check.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("PHI3V_TPU_ALLOW_RANDOM", "1")
os.environ.setdefault("BENCH_QUANT_MODE", "affine")

SLOTS = 4
WINDOW = 1024
SPEC_K = 7
MAX_TOKENS = 96
N_STEPS = 8

PROMPTS = [
    "The lighthouse keeper wrote in the log: storm rising over the",
    "def fibonacci(n):\n    if n < 2:\n        return n\n    return",
    "tick tock tick tock tick tock tick tock",
    "In the beginning the universe was created. This has made a lot",
]


def run(eng, prompts, max_tokens):
    rids = [eng.submit(p, max_tokens=max_tokens) for p in prompts]
    t0 = time.time()
    n_chunks = 0
    while eng.pending():
        eng.step(N_STEPS)
        n_chunks += 1
        if n_chunks > 2000:
            raise RuntimeError("engine did not drain")
    dt = time.time() - t0
    streams = [eng.tokens(r) for r in rids]
    total = sum(len(s) for s in streams)
    return streams, total / dt, dict(eng.spec_stats)


def mismatch_stats(a, b):
    per = []
    for sa, sb in zip(a, b):
        n = min(len(sa), len(sb))
        first = next((i for i in range(n) if sa[i] != sb[i]), None)
        per.append({"len_a": len(sa), "len_b": len(sb), "first_diff": first})
    return per


def main():
    from bench_extra import _lm
    from phi_3_vision_mlx_tpu.engine.batching import BatchEngine

    lm, proc = _lm(quantize_cache=True)
    mk = lambda **kw: BatchEngine(lm, proc, slots=SLOTS, window=WINDOW, **kw)

    out = {"slots": SLOTS, "window": WINDOW, "spec_k": SPEC_K,
           "max_tokens": MAX_TOKENS, "backend": None}
    import jax

    out["backend"] = jax.default_backend()

    # (C) legacy lq=1 vanilla — also the timing baseline (warm a rep first)
    run(mk(), PROMPTS[:1], 16)
    c_streams, c_tps, _ = run(mk(), PROMPTS, MAX_TOKENS)
    c_streams2, c_tps2, _ = run(mk(), PROMPTS, MAX_TOKENS)
    assert c_streams == c_streams2, "vanilla engine must be deterministic"
    out["vanilla_lq1_tps"] = round(max(c_tps, c_tps2), 2)

    # (B) forced-reject padded vanilla
    b_streams, b_tps, b_stats = run(
        mk(spec_k=SPEC_K, spec_accept=False), PROMPTS, MAX_TOKENS
    )
    _, b_tps2, _ = run(mk(spec_k=SPEC_K, spec_accept=False), PROMPTS,
                       MAX_TOKENS)
    out["forced_reject_tps"] = round(max(b_tps, b_tps2), 2)
    out["forced_reject_stats"] = b_stats
    out["uniform_overhead_vs_lq1"] = round(
        out["forced_reject_tps"] / out["vanilla_lq1_tps"], 3
    )

    # (A) accepting uniform spec
    a_streams, a_tps, a_stats = run(
        mk(spec_k=SPEC_K), PROMPTS, MAX_TOKENS
    )
    out["uniform_spec_tps"] = round(a_tps, 2)
    out["uniform_spec_stats"] = a_stats

    out["spec_vs_forced"] = mismatch_stats(a_streams, b_streams)
    out["spec_vs_lq1"] = mismatch_stats(a_streams, c_streams)
    out["spec_equals_forced"] = a_streams == b_streams
    out["forced_equals_lq1"] = b_streams == c_streams

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "spec_serving_exact_check.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
