"""Cold-chunk consolidation sweep over one shared 64K prefill.

The r4 group=8 consolidation attempt regressed because the full-chunk
dequant then materialized ~1.6 GB of bf16 k/v per layer; with blockwise
dequant (engine/tiered.py:_stats_over_packed) peak dequant memory is
independent of chunk size, so larger groups should now purely amortize
per-transfer overhead (2 device_puts per GROUP per layer instead of 2 per
8192-token chunk).

Prefills ONCE, then measures decode tok/s at group 1, 2, 4, 8 by repeated
in-place consolidation (each level halves the chunk count).  Optionally a
second k_block at the final level.

Usage: python experiments/tiered_group_sweep.py [window]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

WINDOW = int(sys.argv[1]) if len(sys.argv) > 1 else 65536
HOT = 512
CHUNK = 8192
STEPS = 12
CS = int(os.environ.get("PHI3V_TPU_TIERED_CHUNK", "4"))


def measure(eng, state, tok):
    toks, state = eng.decode_chunk(state, np.array([[tok]], np.int32), CS)
    tok = int(toks[-1, 0])  # warm/compile
    t0 = time.time()
    n = 0
    while n < STEPS:
        toks, state = eng.decode_chunk(state, np.array([[tok]], np.int32), CS)
        tok = int(toks[-1, 0])
        n += CS
    return n / (time.time() - t0), state, tok


def main():
    os.environ.setdefault("PHI3V_TPU_ALLOW_RANDOM", "1")
    from bench_extra import _lm
    from phi_3_vision_mlx_tpu.engine.tiered import TieredEngine

    lm, proc = _lm(quantize_cache=True)
    eng = TieredEngine(lm, chunk=CHUNK, hot=HOT)
    prompt_tokens = WINDOW - HOT
    prompt = ("The lighthouse keeper wrote: " + "x" * 50) * (
        prompt_tokens // 79 + 1
    )
    dict_input = proc(prompt[: prompt_tokens - 8])
    t0 = time.time()
    logits, state = eng.prefill(dict_input)
    prefill_s = time.time() - t0
    tok = int(np.argmax(logits[0]))
    results = {"window": WINDOW, "prefill_s": round(prefill_s, 1)}
    group_total = 1
    while True:
        tps, state, tok = measure(eng, state, tok)
        results[f"group{group_total}_tps"] = round(tps, 3)
        print(json.dumps(results))
        if len(state.cold_k) == 1:
            break
        state = eng.consolidate(state, 2)
        group_total *= 2
    # larger stats block at the final consolidation level
    for kb in (4096, 8192):
        eng_kb = TieredEngine(lm, chunk=CHUNK, hot=HOT, k_block=kb)
        tps, state, tok = measure(eng_kb, state, tok)
        results[f"group{group_total}_kb{kb}_tps"] = round(tps, 3)
        print(json.dumps(results))
    name = f"tiered_group_sweep_{WINDOW // 1024}k.json"
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           name), "w") as f:
        json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
