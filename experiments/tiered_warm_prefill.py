"""Warm-vs-cold tiered prefill at a given window.

The BENCH_EXTRA tiered rows report the prefill of their own (single) run,
which mixes remote compile + tunnel variance into the number: the same
128K prefill has measured anywhere from 246 s to 1080 s across sessions.
This script separates the two: prefill once (compiles + tunnel warmup),
drop the state, prefill again and time THAT — the steady-state cost a
serving process actually pays per long prompt.

Usage: python experiments/tiered_warm_prefill.py [window]
Writes experiments/tiered_warm_prefill_<W>k.json.
"""

import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

WINDOW = int(sys.argv[1]) if len(sys.argv) > 1 else 131072
HOT = 512
CHUNK = 8192


def main():
    os.environ.setdefault("PHI3V_TPU_ALLOW_RANDOM", "1")
    os.environ.setdefault("BENCH_QUANT_MODE", "affine")
    from bench_extra import _lm
    from phi_3_vision_mlx_tpu.engine.tiered import TieredEngine

    lm, proc = _lm(quantize_cache=True)
    eng = TieredEngine(lm, chunk=CHUNK, hot=HOT)
    prompt_tokens = WINDOW - HOT
    prompt = ("The lighthouse keeper wrote: " + "x" * 50) * (
        prompt_tokens // 79 + 1
    )
    dict_input = proc(prompt[: prompt_tokens - 8])

    results = {"window": WINDOW}
    tok0 = None
    for label in ("cold", "warm"):
        t0 = time.time()
        logits, state = eng.prefill(dict_input)
        dt = time.time() - t0
        tok = int(np.argmax(logits[0]))
        if tok0 is None:
            tok0 = tok
        assert tok == tok0, "prefill must be deterministic"
        results[f"{label}_prefill_s"] = round(dt, 1)
        results[f"{label}_prefill_tps"] = round(dict_input["input_ids"].shape[1] / dt, 1)
        print(json.dumps(results))
        # free the 8-16 GB pinned cold tier before the next prefill
        del state, logits
        gc.collect()

    name = f"tiered_warm_prefill_{WINDOW // 1024}k.json"
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           name), "w") as f:
        json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
