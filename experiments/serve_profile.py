"""Profile the slot-engine decode chunk: device step time vs host overhead.

Decomposes the serving aggregate (bench_extra.serve) into:
  - per-step device time of the compiled chunk (all slots active)
  - host-side submit/adopt overhead
Run on the TPU fraction: python experiments/serve_profile.py
"""
import os
import sys
import time

os.environ.setdefault("BENCH_QUANT_MODE", "affine")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from bench_extra import _lm
from phi_3_vision_mlx_tpu.engine.batching import BatchEngine


def main():
    lm, proc = _lm()
    slots = int(os.environ.get("BENCH_SLOT_COUNT", "4"))
    window = int(os.environ.get("BENCH_WINDOW", "512"))
    chunk = int(os.environ.get("BENCH_SLOT_CHUNK", "32"))
    eng = BatchEngine(lm, proc, slots=slots, window=window)

    # Fill every slot with a long-budget request so all slots stay active.
    for i in range(slots):
        eng.submit(f"profile request {i}", max_tokens=10_000)

    # Warm up the chunked step.
    eng.step(chunk)
    eng.step(chunk)

    # Timed: pure chunk steps, all slots active, no admissions.
    reps = 10
    t0 = time.perf_counter()
    for _ in range(reps):
        eng.step(chunk)
    dt = time.perf_counter() - t0
    per_step_ms = dt / (reps * chunk) * 1e3
    agg = slots * reps * chunk / dt
    print(f"slots={slots} window={window} chunk={chunk}")
    print(f"steady-state: {per_step_ms:.2f} ms/step, {agg:.1f} tok/s aggregate")

    # Reference point: single-stream decode step cost on this fraction.
    print("single-stream driver metric ~197 tok/s = 5.07 ms/step")

    # Host-side overhead of one submit+adopt (prefill a short prompt).
    eng2 = BatchEngine(lm, proc, slots=slots, window=window)
    eng2.submit("warm", max_tokens=4)
    while eng2.pending():
        eng2.step()
    t0 = time.perf_counter()
    eng2.submit("another short request to adopt", max_tokens=4)
    t1 = time.perf_counter()
    print(f"submit(prefill+adopt) host wall: {(t1 - t0) * 1e3:.1f} ms")


if __name__ == "__main__":
    main()
