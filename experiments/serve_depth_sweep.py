"""Pipeline-depth sweep for continuous-batching serving (one process).

Depth-1 pipelining cannot hide a dispatch+fetch round trip longer than a
chunk's device time; on a contended tunnel the round trip is ~0.8 s and the
pump goes latency-bound (sweep r4: 8x32 = 211 tok/s, flat in chunk size).
Depth-N keeps N chunks in flight so per-tick wall time approaches device
execute time (engine/batching.py step_pipelined).

This runner builds ONE engine per slot count and sweeps (chunk, depth)
in-process: depth changes nothing compiled, so each extra depth point is
pure execution time — unlike experiments/serve_sweep.py, which pays a full
weight-synth + compile per grid point in a subprocess.

Usage: python experiments/serve_depth_sweep.py [slots,chunk,depth ...]
       (triples like 8,32,4; default grid below)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("BENCH_QUANT_MODE", "affine")

GRID = [
    (4, 32, 1), (4, 32, 4),
    (8, 32, 1), (8, 32, 2), (8, 32, 4), (8, 32, 8),
    (8, 64, 4),
    (16, 32, 4), (16, 64, 4),
]


def _engine(lm, proc, slots):
    from phi_3_vision_mlx_tpu.engine.batching import BatchEngine

    eng = BatchEngine(lm, proc, slots=slots, window=512)
    rid = eng.submit("warmup request", max_tokens=8)
    while eng.pending():
        eng.step()
    return eng


def _warm_chunk(eng, chunk):
    eng.submit("warm the chunk program", max_tokens=chunk + 2)
    while eng.pending():
        eng.step(chunk)


def run_one(eng, slots, chunk, depth):
    """The serve() bench workload (bench_extra.py): 2*slots staggered
    requests, batched admission, pipelined dispatch at ``depth``."""
    pending_submits = [
        (f"Request {i}: tell a story about topic {i}.", 128 + 32 * (i % 4))
        for i in range(2 * slots)
    ]
    rids = []
    steps = 0
    t0 = time.perf_counter()
    while pending_submits or eng.pending():
        if pending_submits and eng.free:
            n_adm = min(len(pending_submits), len(eng.free))
            take, pending_submits = (pending_submits[:n_adm],
                                     pending_submits[n_adm:])
            if n_adm > 1:
                prepared = eng.prepare_many(
                    [p for p, _ in take],
                    [dict(max_tokens=n) for _, n in take],
                )
                rids += [eng.admit(p) for p in prepared]
            else:
                rids += [eng.submit(p, max_tokens=n) for p, n in take]
        if eng.pending():
            eng.step_pipelined(chunk, depth=depth)
            steps += 1
    eng.flush()
    dt = time.perf_counter() - t0
    total = sum(len(eng.requests[r].tokens) for r in rids)
    return {"slots": slots, "chunk": chunk, "depth": depth,
            "tps": round(total / dt, 2), "tokens": total,
            "seconds": round(dt, 1), "dispatches": steps}


def main():
    combos = [tuple(int(x) for x in a.split(",")) for a in sys.argv[1:]] or GRID
    from bench_extra import _lm

    lm, proc = _lm()
    rows = []
    eng, cur_slots, warmed = None, None, set()
    for slots, chunk, depth in combos:
        if slots != cur_slots:
            eng, cur_slots, warmed = _engine(lm, proc, slots), slots, set()
        if chunk not in warmed:
            _warm_chunk(eng, chunk)
            warmed.add(chunk)
        r = run_one(eng, slots, chunk, depth)
        rows.append(r)
        print(json.dumps(r), flush=True)
    with open("experiments/serve_depth_sweep.json", "w") as f:
        json.dump(rows, f, indent=2)
    print("\n| slots | chunk | depth | aggregate tok/s |\n|---|---|---|---|")
    for r in rows:
        print(f"| {r['slots']} | {r['chunk']} | {r['depth']} | {r['tps']} |")


if __name__ == "__main__":
    main()
