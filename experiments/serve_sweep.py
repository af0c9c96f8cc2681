"""Serving-throughput sweep: pipelined x slots x chunk x batched admission.

VERDICT r3 item 2: the r3 slot sweep ran 8/16 slots only NON-pipelined, and
admission prefilled one prompt per dispatch.  This sweep runs the full grid
with both fixes and writes a markdown table to stdout + JSON to
experiments/serve_sweep.json (merged into ROADMAP.md by hand).

Usage:  python experiments/serve_sweep.py [combos...]
        combos like 8x32 (slots x chunk); default grid below.
"""

import json
import os
import subprocess
import sys

GRID = ["4x32", "8x16", "8x32", "8x64", "16x32", "16x64"]


def run_one(slots: int, chunk: int) -> dict:
    env = dict(
        os.environ,
        BENCH_SLOT_COUNT=str(slots),
        BENCH_SLOT_CHUNK=str(chunk),
        BENCH_SERVE_PIPELINE="1",
        BENCH_SERVE_ADMIT_BATCH="1",
    )
    out = subprocess.run(
        [sys.executable, "bench_extra.py", "serve"],
        capture_output=True, text=True, env=env, cwd="/root/repo",
        timeout=3000,
    )
    line = [l for l in out.stdout.splitlines() if l.startswith("{")]
    if not line:
        return {"slots": slots, "chunk": chunk, "error": out.stderr[-400:]}
    res = json.loads(line[-1])
    return {"slots": slots, "chunk": chunk, "tps": res["value"],
            "note": res["note"]}


def main():
    combos = sys.argv[1:] or GRID
    rows = []
    for c in combos:
        s, ch = (int(x) for x in c.split("x"))
        r = run_one(s, ch)
        rows.append(r)
        print(json.dumps(r), flush=True)
    with open("/root/repo/experiments/serve_sweep.json", "w") as f:
        json.dump(rows, f, indent=2)
    print("\n| slots | chunk | aggregate tok/s |\n|---|---|---|")
    for r in rows:
        print(f"| {r['slots']} | {r['chunk']} | {r.get('tps', r.get('error', '?'))} |")


if __name__ == "__main__":
    main()
