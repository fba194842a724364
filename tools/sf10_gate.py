"""Standing one-command sf10 grid gate (VERDICT r11 item 3).

Runs the given ops — plus the top-N wall-clock queries from the last
full bench map (BENCH_local.json) — at an sf10 replica under the
DEFAULT 16g heap with ANSI mode on, through a noop sink so every
query executes fully. Pass/fail per op is "ran to completion": ANSI
surfaces the scale-only landmines (int64 overflow — the r11
littles_law_audit catch — cast truncation, div-by-zero) as errors
instead of silent wrong answers, and the heap gate surfaces resident
working-set regressions as OOM. Value correctness at sf10 is NOT
checked here (no DuckDB twin at that scale); that's what the
sf0.001..sf1 oracle sweeps are for.

Usage:
    python tools/sf10_gate.py [sf_dir] [--ops=a,b,c] [--top=20]

One command produces the SWEEP_r{N}.md sf10 section: a markdown
table (op, sf10 wall, bench-SF wall, per-decade ratio) plus a final
`SF10 GATE PASS k/n` line.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from koalas_spark import get_spark
from koalas_spark.queries import all_queries


def _bench_map() -> tuple[float, dict[str, float]]:
    """(bench sf, full per-query timing map) from the last local
    bench run (BENCH_local.json keeps the full-precision map)."""
    try:
        with open("/root/repo/BENCH_local.json") as f:
            d = json.load(f)
        sf = d.get("sf", 0.1)
        return (
            float(sf) if isinstance(sf, (int, float)) else 0.1,
            dict(d.get("queries", {})),
        )
    except (OSError, ValueError):
        return (0.1, {})


def main(argv: list[str]) -> int:
    sf_dir = "/root/repo/.tmp/sf10"
    ops: list[str] = []
    top_n = 20
    for a in argv:
        if a.startswith("--ops="):
            ops += [x for x in a.split("=", 1)[1].split(",") if x]
        elif a.startswith("--top="):
            top_n = int(a.split("=", 1)[1])
        else:
            sf_dir = a
    bsf, bench = _bench_map()
    queries = all_queries()
    slowest = [
        n
        for n, _ in sorted(bench.items(), key=lambda kv: -kv[1])
        if n in queries
    ][:top_n]
    names = list(dict.fromkeys(ops + slowest))  # ordered de-dup
    missing = [n for n in names if n not in queries]
    if missing:
        print(f"UNKNOWN OPS: {missing}")
        return 2
    spark = get_spark("sf10_gate")
    mem = os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g")
    decades = math.log10(10.0 / bsf)
    print(f"| op | sf10 wall | sf{bsf} wall | per-decade | status |")
    print("| --- | --- | --- | --- | --- |")
    n_ok = 0
    for name in names:
        t0 = time.time()
        try:
            queries[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            wall = time.time() - t0
            b = bench.get(name)
            if b and b > 0:
                per_dec = (wall / b) ** (1.0 / decades)
                print(
                    f"| {name} | {wall:.1f}s | {b:.2f}s "
                    f"| {per_dec:.1f}x | OK |",
                    flush=True,
                )
            else:
                print(
                    f"| {name} | {wall:.1f}s | - | - | OK |", flush=True
                )
            n_ok += 1
        except Exception as exc:  # noqa: BLE001 — the gate must report, not die
            head = str(exc).splitlines()[0][:160] if str(exc) else repr(exc)
            print(
                f"| {name} | {time.time() - t0:.1f}s | - | - "
                f"| **FAIL**: {head} |",
                flush=True,
            )
    verdict = "PASS" if n_ok == len(names) else "FAIL"
    print(
        f"\nSF10 GATE {verdict}: {n_ok}/{len(names)} ops ran clean "
        f"at {mem} heap ({sf_dir})"
    )
    return 0 if n_ok == len(names) else 1


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
