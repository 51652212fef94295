"""Strong-scaling curve for the headline bench: same data (sf0.1), the
core count swept 4 -> 8 -> 16 -> 32.

The bench's 2x-vs-baseline gate measures absolute speed at one
parallelism; this harness measures whether the PLANS scale with cores —
the single-box proxy for "would this still speed up on a 1000-executor
cluster". A query whose wall barely moves from 4 to 32 cores is bounded
by a serial stage (scalar collects, a 1-partition sort, Python worker
startup) rather than by distributable work; a query near the ideal
curve is shuffle/scan/CPU-bound in stages that actually parallelize.

Each core count runs in a FRESH subprocess (a SparkSession's master
can't change in-process): `bench.py` honors SPARK_GRAFT_CPUS and
SPARK_SHUFFLE_PARTITIONS, so the sweep sets both to c (matching the
session factory's intent that shuffle width tracks the executor count).

Interpretation caveat printed with the results: sub-second queries are
dominated by fixed per-query overhead (~0.2 s of job scheduling +
Python round-trips), so their curves flatten long before Amdahl does —
the speedup column is meaningful for the multi-second queries.

Usage: python tools/bench_scaling.py [sf_dir] [cpus ...]
  sf_dir  default /root/testdata/sf0.1
  cpus    default 4 8 16 32
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def run_bench(sf_dir: str, cpus: int) -> dict:
    env = dict(os.environ)
    env["SPARK_GRAFT_SF_DIR"] = sf_dir
    env["SPARK_GRAFT_CPUS"] = str(cpus)
    env["SPARK_SHUFFLE_PARTITIONS"] = str(cpus)
    out = subprocess.run(
        [sys.executable, str(REPO / "bench.py")],
        capture_output=True,
        text=True,
        env=env,
        check=True,
    ).stdout
    line = [l for l in out.splitlines() if l.startswith('{"metric"')][-1]
    return json.loads(line)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    cpus = [int(c) for c in sys.argv[2:]] or [4, 8, 16, 32]

    results = {}
    for c in cpus:
        results[c] = run_bench(sf_dir, c)
        print(f"-- local[{c}]: total {results[c]['value']} s")

    base = cpus[0]
    names = sorted(results[base]["queries"])
    width = max(len(n) for n in names)
    header = " ".join(f"{('c=' + str(c)):>8s}" for c in cpus)
    print(f"\n{'query':{width}s} {header}   speedup({base}->{cpus[-1]})")
    for n in names:
        walls = " ".join(f"{results[c]['queries'][n]:8.3f}" for c in cpus)
        sp = results[base]["queries"][n] / results[cpus[-1]]["queries"][n]
        print(f"{n:{width}s} {walls}   {sp:5.2f}x")
    tot_sp = results[base]["value"] / results[cpus[-1]]["value"]
    totals = " ".join(f"{results[c]['value']:8.3f}" for c in cpus)
    print(f"{'TOTAL':{width}s} {totals}   {tot_sp:5.2f}x")
    print(
        "\nNB: sub-second queries are fixed-overhead-bound (~0.2 s of job\n"
        "scheduling / Python round-trips) — read the speedup column on the\n"
        "multi-second queries."
    )


if __name__ == "__main__":
    main()
