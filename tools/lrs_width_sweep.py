"""Interleaved A/B/C sweep of LRS_PREFIX_CHARS for docs_lrs_capped
(VERDICT r10 next-round item 3: the two-level adjacency's block-key width
has never been swept — wider keys shrink the level-1 windows but push
more pairs to the level-2 boundary pass).

The capped-LRS answer is width-INVARIANT by construction (the two-level
adjacency is candidate-set-identical to a global sort for ANY prefix
width — operators/substrings.py module docstring), so the sweep first
asserts all widths return the identical row, then times them interleaved
within one session (JIT warmth and box load hit every width equally).

Usage: python tools/lrs_width_sweep.py <sf_dir> [rounds=6] [widths=4,8,12]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    widths = [int(w) for w in (sys.argv[3] if len(sys.argv) > 3 else "4,8,12").split(",")]

    from yanwenxian_week3_data_pipeline_spark.operators.substrings import (
        lrs_capped_sorted,
    )
    from yanwenxian_week3_data_pipeline_spark.plans.llm_ops import _toks_frame
    from yanwenxian_week3_data_pipeline_spark.session import get_spark

    spark = get_spark("lrs-width-sweep")
    spark.sparkContext.setLogLevel("ERROR")

    def build(width: int):
        return lrs_capped_sorted(_toks_frame(spark, sf_dir), prefix_chars=width)

    rows = {w: [tuple(r) for r in build(w).collect()] for w in widths}
    base = rows[widths[0]]
    print(f"result: {base}")
    for w in widths:
        if rows[w] != base:
            print(f"width {w} DIVERGES: {rows[w]} vs {base}")
            return 1
    print(f"all widths identical: {widths}", flush=True)

    def run(width: int) -> float:
        df = build(width)
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    for w in widths:  # cold pass, excluded
        run(w)
    walls: dict[int, list[float]] = {w: [] for w in widths}
    for r in range(rounds):
        order = widths if r % 2 == 0 else list(reversed(widths))
        for w in order:
            walls[w].append(run(w))
        print(
            f"round {r + 1}/{rounds}: "
            + " ".join(f"w{w}={walls[w][-1]:.3f}" for w in widths),
            flush=True,
        )
    for w in widths:
        s = sorted(walls[w])
        print(f"width {w}: median {statistics.median(s):.3f}s samples {[round(x, 3) for x in s]}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
