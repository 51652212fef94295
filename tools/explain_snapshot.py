"""Dump `.explain("formatted")` for registered queries, one file per query.

Used to produce the r10 before/after plan evidence (plans/r10/): run once at
the round-9 baseline commit (worktree) and once at HEAD, then diff with
expression IDs normalized to find every query whose physical plan changed.

Usage: python tools/explain_snapshot.py <sf_dir> <outdir> [name ...]
  With no names, snapshots every registered query.
"""

from __future__ import annotations

import contextlib
import io
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    from yanwenxian_week3_data_pipeline_spark.plans import all_queries
    from yanwenxian_week3_data_pipeline_spark.session import get_spark

    sf_dir = sys.argv[1]
    outdir = Path(sys.argv[2])
    outdir.mkdir(parents=True, exist_ok=True)
    names = sys.argv[3:]

    spark = get_spark("explain-snapshot")
    spark.sparkContext.setLogLevel("ERROR")

    specs = all_queries()
    if names:
        specs = {n: specs[n] for n in names}
    failed = []
    for name in sorted(specs):
        try:
            df = specs[name].build(spark, sf_dir)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain(mode="formatted")
            (outdir / f"{name}.txt").write_text(buf.getvalue())
        except Exception as e:  # streaming/env-gated queries may not build here
            failed.append((name, repr(e)))
    if failed:
        sys.stderr.write("SKIPPED (build failed):\n")
        for name, err in failed:
            sys.stderr.write(f"  {name}: {err[:200]}\n")
    print(f"wrote {len(specs) - len(failed)}/{len(specs)} plans to {outdir}")


if __name__ == "__main__":
    main()
