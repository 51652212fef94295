"""Mirror of the driver's CORRECTNESS gate: run every registered query
side-by-side with its DuckDB oracle and compare PANDAS-NORMALIZED values —
the same canonicalization the driver applies (Spark via ``toPandas()``,
DuckDB via ``.df()``; columns sorted by name, rows sorted, str-level value
hash, NA-ish values unified). This is strictly harder than a repr compare on
python objects: dtype divergences (DECIMAL→float64, HUGEINT→float64,
nullable-int→float64) surface here exactly as they do in the driver.

Usage: python tools/verify_all.py [sf_dir] [name_prefix ...]
  sf_dir        table directory (default /root/testdata/sf0.01 — the
                driver's correctness scale)
  name_prefix   optional: only verify queries whose name starts with any
                of the given prefixes
Env:
  VERIFY_DIFF=1   print a 3-row sample diff for each mismatch
"""

from __future__ import annotations

import hashlib
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

TABLES = "region nation customer supplier part orders lineitem events documents embeddings"


def canon_cell(v) -> str:
    """Canonical string for one value under pandas normalization. Both
    engines' results pass through pandas, so same-shaped NA (NaN/NaT/None)
    and numpy scalars appear on both sides; unify them anyway so the compare
    never depends on which NA flavor a dtype produces."""
    import numpy as np
    import pandas as pd

    if isinstance(v, (list, tuple, np.ndarray)):
        return "[" + ",".join(canon_cell(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{canon_cell(v[k])}" for k in sorted(v)) + "}"
    try:
        if pd.isna(v):
            return "∅"
    except (TypeError, ValueError):
        pass
    if isinstance(v, (np.floating, float)):
        return str(float(v))
    if isinstance(v, (np.integer, int)) and not isinstance(v, bool):
        return str(int(v))
    return str(v)


def canon_rows(df) -> list[str]:
    cols = sorted(df.columns)
    out = [",".join(canon_cell(row[c]) for c in cols) for _, row in df.iterrows()]
    return sorted(out)


def vhash(lines: list[str]) -> str:
    return hashlib.md5("\n".join(lines).encode()).hexdigest()


def main() -> int:
    import duckdb

    from yanwenxian_week3_data_pipeline_spark.plans import all_queries
    from yanwenxian_week3_data_pipeline_spark.session import get_spark

    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    prefixes = tuple(sys.argv[2:])
    show_diff = os.environ.get("VERIFY_DIFF") == "1"

    spark = get_spark("verify-all")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES.split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")

    qs = all_queries()
    names = sorted(n for n in qs if not prefixes or n.startswith(prefixes))
    bad, rows_only = [], 0
    t0 = time.time()
    for name in names:
        spec = qs[name]
        try:
            sdf = spec.build(spark, sf)
            spdf = sdf.toPandas()
            if spec.oracle is None:
                rows_only += 1
                continue
            odf = con.execute(spec.oracle).df()
            srows, orows = canon_rows(spdf), canon_rows(odf)
            if sorted(spdf.columns) != sorted(odf.columns):
                bad.append(name)
                print(f"MISMATCH {name}: cols spark={sorted(spdf.columns)} duckdb={sorted(odf.columns)}")
            elif len(srows) != len(orows) or vhash(srows) != vhash(orows):
                bad.append(name)
                print(f"MISMATCH {name}: spark={len(srows)} duckdb={len(orows)}")
                if show_diff:
                    sset, oset = set(srows), set(orows)
                    for r in [r for r in srows if r not in oset][:3]:
                        print(f"  spark-only : {r[:220]}")
                    for r in [r for r in orows if r not in sset][:3]:
                        print(f"  duckdb-only: {r[:220]}")
        except Exception as e:  # noqa: BLE001 - report and continue
            bad.append(name)
            print(f"ERROR {name}: {str(e)[:200]}")
    status = "ALL MATCH" if not bad else f"FAILED: {bad}"
    print(
        f"{len(names)} queries ({rows_only} rows-only) in {time.time() - t0:.0f}s -> {status}"
    )
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
