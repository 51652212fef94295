"""Mirror of the driver's CORRECTNESS gate: run every registered query
side-by-side with its DuckDB oracle (sorted columns, sorted rows, value
hash) and print one line per failure plus a summary.

Usage: python tools/verify_all.py [sf_dir] [name_prefix ...]
  sf_dir        table directory (default /root/testdata/sf0.01 — the
                driver's correctness scale)
  name_prefix   optional: only verify queries whose name starts with any
                of the given prefixes
"""

from __future__ import annotations

import hashlib
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

TABLES = "region nation customer supplier part orders lineitem events documents embeddings"


def vhash(rows, cols) -> str:
    cols = sorted(cols)
    return hashlib.md5(
        "\n".join(sorted(",".join(repr(r[c]) for c in cols) for r in rows)).encode()
    ).hexdigest()


def main() -> int:
    import duckdb

    from yanwenxian_week3_data_pipeline_spark.plans import all_queries
    from yanwenxian_week3_data_pipeline_spark.session import get_spark

    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    prefixes = tuple(sys.argv[2:])

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
            srows = [r.asDict() for r in sdf.collect()]
            if spec.oracle is None:
                rows_only += 1
                continue
            cur = con.execute(spec.oracle)
            ocols = [d[0] for d in cur.description]
            orows = [dict(zip(ocols, r)) for r in cur.fetchall()]
            ok = len(srows) == len(orows) and vhash(
                srows, [f.name for f in sdf.schema.fields]
            ) == vhash(orows, ocols)
            if not ok:
                bad.append(name)
                print(f"MISMATCH {name}: spark={len(srows)} duckdb={len(orows)}")
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
