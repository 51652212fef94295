"""Storage-footprint audit: measure how codec choice and within-file sort
order change parquet size — the two free knobs that decide the storage
bill at 100 TB. Writes the sf table four ways (snappy/zstd × as-is/sorted)
and prints bytes + ratio vs the snappy-unsorted baseline. Sorting by a
low-cardinality prefix clusters equal values into runs, which is what
dictionary/RLE encodings (and then the codec) exploit.

Usage: python tools/storage_audit.py [sf_dir] [table] [sort_cols...]
  defaults: /root/testdata/sf0.1 lineitem l_returnflag,l_linestatus,l_shipdate
"""

from __future__ import annotations

import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _dir_bytes(p: str) -> int:
    return sum(f.stat().st_size for f in Path(p).rglob("*.parquet"))


def main() -> None:
    from yanwenxian_week3_data_pipeline_spark.session import get_spark

    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    table = sys.argv[2] if len(sys.argv) > 2 else "lineitem"
    sort_cols = (
        sys.argv[3].split(",")
        if len(sys.argv) > 3
        else ["l_returnflag", "l_linestatus", "l_shipdate"]
    )
    spark = get_spark("storage-audit")
    spark.sparkContext.setLogLevel("ERROR")
    df = spark.read.parquet(f"{sf}/{table}.parquet").coalesce(4)

    root = tempfile.mkdtemp(prefix="storage_audit_")
    results: dict[str, int] = {}
    for codec in ("snappy", "zstd"):
        for label, frame in (("as-is", df), ("sorted", df.sortWithinPartitions(*sort_cols))):
            out = f"{root}/{codec}_{label}"
            frame.write.mode("overwrite").option("compression", codec).parquet(out)
            results[f"{codec} {label}"] = _dir_bytes(out)

    base = results["snappy as-is"]
    print(f"{table} @ {sf} (sort: {','.join(sort_cols)})")
    for k, v in results.items():
        print(f"  {k:14s} {v / 1e6:8.1f} MB   {v / base:6.2%} of baseline")


if __name__ == "__main__":
    main()
