"""Prototype + interleaved A/B: Arrow/numpy winnowing-fingerprint kernel
for text_winnowing_overlap (VERDICT r10 next-round item 4, taken the
bit-identical route: the committed expression form's cost is the
interpreted O(n*w) array_min-over-slices HOF per document — guide §4.2
"hand whole batches to vectorized native libraries" — and the md5/hash60
recipe is already replicated exactly in Python by the MinHash signature
kernel, so the fingerprint SET is reproducible bit-identically with no
recall gate needed).

Variant shape: tokens stay a Spark expression (identical cleaning), the
kernel computes grams -> seeded md5 hash60 -> sliding-window min
(numpy stride tricks) -> distinct, emitting exploded (doc_id, fp) rows.
The fp table feeds THREE consumers (bucket guard + both join sides) and
Python stages are not deduped by exchange reuse (the r6 lesson), so the
variant localCheckpoints it once — the minhash sigs precedent.

Usage: python tools/proto_winnow_arrow.py [sf_dir] [rounds=6]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def variant(spark, sf_dir):
    import hashlib

    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F

    from yanwenxian_week3_data_pipeline_spark.constants import (
        DEDUP_MAX_BUCKET,
        WINNOW_GRAM_K,
        WINNOW_HASH_SEED,
        WINNOW_MIN_SHARED,
        WINNOW_WINDOW,
    )
    from yanwenxian_week3_data_pipeline_spark.functions.text import clean_text_expr
    from yanwenxian_week3_data_pipeline_spark.functions.textstats import tokens_expr
    from yanwenxian_week3_data_pipeline_spark.plans.curation_ext import _docs

    K, W, seed = WINNOW_GRAM_K, WINNOW_WINDOW, WINNOW_HASH_SEED

    def kernel(batches):
        pre = f"{seed}:".encode()
        for pdf in batches:
            ids, fps = [], []
            for did, toks in zip(pdf["doc_id"], pdf["toks"]):
                n = len(toks)
                if n < K:
                    continue
                h = np.fromiter(
                    (
                        int(
                            hashlib.md5(
                                pre + " ".join(toks[i : i + K]).encode()
                            ).hexdigest()[:15],
                            16,
                        )
                        for i in range(n - K + 1)
                    ),
                    dtype=np.int64,
                    count=n - K + 1,
                )
                if len(h) < W:
                    continue
                mins = np.lib.stride_tricks.sliding_window_view(h, W).min(axis=1)
                for fp in set(mins.tolist()):
                    ids.append(did)
                    fps.append(fp)
            yield pd.DataFrame({"doc_id": ids, "fp": fps})

    d = _docs(spark, sf_dir).select(
        "doc_id", tokens_expr(clean_text_expr(F.col("text"))).alias("toks")
    )
    e = d.mapInPandas(kernel, "doc_id long, fp long").localCheckpoint(eager=True)
    ok = e.groupBy("fp").count().where(F.col("count") <= DEDUP_MAX_BUCKET).drop("count")
    eo = e.join(ok, "fp", "left_semi")
    return (
        eo.alias("a")
        .join(
            eo.alias("b"),
            (F.col("a.fp") == F.col("b.fp")) & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .where(F.col("n_shared") >= WINNOW_MIN_SHARED)
    )


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 6

    from yanwenxian_week3_data_pipeline_spark.plans import all_queries
    from yanwenxian_week3_data_pipeline_spark.session import (
        get_spark,
        release_persistent_rdds,
    )

    spark = get_spark("winnow-proto")
    spark.sparkContext.setLogLevel("ERROR")
    spec = all_queries()["text_winnowing_overlap"]

    ra = sorted(map(str, spec.build(spark, sf_dir).collect()))
    rb = sorted(map(str, variant(spark, sf_dir).collect()))
    release_persistent_rdds(spark)
    print(f"rows {len(ra)} vs {len(rb)} identical: {ra == rb}", flush=True)
    if ra != rb:
        sa, sb = set(ra), set(rb)
        print("only committed:", sorted(sa - sb)[:3])
        print("only variant:", sorted(sb - sa)[:3])
        return 1

    def run(which: str) -> float:
        df = spec.build(spark, sf_dir) if which == "committed" else variant(spark, sf_dir)
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        wall = time.perf_counter() - t0
        release_persistent_rdds(spark)
        return wall

    run("committed"), run("arrow")  # cold
    walls: dict[str, list[float]] = {"committed": [], "arrow": []}
    for r in range(rounds):
        order = ("committed", "arrow") if r % 2 == 0 else ("arrow", "committed")
        for v in order:
            walls[v].append(run(v))
        print(
            f"round {r + 1}/{rounds}: committed={walls['committed'][-1]:.3f}"
            f" arrow={walls['arrow'][-1]:.3f}",
            flush=True,
        )
    for v, w in walls.items():
        s = sorted(w)
        print(f"{v}: median {statistics.median(s):.3f}s samples {[round(x, 3) for x in s]}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
