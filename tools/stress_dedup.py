"""Scale stress for the dedup family: generate a synthetic corpus N× the
bench's documents table (default 100k docs, deliberately small vocabulary —
the worst case for LSH bucket skew) and time the heavy operators on it.

This is the harness behind the numbers in README "Scale notes"; the
mega-bucket guard (constants.DEDUP_MAX_BUCKET) was added after this harness
showed simhash's chunk join going quadratic on hot buckets.

Usage: python tools/stress_dedup.py [n_docs] [out_dir]
"""

from __future__ import annotations

import random
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

VOCAB = [
    "key", "agg", "row", "scan", "slow", "fast", "table", "value", "part",
    "hash", "merge", "batch", "spark", "line", "sort", "window", "the", "a",
    "join", "shuffle", "codegen", "filter", "push", "down", "broad", "cast",
    "skew", "salt", "arrow", "pandas",
]


def generate(n_docs: int, out_dir: str) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    random.seed(42)
    texts = []
    for i in range(n_docs):
        n = random.randint(30, 90)
        words = [VOCAB[random.randrange(len(VOCAB))] for _ in range(n)]
        if i and random.random() < 0.2:  # 20% near-dups of the previous doc
            words = texts[-1].split()
            words[random.randrange(len(words))] = "mutated"
        texts.append(" ".join(words))
    Path(out_dir).mkdir(parents=True, exist_ok=True)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(n_docs), pa.int64()),
                "text": texts,
                "lang": ["en"] * n_docs,
                "source": ["syn"] * n_docs,
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            }
        ),
        f"{out_dir}/documents.parquet",
    )


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/syn_sf"
    generate(n_docs, out_dir)
    print(f"generated {n_docs} docs in {out_dir}")

    from yanwenxian_week3_data_pipeline_spark.plans import all_queries
    from yanwenxian_week3_data_pipeline_spark.session import get_spark

    spark = get_spark("stress")
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()
    for name in (
        "agg_counts_funnel",
        "dedup_exact",
        "docs_gopher_filter",
        "dedup_minhash_lsh",
        "dedup_simhash_pairs",
        "docs_corpus_curation",
    ):
        t0 = time.time()
        n = qs[name].build(spark, out_dir).count()
        print(f"{name}: {time.time() - t0:.1f}s rows={n}")

    # adversarial connected components: a single path graph of n_docs nodes
    # (diameter n_docs-1) with shuffled ids — the shape where min-label
    # propagation needs diameter-many rounds; star contraction must land
    # the fixpoint in O(log n) rounds
    import random as _r

    from pyspark.sql import functions as F  # noqa: N812

    from yanwenxian_week3_data_pipeline_spark.operators.components import (
        star_contraction,
    )

    _r.seed(7)
    ids = list(range(n_docs))
    _r.shuffle(ids)
    chain = spark.createDataFrame(
        [(ids[i], ids[i + 1]) for i in range(len(ids) - 1)], "src long, dst long"
    )
    t0 = time.time()
    labels, rounds = star_contraction(chain, "src", "dst", max_iter=40)
    n_comp = labels.select("comp").distinct().count()
    ok = n_comp == 1 and labels.agg(F.min("comp")).collect()[0][0] == 0
    t_chain = time.time() - t0
    print(
        f"cc_long_chain: {t_chain:.1f}s nodes={n_docs} "
        f"diameter={n_docs - 1} rounds={rounds} correct={ok}"
    )

    # celebrity-hub stress: ONE node with n_docs neighbors (the
    # boilerplate-page shape of real near-dup graphs) plus a background
    # chain — equal edge count to cc_long_chain, but the per-node min
    # window serializes the hub's whole neighbor list into a single task.
    # Run it twice, forcing each route: the gate is BOTH paths landing
    # within ~2× of the uniform-chain wall at equal edges, and identical
    # labels. Measured economics (2026-08-14, local[32]): at a 4.2M-
    # neighbor hub the window path is ~1.7× FASTER than the skew path
    # (77 s vs 132 s; single-box sorts are memory-bandwidth-bound, so one
    # task sorting 8M longs costs less than the skew route's extra
    # sample/broadcast/anti-join scans) — the skew path is MULTI-NODE
    # insurance, where the hub partition means one executor fetches and
    # sorts the whole neighbor list over the network while the rest of
    # the cluster idles; hence the high default HUB_MIN_ROWS floor.
    hub = 10**9
    hub_ids = list(range(n_docs))
    _r.shuffle(hub_ids)
    n_bg = max(2, n_docs // 10)
    star_edges = [(hub, i) for i in hub_ids]
    star_edges += [(2 * 10**9 + i, 2 * 10**9 + i + 1) for i in range(n_bg - 1)]
    star = spark.createDataFrame(star_edges, "src long, dst long")
    for tag, hmr in (("skew_path", 4096), ("window_path", 10**15)):
        t0 = time.time()
        labels, rounds = star_contraction(
            star, "src", "dst", max_iter=40, hub_min_rows=hmr
        )
        n_comp = labels.select("comp").distinct().count()
        ok = n_comp == 2 and labels.agg(F.min("comp")).collect()[0][0] == 0
        wall = time.time() - t0
        print(
            f"cc_hub[{tag}]: {wall:.1f}s hub_degree={n_docs} rounds={rounds} "
            f"correct={ok} vs_chain={wall / t_chain:.2f}x"
        )


if __name__ == "__main__":
    main()
