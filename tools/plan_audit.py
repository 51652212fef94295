"""Registry-wide physical-plan anti-pattern audit.

Explains EVERY registered query and flags the node types that kill 100 TB
plans — CartesianProduct, BroadcastNestedLoopJoin, single-partition
Exchange, row-at-a-time Python UDFs (BatchEvalPython) — against an
explicit ALLOWLIST carrying a justification for each sanctioned
occurrence. Exit code 1 on any occurrence that is not explained, so the
audit can gate a round: a new query that silently plans a cartesian
product fails here even though its 500-row test results look fine.

The headline-20 dossier (dump_plans.py) shows the full plans; this tool
is the breadth pass — every query, four node classes, one line each.

Usage: python tools/plan_audit.py [sf_dir]   (default /root/testdata/sf0.01)
Writes docs/PLAN_AUDIT.md.
"""

from __future__ import annotations

import contextlib
import io
import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

# query -> {node: justification}. An entry here is a CLAIM the audit
# re-checks existence of; anything not listed is a failure.
ALLOW: dict[str, dict[str, str]] = {
    # 1-row global-total / normalizer build sides: a BroadcastNestedLoopJoin
    # with a single-row build is O(n) map-side work, the sanctioned way to
    # attach a global scalar to every row
    "docs_vocab_coverage": {"BroadcastNestedLoopJoin": "1-row occurrence-total crossJoin"},
    "docs_temperature_mixture": {"BroadcastNestedLoopJoin": "1-row sqrt-mass normalizer crossJoin"},
    "docs_unigram_logprob": {"BroadcastNestedLoopJoin": "1-row corpus token-total crossJoin"},
    "text_tfidf_top_terms": {"BroadcastNestedLoopJoin": "1-row doc-count crossJoin"},
    "text_pmi_bigrams": {
        "BroadcastNestedLoopJoin": "1-row bigram-total crossJoin into the "
        "floor-filtered pair frame — the sanctioned docs_unigram_logprob "
        "scalar class"
    },
    "docs_equidepth_histogram": {
        "BroadcastNestedLoopJoin": "9-row decile-cut table, non-equi containment probe"
    },
    "docs_bloom_decontaminate": {
        "BroadcastNestedLoopJoin": "1-row bloom bitset broadcast"
    },
    "join_cross_grid_coverage": {
        "BroadcastNestedLoopJoin": "intentional 25-row dimension grid (5 regions x 5 segments)",
    },
    "sim_cosine_topk": {"BroadcastNestedLoopJoin": "tiny |Q| query-vector side broadcast"},
    "emb_knn_recall": {
        "BroadcastNestedLoopJoin": "K-bounded sample (<=64 query vectors) broadcast into the exact-top-k side (the sim_cosine_topk class; the graph side stays band-bucketed)"
    },
    "emb_prefix_dim_recall": {
        "BroadcastNestedLoopJoin": "same K-bounded <=64-query sample broadcast into BOTH exact sides (full-dim and prefix-dim ground truths; the sim_cosine_topk class)"
    },
    "emb_pca_variance_explained": {
        "BroadcastNestedLoopJoin": "1-row scalar assembly (mx, N, T, v2 "
        "aggregates cross-joined into one row for the exact floor-division "
        "chain) — the sanctioned docs_unigram_logprob scalar class; the "
        "matvec itself is the iteration's own map-side-combining shape"
    },
    "text_bm25_topk": {
        "BroadcastNestedLoopJoin": "1-row corpus-stats scalar (N, T, df_i) cross-joined back — the sanctioned docs_unigram_logprob scalar class"
    },
    "docs_source_lang_kl": {
        "BroadcastNestedLoopJoin": "1-row corpus-total scalar cross-joined into the |sources|x|langs| cell frame — the sanctioned scalar class"
    },
    "sim_cosine_topk_ivf": {"BroadcastNestedLoopJoin": "broadcast centroids + query side"},
    "sim_cosine_topk_ivf_kmeans": {"BroadcastNestedLoopJoin": "broadcast trained centroids"},
    "sim_ivf_recall": {"BroadcastNestedLoopJoin": "tiny query side broadcast"},
    "emb_jl_distortion": {
        "BroadcastNestedLoopJoin": "tiny (5-row) query side broadcast for "
        "the all-candidates distortion scan (the cosine_topk shape)"
    },
    "sim_pq_adc_recall": {
        "BroadcastNestedLoopJoin": "tiny (NQ-row) query side broadcast for "
        "the exact-baseline non-equi join (the cosine_topk shape)"
    },
    "sim_ivf_kmeans_recall": {"BroadcastNestedLoopJoin": "tiny query side broadcast"},
    "dedup_semantic_checked": {
        "BroadcastNestedLoopJoin": "n_cells-row planted-centroid table broadcast (assignment argmax)"
    },
    "dedup_semantic": {
        "BroadcastNestedLoopJoin": "n_cells-row trained-centroid table broadcast (assignment argmax)"
    },
    "emb_kmeans_exact": {
        "BroadcastNestedLoopJoin": "k-row integer-centroid table broadcast "
        "(Lloyd assignment argmin — the dedup_semantic class)"
    },
    "docs_dsir_select": {
        "BroadcastNestedLoopJoin": "1-row target/pool feature-total crossJoins (DSIR normalizers)"
    },
    "agg_heavy_hitters_mg": {"BroadcastNestedLoopJoin": "1-row total-count threshold scalar"},
    "dedup_containment_pairs": {
        "BroadcastNestedLoopJoin": "1-row corpus common-shingle-total (c_tot) "
        "scalar crossJoined into the candidate pre-filter — the sanctioned "
        "scalar class (counting-identity verify, r11)"
    },
    "dedup_minhash_recall": {
        "BroadcastNestedLoopJoin": "1-row n_lsh count crossJoined into the "
        "1-row recall summary — the sanctioned scalar class; the exact-GT "
        "co-occurrence stage itself is an INTENTIONAL exact baseline of "
        "the dedup_embedding_cosine class (recall ground truth, sampled "
        "slice at 100 TB)"
    },
    "docs_distinctive_terms_by_source": {
        "BroadcastNestedLoopJoin": "1-row corpus token-total crossJoined "
        "into the floor-filtered (source, term) frame — the sanctioned "
        "docs_unigram_logprob scalar class"
    },
    "graph_lpa_modularity": {
        "BroadcastNestedLoopJoin": "1-row intra-edge count crossJoined "
        "with the 1-row degree-square aggregate — the sanctioned census "
        "scalar class (graph_triangles shape)"
    },
    "events_rfm_segments": {
        "BroadcastNestedLoopJoin": "1-row scalars only: the anchor-ts "
        "crossJoin, the three 1-row quintile-cut tables (4 values each, "
        "pivoted to one row), and exact_rank_cuts' internal target "
        "containment probes — the sanctioned scalar class; the user "
        "frame itself joins nothing non-broadcast"
    },
    "events_decayed_heavy_hitters": {
        "BroadcastNestedLoopJoin": "1-row max-ts decay anchor crossJoin"
    },
    "agg_hll_partial_union": {"BroadcastNestedLoopJoin": "1-row exact-count bound comparison"},
    "agg_kll_quantile_merge": {"BroadcastNestedLoopJoin": "1-row exact-quantile bound comparison"},
    "dedup_embedding_cosine": {
        "BroadcastNestedLoopJoin": "INTENTIONAL exact all-pairs baseline "
        "(operators/similarity.py:197 — dedup_embedding_lsh is the scale path; "
        "this form exists for small tables and recall ground truth)"
    },
    "q11_important_value": {"BroadcastNestedLoopJoin": "1-row multiplicative threshold scalar (TPC-H q11 shape)"},
    "q22_idle_customers": {"BroadcastNestedLoopJoin": "1-row avg-balance threshold scalar (TPC-H q22 shape)"},
    "docs_nb_langid_confusion": {
        "BroadcastNestedLoopJoin": "L-row language-class grid (candidate "
        "fan-out, L ≈ 6) + 1-row train-totals crossJoin (prior build)"
    },
    "docs_ccnet_perplexity_buckets": {
        "BroadcastNestedLoopJoin": "2-row tertile-cut table (non-equi "
        "containment probe, the equidepth shape) + 1-row cut pivot crossJoin"
    },
    "graph_triangles_copurchase": {
        "BroadcastNestedLoopJoin": "1-row census scalars "
        "(nodes/edges/wedges counts) crossJoined into the single output row"
    },
    "graph_triangles_capped": {
        "BroadcastNestedLoopJoin": "1-row census scalars (nodes/edges/"
        "wedges/dropped counts) crossJoined into the single output row"
    },
    "text_chunking_udtf": {
        "BatchEvalPython": "Python UDTF twin — pins the table-function API surface; "
        "text_chunking (pure expressions) is the scale path sharing the same oracle"
    },
}

NODES = ("CartesianProduct", "BroadcastNestedLoopJoin", "BatchEvalPython")

# child node classes under which an Exchange SinglePartition is K-BOUNDED:
# a keyless (scalar) partial aggregate, a limit, or a per-task top-K — the
# exchange then moves O(partitions·K) rows, never the data
_SP_BOUNDED_CHILD = re.compile(
    r"HashAggregate\(keys=\[\]"
    r"|SortAggregate\(key=\[\]"
    r"|ObjectHashAggregate\(keys=\[\]"
    r"|TakeOrderedAndProject"
    r"|LocalLimit|GlobalLimit"
)


def _unbounded_single_partition_children(simple_plan: str) -> list[str]:
    """Children of every `Exchange SinglePartition` in a simple-mode plan
    that are NOT K-bounded — i.e. the exchange would drag a
    data-proportional row set through one task. Returns the offending
    child lines (empty = all bounded)."""
    lines = simple_plan.splitlines()
    bad = []
    for i, line in enumerate(lines):
        if "Exchange SinglePartition" not in line:
            continue
        indent = len(line) - len(line.lstrip(" +-:*"))
        for nxt in lines[i + 1 :]:
            stripped = nxt.lstrip(" +-:*")
            if not stripped:
                continue
            nindent = len(nxt) - len(stripped)
            if nindent <= indent:
                break  # sibling/parent — exchange had no printed child
            # first deeper line = the exchange's input operator
            if not _SP_BOUNDED_CHILD.search(stripped):
                bad.append(stripped[:90])
            break
    return bad


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

    from yanwenxian_week3_data_pipeline_spark.plans import all_queries
    from yanwenxian_week3_data_pipeline_spark.session import get_spark

    spark = get_spark("plan_audit")
    spark.sparkContext.setLogLevel("ERROR")

    rows, violations = [], []
    for name, spec in sorted(all_queries().items()):
        try:
            df = spec.build(spark, sf_dir)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain(mode="formatted")
            plan = buf.getvalue()
        except Exception as exc:  # noqa: BLE001
            violations.append((name, "EXPLAIN-FAILED", str(exc)[:100]))
            continue
        found = {}
        for node in NODES:
            n = len(re.findall(rf"^\(\d+\) {node}", plan, flags=re.M))
            if n:
                found[node] = n
        # single-partition exchanges: classify each one's CHILD — a keyless
        # partial aggregate / limit / per-task top-K is K-bounded (the
        # exchange moves O(partitions·K) rows); anything else would drag a
        # data-proportional row set through one task and is a violation
        buf2 = io.StringIO()
        with contextlib.redirect_stdout(buf2):
            df.explain()  # simple mode: inline tree with full node text
        sp_bad = _unbounded_single_partition_children(buf2.getvalue())
        sp = len(re.findall(r"Exchange SinglePartition", buf2.getvalue()))
        notes = []
        for node, n in found.items():
            just = ALLOW.get(name, {}).get(node)
            if just is None:
                violations.append((name, node, f"{n} unexplained"))
                notes.append(f"{node}×{n} ← UNEXPLAINED")
            else:
                notes.append(f"{node}×{n} ({just})")
        if sp_bad:
            violations.append(
                (name, "ExchangeSinglePartition", f"unbounded child: {sp_bad[0]}")
            )
            notes.append(f"Exchange SinglePartition ← UNBOUNDED CHILD {sp_bad[0]}")
        elif sp:
            notes.append(
                f"Exchange SinglePartition×{sp} (children verified K-bounded)"
            )
        rows.append((name, "; ".join(notes) if notes else "clean"))

    # a justification that no longer matches any plan is a stale claim —
    # surface it so the allowlist stays an honest inventory
    seen = {(n, node) for n, note in rows for node in NODES if node in note}
    stale = [
        (qn, node)
        for qn, nodes in ALLOW.items()
        for node in nodes
        if (qn, node) not in seen
    ]

    out = Path(__file__).resolve().parent.parent / "docs" / "PLAN_AUDIT.md"
    with open(out, "w", encoding="utf-8") as f:
        f.write(
            "# Registry-wide plan audit\n\nGenerated by `python tools/plan_audit.py` "
            f"— {len(rows)} queries explained at `{sf_dir}`.\nEvery flagged node "
            "carries its justification; the tool exits 1 on any unexplained "
            "occurrence.\n\n| query | flagged nodes |\n|---|---|\n"
        )
        for name, note in rows:
            f.write(f"| `{name}` | {note} |\n")
    print(f"wrote {out} ({len(rows)} queries)")
    for qn, node in stale:
        print(f"stale allowlist entry (no longer in plan): {qn} / {node}")
    if violations:
        print("UNEXPLAINED plan anti-patterns:")
        for v in violations:
            print("  ", *v)
        sys.exit(1)
    print("plan audit clean: every flagged node has a recorded justification")


if __name__ == "__main__":
    main()
