"""Recount batch 9 — the round-8 new-operator wave: event-type Markov
transitions, PMI collocations, token-anchor CDC dedup, embedding centroid
outliers. Sequential pure-Python replays over raw parquet, sharing only
frozen constants with the engine (the standing rule: every new
count-bearing query lands with a third opinion in the same round)."""

from __future__ import annotations

import hashlib
import math
import re
from collections import defaultdict
from decimal import ROUND_HALF_UP, Decimal

import pyarrow.parquet as pq
import pytest

from yanwenxian_week3_data_pipeline_spark.constants import (
    CDC_GEAR_MOD,
    CDC_MAX_FP_BUCKET,
    CDC_MIN_CHUNK_TOKENS,
    CDC_MIN_SHARED_CHUNKS,
    HTML_ENTITIES,
    PMI_MIN_COUNT,
    PMI_TOPK,
)


def _run(spark, sf_dir, name):
    from yanwenxian_week3_data_pipeline_spark.plans import all_queries

    return all_queries()[name].build(spark, sf_dir).collect()


@pytest.fixture(scope="module")
def documents(sf_dir):
    return pq.read_table(f"{sf_dir}/documents.parquet").to_pylist()


_WS = re.compile("[ \t\n\r\f\x0b\xa0]+")


def _clean(t: str | None) -> str:
    if t is None:
        return ""
    for ent, ch in HTML_ENTITIES:
        t = t.replace(ent, ch)
    return _WS.sub(" ", t).strip(" ")


def _tokens(t: str | None) -> list[str]:
    c = _clean(t)
    return c.split(" ") if c else []


def _hash60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _round_half_up(x: float, places: int) -> Decimal:
    return Decimal(repr(x)).quantize(Decimal(1).scaleb(-places), ROUND_HALF_UP)


def _lmilli(x: int) -> int:
    return int(_round_half_up(math.log(float(x)) * 1000, 0))


def test_markov_transitions_recount(spark, sf_dir):
    ev = pq.read_table(f"{sf_dir}/events.parquet").to_pylist()
    by_user: dict = defaultdict(list)
    for e in ev:
        by_user[e["user_id"]].append((e["ts"], e["event_id"], e["event_type"]))
    counts: dict = defaultdict(int)
    for seq in by_user.values():
        seq.sort()  # (ts, event_id) — event_id unique, deterministic order
        for (_, _, a), (_, _, b) in zip(seq, seq[1:]):
            counts[(a, b)] += 1
    totals: dict = defaultdict(int)
    for (a, _b), n in counts.items():
        totals[a] += n
    exp = {
        (a, b): (n, float(_round_half_up(n / totals[a], 6)))
        for (a, b), n in counts.items()
    }
    got = {
        (r["prev_type"], r["next_type"]): (r["n_transitions"], r["p_next"])
        for r in _run(spark, sf_dir, "events_markov_transitions")
    }
    assert got == exp
    # row-conditional probabilities must sum to ~1 per prev type
    for a in totals:
        s = sum(p for (x, _), (_, p) in got.items() if x == a)
        assert abs(s - 1.0) < 1e-4


def test_pmi_bigrams_recount(spark, sf_dir, documents):
    cb: dict = defaultdict(int)
    for d in documents:
        toks = _tokens(d["text"])
        for a, b in zip(toks, toks[1:]):
            cb[(a, b)] += 1
    cf: dict = defaultdict(int)
    cs: dict = defaultdict(int)
    for (a, b), n in cb.items():
        cf[a] += n
        cs[b] += n
    total = sum(cb.values())
    scored = []
    for (a, b), n in cb.items():
        if n < PMI_MIN_COUNT:
            continue
        pmi_milli = _lmilli(n) + _lmilli(total) - _lmilli(cf[a]) - _lmilli(cs[b])
        scored.append((-pmi_milli, a, b, n))
    scored.sort()
    exp = [
        (a, b, n, float(_round_half_up(-negp / 1000.0, 6)))
        for negp, a, b, n in scored[:PMI_TOPK]
    ]
    got = [
        (r["w1"], r["w2"], r["n_pair"], r["pmi_nats"])
        for r in _run(spark, sf_dir, "text_pmi_bigrams")
    ]
    assert got == exp
    assert len(got) == PMI_TOPK  # the floor must leave enough pairs at test scales


def _cdc_chunks(toks: list[str]) -> set:
    if len(toks) < CDC_MIN_CHUNK_TOKENS:
        return set()
    edges = [0]
    for i, t in enumerate(toks, start=1):
        if _hash60(t) % CDC_GEAR_MOD == 0:
            edges.append(i)
    edges.append(len(toks))
    fps = set()
    for a, b in zip(edges, edges[1:]):
        if b - a >= CDC_MIN_CHUNK_TOKENS:
            chunk = " ".join(toks[a:b])
            fps.add(hashlib.md5(chunk.encode()).hexdigest())
    return fps


def test_cdc_chunks_recount(spark, sf_dir, documents):
    doc_fps = {d["doc_id"]: _cdc_chunks(_tokens(d["text"])) for d in documents}
    by_fp: dict = defaultdict(list)
    for doc_id, fps in doc_fps.items():
        for fp in fps:
            by_fp[fp].append(doc_id)
    shared: dict = defaultdict(int)
    for fp, ids in by_fp.items():
        if len(ids) > CDC_MAX_FP_BUCKET:
            continue  # the mega-bucket guard
        ids.sort()
        for i, a in enumerate(ids):
            for b in ids[i + 1 :]:
                shared[(a, b)] += 1
    exp = {
        pair: n for pair, n in shared.items() if n >= CDC_MIN_SHARED_CHUNKS
    }
    got = {
        (r["doc_a"], r["doc_b"]): r["n_shared"]
        for r in _run(spark, sf_dir, "dedup_cdc_chunks")
    }
    assert got == exp
    assert len(got) > 0  # the fixture's planted near-dups must surface


def test_cdc_resync_property():
    """The CDC property itself: inserting one token near the front changes
    only the chunk(s) around the edit — every boundary at or after the
    next anchor survives (fixed-width shingling shifts them all)."""
    toks = [f"w{i}" for i in range(200)]
    edited = toks[:3] + ["INSERTED"] + toks[3:]
    a = _cdc_chunks(toks)
    b = _cdc_chunks(edited)
    assert a  # non-degenerate fixture
    # all chunks strictly after the edit region are shared
    assert len(a & b) >= len(a) - 3


def test_centroid_outliers_recount(spark, sf_dir):
    from yanwenxian_week3_data_pipeline_spark.constants import EMB_OUTLIER_TOPK
    from yanwenxian_week3_data_pipeline_spark.operators.kmeans_exact import (
        KM_OFFSET,
        KM_SCALE,
    )

    emb = pq.read_table(f"{sf_dir}/embeddings.parquet").to_pylist()
    rows = [
        (
            e["vec_id"],
            e["label"],
            [int(math.floor(float(x) * KM_SCALE + 0.5)) + KM_OFFSET for x in e["embedding"]],
        )
        for e in emb
    ]
    sums: dict = defaultdict(lambda: defaultdict(int))
    ns: dict = defaultdict(int)
    for _vid, label, q in rows:
        ns[label] += 1
        for pos, v in enumerate(q):
            sums[label][pos] += v
    cent = {
        label: [sums[label][pos] // ns[label] for pos in range(len(sums[label]))]
        for label in sums
    }
    d2 = [
        (label, vid, sum((a - b) * (a - b) for a, b in zip(q, cent[label])))
        for vid, label, q in rows
    ]
    exp = []
    for label in sorted(ns):
        ranked = sorted(
            [(d, v) for lb, v, d in d2 if lb == label], key=lambda t: (-t[0], t[1])
        )[: EMB_OUTLIER_TOPK]
        for rank, (d, v) in enumerate(ranked, start=1):
            exp.append((label, v, rank, d, float(_round_half_up(d / 1e12, 6))))
    got = sorted(
        (r["label"], r["vec_id"], r["rank"], r["dist_sq_q"], r["dist_sq"])
        for r in _run(spark, sf_dir, "emb_centroid_outliers")
    )
    assert got == sorted(exp)


def test_transition_surprisal_recount(spark, sf_dir):
    from yanwenxian_week3_data_pipeline_spark.plans.analytic_ext import (
        SURPRISAL_MIN_TRANSITIONS,
        SURPRISAL_TOPK,
    )

    ev = pq.read_table(f"{sf_dir}/events.parquet").to_pylist()
    by_user: dict = defaultdict(list)
    for e in ev:
        by_user[e["user_id"]].append((e["ts"], e["event_id"], e["event_type"]))
    counts: dict = defaultdict(int)
    per_user: dict = defaultdict(list)
    for uid, seq in by_user.items():
        seq.sort()
        for (_, _, a), (_, _, b) in zip(seq, seq[1:]):
            counts[(a, b)] += 1
            per_user[uid].append((a, b))
    totals: dict = defaultdict(int)
    for (a, _b), n in counts.items():
        totals[a] += n
    sur = {
        (a, b): _lmilli(totals[a]) - _lmilli(n) for (a, b), n in counts.items()
    }
    scored = []
    for uid, trs in per_user.items():
        if len(trs) < SURPRISAL_MIN_TRANSITIONS:
            continue
        s = sum(sur[t] for t in trs)
        scored.append(
            (uid, len(trs), float(_round_half_up(s / (len(trs) * 1000.0), 6)))
        )
    exp = sorted(scored, key=lambda r: (-r[2], r[0]))[:SURPRISAL_TOPK]
    got = [
        (r["user_id"], r["n_transitions"], r["avg_surprisal_nats"])
        for r in _run(spark, sf_dir, "events_user_transition_surprisal")
    ]
    assert got == exp
    assert len(got) == SURPRISAL_TOPK  # the floor must leave enough users


def test_knn_label_confusion_recount(spark, sf_dir):
    """Replays the VOTE/ARGMAX/MATRIX layers sequentially on top of the
    engine's own graph edges (the graph itself is pinned bit-exact by its
    oracle twin and the emb_knn_recall gate) and cross-checks coverage
    against the vertex set."""
    emb = pq.read_table(f"{sf_dir}/embeddings.parquet").to_pylist()
    label = {e["vec_id"]: e["label"] for e in emb}
    edges = [
        (r["vec_id"], r["neighbor_id"])
        for r in _run(spark, sf_dir, "emb_knn_graph")
    ]
    votes: dict = defaultdict(lambda: defaultdict(int))
    for v, nb in edges:
        votes[v][label[nb]] += 1
    conf: dict = defaultdict(int)
    for v, lv in votes.items():
        pred = min(lv, key=lambda lb: (-lv[lb], lb))
        conf[(label[v], pred)] += 1
    got = {
        (r["true_label"], r["pred_label"]): r["n_vecs"]
        for r in _run(spark, sf_dir, "emb_knn_label_confusion")
    }
    assert got == dict(conf)
    # coverage: the matrix counts exactly the graph's vertex set
    assert sum(got.values()) == len({v for v, _ in edges})
    # The synthetic fixture's labels are UNCORRELATED with embedding
    # geometry (measured: leave-one-out accuracy ≈ 1/|labels| at every
    # sf), so the gate's honest answer here is "labels are not
    # cosine-separable" — assert the matrix is well-formed and spread
    # over many cells rather than concentrated on the diagonal.
    n_labels = len(set(label.values()))
    assert len(got) > n_labels  # off-diagonal mass exists
    assert all(n > 0 for n in got.values())


def _python_lpa(edges: list[tuple[int, int]], rounds: int) -> dict[int, int]:
    """Sequential synchronous LPA with the frozen total-order tie-break."""
    und = set()
    for u, v in edges:
        und.add((u, v))
        und.add((v, u))
    nbrs: dict = defaultdict(list)
    for s, d in und:
        nbrs[d].append(s)
    lb = {n: n for n in nbrs}
    for _ in range(rounds):
        new = {}
        for n, ns in nbrs.items():
            c: dict = defaultdict(int)
            for s in ns:
                c[lb[s]] += 1
            new[n] = min(c, key=lambda l: (-c[l], l))
        lb = new
    return lb


def test_label_propagation_recount(spark, sf_dir):
    from yanwenxian_week3_data_pipeline_spark.constants import LPA_ROUNDS, LPA_TOPK

    li = pq.read_table(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
    ).to_pylist()
    by_order: dict = defaultdict(set)
    for r in li:
        by_order[r["l_orderkey"]].add(r["l_partkey"])
    edges = set()
    for parts in by_order.values():
        ps = sorted(parts)
        for i, a in enumerate(ps):
            for b in ps[i + 1 :]:
                edges.add((a, b))
    lb = _python_lpa(sorted(edges), LPA_ROUNDS)
    sizes: dict = defaultdict(int)
    for _n, l in lb.items():
        sizes[l] += 1
    exp = sorted(((-(n), l) for l, n in sizes.items()))[:LPA_TOPK]
    exp = [(l, -negn) for negn, l in exp]
    got = [
        (r["community"], r["n_members"])
        for r in _run(spark, sf_dir, "graph_label_propagation")
    ]
    assert got == exp


def test_label_propagation_two_cliques(spark):
    """The algorithmic property: two 4-cliques bridged by one edge settle
    into two communities labeled by each clique's smallest node."""
    from yanwenxian_week3_data_pipeline_spark.operators.graphstats import (
        label_propagation,
    )

    c1 = [(a, b) for a in range(4) for b in range(4) if a < b]
    c2 = [(a, b) for a in range(10, 14) for b in range(10, 14) if a < b]
    edges = c1 + c2 + [(3, 10)]
    df = spark.createDataFrame(edges, "u long, v long")
    got = {
        r["node"]: r["community"]
        for r in label_propagation(df, rounds=4).collect()
    }
    assert got == _python_lpa(edges, 4)
    assert {got[n] for n in range(4)} == {0}
    assert {got[n] for n in range(10, 14)} == {10}


def test_rfm_segments_recount(spark, sf_dir):
    from yanwenxian_week3_data_pipeline_spark.plans.analytic_ext import RFM_FRACTIONS

    ev = pq.read_table(f"{sf_dir}/events.parquet").to_pylist()
    per: dict = {}
    for e in ev:
        uid = e["user_id"]
        v = Decimal(repr(e["value"])).quantize(
            Decimal("0.000001"), ROUND_HALF_UP
        )
        if uid not in per:
            per[uid] = [e["ts"], 0, Decimal(0)]
        per[uid][0] = max(per[uid][0], e["ts"])
        per[uid][1] += 1
        per[uid][2] += v
    anchor = max(p[0] for p in per.values()).date()
    rows = [
        (uid, (anchor - p[0].date()).days, p[1], p[2]) for uid, p in per.items()
    ]
    n = len(rows)

    def cuts(idx: int) -> list:
        vals = sorted(r[idx] for r in rows)
        return [vals[(n * num + den - 1) // den - 1] for num, den in RFM_FRACTIONS]

    cr, cf, cm = cuts(1), cuts(2), cuts(3)

    def score(x, cs) -> int:
        return 1 + sum(1 for c in cs if x > c)

    seg: dict = defaultdict(lambda: [0, Decimal(0)])
    for _uid, r, f, m in rows:
        k = (score(r, cr), score(f, cf), score(m, cm))
        seg[k][0] += 1
        seg[k][1] += m
    got = {
        (r["r_score"], r["f_score"], r["m_score"]): (r["n_users"], r["total_value"])
        for r in _run(spark, sf_dir, "events_rfm_segments")
    }
    # canonical_projection casts the final decimal to double (one
    # correctly-rounded cast — float(Decimal) is the same rounding)
    assert got == {k: (v[0], float(v[1])) for k, v in seg.items()}
    assert sum(v[0] for v in seg.values()) == n  # every user lands in a segment


def test_lpa_modularity_recount(spark, sf_dir):
    from yanwenxian_week3_data_pipeline_spark.constants import LPA_ROUNDS

    li = pq.read_table(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
    ).to_pylist()
    by_order: dict = defaultdict(set)
    for r in li:
        by_order[r["l_orderkey"]].add(r["l_partkey"])
    edges = set()
    for parts in by_order.values():
        ps = sorted(parts)
        for i, a in enumerate(ps):
            for b in ps[i + 1 :]:
                edges.add((a, b))
    lb = _python_lpa(sorted(edges), LPA_ROUNDS)
    m = len(edges)
    intra = sum(1 for u, v in edges if lb[u] == lb[v])
    deg: dict = defaultdict(int)
    for u, v in edges:
        deg[u] += 1
        deg[v] += 1
    dc: dict = defaultdict(int)
    for n_, d_ in deg.items():
        dc[lb[n_]] += d_
    sd2 = sum(d * d for d in dc.values())
    q = float(_round_half_up((4 * m * intra - sd2) / float(4 * m * m), 6))
    [r] = _run(spark, sf_dir, "graph_lpa_modularity")
    assert (r["n_communities"], r["n_edges"], r["modularity"]) == (len(dc), m, q)
    assert -0.5 <= r["modularity"] <= 1.0  # Q's mathematical range


def test_link_prediction_recount(spark, sf_dir):
    from yanwenxian_week3_data_pipeline_spark.constants import (
        LINKPRED_HUB_CAP,
        LINKPRED_TOPK,
    )

    li = pq.read_table(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
    ).to_pylist()
    by_order: dict = defaultdict(set)
    for r in li:
        by_order[r["l_orderkey"]].add(r["l_partkey"])
    edges = set()
    for parts in by_order.values():
        ps = sorted(parts)
        for i, a in enumerate(ps):
            for b in ps[i + 1 :]:
                edges.add((a, b))
    nbrs: dict = defaultdict(set)
    for u, v in edges:
        nbrs[u].add(v)
        nbrs[v].add(u)
    cn: dict = defaultdict(int)
    for apex, ns in nbrs.items():
        if len(ns) > LINKPRED_HUB_CAP:
            continue
        ss = sorted(ns)
        for i, a in enumerate(ss):
            for b in ss[i + 1 :]:
                if (a, b) not in edges:
                    cn[(a, b)] += 1
    scored = [
        (
            u,
            v,
            c,
            float(_round_half_up(c / (len(nbrs[u]) + len(nbrs[v]) - c), 6)),
        )
        for (u, v), c in cn.items()
    ]
    exp = sorted(scored, key=lambda r: (-r[3], r[0], r[1]))[:LINKPRED_TOPK]
    got = [
        (r["u"], r["v"], r["common_neighbors"], r["jaccard"])
        for r in _run(spark, sf_dir, "graph_link_prediction")
    ]
    assert got == exp
    assert len(got) == LINKPRED_TOPK


def test_attribution_last_touch_recount(spark, sf_dir):
    from yanwenxian_week3_data_pipeline_spark.plans.analytic_ext import (
        ATTR_WINDOW_DAYS,
    )

    ev = pq.read_table(f"{sf_dir}/events.parquet").to_pylist()
    by_user: dict = defaultdict(list)
    for e in ev:
        by_user[e["user_id"]].append(e)
    seg: dict = defaultdict(lambda: [0, Decimal(0)])
    for seq in by_user.values():
        seq.sort(key=lambda e: (e["ts"], e["event_id"]))
        touch = None
        for e in seq:
            if e["event_type"] == "purchase":
                if (
                    touch is not None
                    and (e["ts"].date() - touch["ts"].date()).days
                    <= ATTR_WINDOW_DAYS
                ):
                    ch = touch["event_type"]
                else:
                    ch = "direct"
                seg[ch][0] += 1
                seg[ch][1] += Decimal(repr(e["value"])).quantize(
                    Decimal("0.000001"), ROUND_HALF_UP
                )
            else:
                touch = e
    got = {
        r["channel"]: (r["n_purchases"], r["total_value"])
        for r in _run(spark, sf_dir, "events_attribution_last_touch")
    }
    assert got == {k: (v[0], float(v[1])) for k, v in seg.items()}
    assert sum(v[0] for v in got.values()) == sum(
        1 for e in ev if e["event_type"] == "purchase"
    )


def test_top_paths_recount(spark, sf_dir):
    from yanwenxian_week3_data_pipeline_spark.plans.analytic_ext import (
        PATH_GAP_MINUTES,
        PATH_PREFIX_LEN,
        PATH_TOPK,
    )

    ev = pq.read_table(f"{sf_dir}/events.parquet").to_pylist()
    by_user: dict = defaultdict(list)
    for e in ev:
        by_user[e["user_id"]].append(e)
    paths: dict = defaultdict(int)
    for seq in by_user.values():
        seq.sort(key=lambda e: (e["ts"], e["event_id"]))
        sessions: list = []
        prev_ts = None
        for e in seq:
            if (
                prev_ts is None
                or (e["ts"] - prev_ts).total_seconds() > PATH_GAP_MINUTES * 60
            ):
                sessions.append([])
            sessions[-1].append(e["event_type"])
            prev_ts = e["ts"]
        for s in sessions:
            paths[">".join(s[:PATH_PREFIX_LEN])] += 1
    exp = sorted(((-(n), p) for p, n in paths.items()))[:PATH_TOPK]
    exp = [(p, -negn) for negn, p in exp]
    got = [
        (r["path"], r["n_sessions"])
        for r in _run(spark, sf_dir, "events_top_paths")
    ]
    assert got == exp
    assert len(got) == PATH_TOPK


def test_distinctive_terms_recount(spark, sf_dir, documents):
    from yanwenxian_week3_data_pipeline_spark.plans.curation_ext import (
        LIFT_MIN_COUNT,
        LIFT_TOPK_PER_SOURCE,
    )

    cts: dict = defaultdict(int)
    for d in documents:
        for t in _tokens(d["text"]):
            cts[(d["source"], t)] += 1
    ct: dict = defaultdict(int)
    tst: dict = defaultdict(int)
    for (s, t), n in cts.items():
        ct[t] += n
        tst[s] += n
    t_all = sum(cts.values())
    per_source: dict = defaultdict(list)
    for (s, t), n in cts.items():
        if n < LIFT_MIN_COUNT:
            continue
        lift = (n / ct[t]) * (t_all / tst[s])
        per_source[s].append((-lift, t, n))
    exp = []
    for s in per_source:
        for negl, t, n in sorted(per_source[s])[:LIFT_TOPK_PER_SOURCE]:
            exp.append((s, t, n, float(_round_half_up(-negl, 6))))
    got = [
        (r["source"], r["term"], r["n_in_source"], r["lift"])
        for r in _run(spark, sf_dir, "docs_distinctive_terms_by_source")
    ]
    assert sorted(got) == sorted(exp)
    assert len({s for s, *_ in got}) == len(per_source)  # every source covered
    assert all(lift >= 1.0 or n > 0 for *_xs, n, lift in got)


def _python_pca(rows: list[tuple[int, list[int]]], rounds: int) -> dict[int, int]:
    """Sequential integer power-iteration replay (operators/pca_power.py
    recurrence: n-scaled centering, non-negative-div renormalization)."""
    from yanwenxian_week3_data_pipeline_spark.operators.pca_power import (
        PCA_RESCALE,
        PCA_XV_RESCALE,
    )

    n = len(rows)
    nd = len(rows[0][1])
    s = [sum(q[d] for _v, q in rows) for d in range(nd)]
    u = {v: [n * q[d] - s[d] for d in range(nd)] for v, q in rows}
    v = [PCA_RESCALE] * nd
    for _ in range(rounds):
        xv = {vid: sum(uv[d] * v[d] for d in range(nd)) for vid, uv in u.items()}
        mx = max(abs(x) for x in xv.values())
        xs = {
            vid: (-1 if x < 0 else 1) * ((abs(x) * PCA_XV_RESCALE) // mx)
            for vid, x in xv.items()
        }
        y = [sum(uv[d] * xs[vid] for vid, uv in u.items()) for d in range(nd)]
        my = max(abs(x) for x in y)
        v = [(-1 if x < 0 else 1) * ((abs(x) * PCA_RESCALE) // my) for x in y]
    return dict(enumerate(v))


def test_pca_power_iteration_recount(spark, sf_dir):
    from yanwenxian_week3_data_pipeline_spark.operators.kmeans_exact import KM_SCALE
    from yanwenxian_week3_data_pipeline_spark.operators.pca_power import PCA_RESCALE
    from yanwenxian_week3_data_pipeline_spark.plans.curation_ext import PCA_ROUNDS

    emb = pq.read_table(f"{sf_dir}/embeddings.parquet").to_pylist()
    rows = [
        (
            e["vec_id"],
            [int(math.floor(float(x) * KM_SCALE + 0.5)) for x in e["embedding"]],
        )
        for e in emb
    ]
    v = _python_pca(rows, PCA_ROUNDS)
    got = {
        r["dim"]: r["loading"]
        for r in _run(spark, sf_dir, "emb_pca_power_iteration")
    }
    assert got == {d: x / PCA_RESCALE for d, x in v.items()}
    # a direction, not a degenerate vector: the renormalization pins the
    # max-|component| at exactly +-1.0
    assert max(abs(x) for x in got.values()) == 1.0


def test_pca_power_finds_planted_axis(spark):
    """Algorithmic property: on a cloud stretched along a planted axis,
    the integer power iteration's loading aligns with that axis."""
    import random

    from yanwenxian_week3_data_pipeline_spark.operators.pca_power import (
        pca_top_component,
    )

    rng = random.Random(5)
    nd = 8
    axis = [1.0 if d == 3 else 0.0 for d in range(nd)]
    rows = []
    for i in range(300):
        t = rng.uniform(-1, 1)
        vec = [t * axis[d] + rng.uniform(-0.05, 0.05) for d in range(nd)]
        rows.append((i, vec))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {r["dim"]: r["loading"] for r in pca_top_component(df, rounds=5).collect()}
    num = sum(got[d] * axis[d] for d in range(nd))
    den = math.sqrt(sum(x * x for x in got.values()))
    assert abs(num) / den > 0.95


def test_bfs_distances_recount(spark, sf_dir):
    from yanwenxian_week3_data_pipeline_spark.plans.graph_ext import BFS_ROUNDS

    li = pq.read_table(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
    ).to_pylist()
    by_order: dict = defaultdict(set)
    for r in li:
        by_order[r["l_orderkey"]].add(r["l_partkey"])
    nbrs: dict = defaultdict(set)
    for parts in by_order.values():
        ps = sorted(parts)
        for i, a in enumerate(ps):
            for b in ps[i + 1 :]:
                nbrs[a].add(b)
                nbrs[b].add(a)
    seed = min(nbrs)
    dist = {seed: 0}
    frontier = {seed}
    for r in range(1, BFS_ROUNDS + 1):
        nxt = set()
        for n_ in frontier:
            nxt |= nbrs[n_]
        nxt -= dist.keys()
        for n_ in nxt:
            dist[n_] = r
        frontier = nxt
    hist: dict = defaultdict(int)
    for d_ in dist.values():
        hist[d_] += 1
    got = {
        r["dist"]: r["n_nodes"] for r in _run(spark, sf_dir, "graph_bfs_distances")
    }
    assert got == dict(hist)
    assert got[0] == 1  # the seed
    assert sum(got.values()) <= len(nbrs)


def test_pca_variance_explained_recount(spark, sf_dir):
    """Sequential replay of the variance-share reduction
    (operators/pca_power.py:pca_variance_explained): same centering +
    iteration as _python_pca, then the normalized Rayleigh-quotient
    chain — N = Σxn², T = Σus², r = (mx·10⁶)//umax, three exact floor
    divisions — in arbitrary-precision Python ints."""
    from yanwenxian_week3_data_pipeline_spark.operators.kmeans_exact import KM_SCALE
    from yanwenxian_week3_data_pipeline_spark.operators.pca_power import PCA_RESCALE
    from yanwenxian_week3_data_pipeline_spark.plans.curation_ext import PCA_ROUNDS

    emb = pq.read_table(f"{sf_dir}/embeddings.parquet").to_pylist()
    rows = [
        (
            e["vec_id"],
            [int(math.floor(float(x) * KM_SCALE + 0.5)) for x in e["embedding"]],
        )
        for e in emb
    ]
    n = len(rows)
    nd = len(rows[0][1])
    s = [sum(q[d] for _v, q in rows) for d in range(nd)]
    u = {v: [n * q[d] - s[d] for d in range(nd)] for v, q in rows}
    pv = _python_pca(rows, PCA_ROUNDS)  # one full iteration, not nd of them
    vv = [pv[d] for d in range(nd)]

    xv = {vid: sum(uv[d] * vv[d] for d in range(nd)) for vid, uv in u.items()}
    mx = max(abs(x) for x in xv.values())
    umax = max(abs(ud) for uv in u.values() for ud in uv)
    big_n = sum(((abs(x) * PCA_RESCALE) // mx) ** 2 for x in xv.values())
    big_t = sum(
        ((abs(ud) * PCA_RESCALE) // umax) ** 2 for uv in u.values() for ud in uv
    )
    v2 = sum(x * x for x in vv)
    r = (mx * PCA_RESCALE) // umax
    s2 = (r * r * 10**9) // v2
    s3 = (s2 * 10**9) // big_t
    share_micro = (s3 * (big_n // 10**4)) // 10**20

    [row] = _run(spark, sf_dir, "emb_pca_variance_explained")
    assert (row["n_vecs"], row["n_dims"]) == (n, nd)
    assert row["variance_share"] == share_micro / PCA_RESCALE
    # a top component must explain at least 1/nd of the variance (it
    # beats the average direction by definition) and at most all of it
    assert 1.0 / nd <= row["variance_share"] <= 1.0 + 1e-9


def test_pca_variance_degenerate_inputs(spark):
    """r7 ADVICE: empty / all-identical inputs raise clearly instead of
    propagating NULL loadings."""
    import pytest as _pytest

    from yanwenxian_week3_data_pipeline_spark.operators.pca_power import (
        pca_top_component,
        pca_variance_explained,
    )

    empty = spark.createDataFrame([], "vec_id long, embedding array<float>")
    with _pytest.raises(ValueError, match="empty embedding table"):
        pca_top_component(empty)
    with _pytest.raises(ValueError, match="empty embedding table"):
        pca_variance_explained(empty)

    same = spark.createDataFrame(
        [(i, [0.25, -0.5, 0.125]) for i in range(8)],
        "vec_id long, embedding array<float>",
    )
    with _pytest.raises(ValueError, match="all embeddings identical"):
        pca_top_component(same)
    with _pytest.raises(ValueError, match="all embeddings identical"):
        pca_variance_explained(same)

    # r8 ADVICE: a NULL/empty embedding row desyncs n between the
    # centering (count() keeps it) and the exploded matrix (posexplode
    # drops it) — AND between the Spark and DuckDB twins. Refuse loudly.
    holey = spark.createDataFrame(
        [(0, [0.1, 0.2]), (1, None), (2, [0.3, 0.4]), (3, [])],
        "vec_id long, embedding array<float>",
    )
    with _pytest.raises(ValueError, match="NULL/empty"):
        pca_top_component(holey)
    with _pytest.raises(ValueError, match="NULL/empty"):
        pca_variance_explained(holey)

    # r9 ADVICE: a NULL ELEMENT inside an array is the third variant of the
    # same class — floor(NULL) would null-poison the dim sums silently.
    ragged = spark.createDataFrame(
        [(0, [0.1, 0.2]), (1, [0.3, None]), (2, [0.5, 0.6])],
        "vec_id long, embedding array<float>",
    )
    with _pytest.raises(ValueError, match="NULL-element"):
        pca_top_component(ragged)
    with _pytest.raises(ValueError, match="NULL-element"):
        pca_variance_explained(ragged)
