"""BPE learning, CCNet perplexity bucketing, triangle census, and the
factored exact-rank-cuts helper. The oracle sweep certifies cross-engine
equality; these pin behavior against independent pure-Python third
implementations (the A-ES / pagerank discipline) plus the algebraic
invariants."""

from __future__ import annotations

import random
from collections import Counter, defaultdict

import pytest
from pyspark.sql import functions as F

from yanwenxian_week3_data_pipeline_spark.operators.bpe import (
    END_MARK,
    bpe_learn,
    bpe_oracle_sql,
)
from yanwenxian_week3_data_pipeline_spark.operators.quantiles import (
    exact_rank_cuts,
)


# ---------------------------------------------------------------------------
# pure-Python reference BPE (sequential greedy — no window algebra)
# ---------------------------------------------------------------------------

def _py_greedy_pairs(syms: list[str]) -> list[tuple[str, str]]:
    """PER-PAIR greedy non-overlapping occurrences — for each pair
    independently, the number of merges applying it alone would produce
    (the operator's documented semantics): every occurrence for x != y,
    odd-trailing-run occurrences for x == y."""
    out, run = [], 1
    for i in range(len(syms) - 1):
        run = run + 1 if i > 0 and syms[i] == syms[i - 1] else 1
        if syms[i] != syms[i + 1] or run % 2 == 1:
            out.append((syms[i], syms[i + 1]))
    return out


def _py_apply(syms: list[str], x: str, y: str) -> list[str]:
    out, i = [], 0
    while i < len(syms):
        if i < len(syms) - 1 and syms[i] == x and syms[i + 1] == y:
            out.append(x + y)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def _py_bpe(words: list[tuple[str, int]], n_merges: int):
    vocab = {w: ([*w, END_MARK], c) for w, c in words}
    merges = []
    for it in range(1, n_merges + 1):
        counts: Counter = Counter()
        for syms, c in vocab.values():
            for p in _py_greedy_pairs(syms):
                counts[p] += c
        if not counts:
            break
        (x, y), c = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((it, x, y, x + y, c))
        vocab = {
            w: (_py_apply(s, x, y), cnt) for w, (s, cnt) in vocab.items()
        }
    return merges


def test_bpe_matches_python_reference_random_words(spark):
    rng = random.Random(42)
    words = [
        (
            "".join(rng.choice("abcab") for _ in range(rng.randint(1, 9))),
            rng.randint(1, 9),
        )
        for _ in range(60)
    ]
    # dedup words, summing counts (the real input is a GROUPed table)
    agg: Counter = Counter()
    for w, c in words:
        agg[w] += c
    words = sorted(agg.items())
    wdf = spark.createDataFrame(words, "word string, wcount long")
    got = [tuple(r) for r in bpe_learn(spark, wdf, 8).collect()]
    assert got == _py_bpe(words, 8)


def test_bpe_equal_symbol_run_parity(spark):
    # "aaaa"x3: greedy merges 2 (a,a) pairs per word (run parity), never
    # 3 (the overlap-blind count); then (aa,</w>) and (aa,aa) tie at 3
    # and the byte-order tie-break picks '</w>' < 'aa'
    wdf = spark.createDataFrame([("aaaa", 3)], "word string, wcount long")
    got = [tuple(r) for r in bpe_learn(spark, wdf, 2).collect()]
    assert got[0] == (1, "a", "a", "aa", 6)
    assert got[1] == (2, "aa", END_MARK, "aa" + END_MARK, 3)


def test_bpe_stops_when_no_pairs_left(spark):
    # single-char word: ["a", END] -> one pair, then a single symbol
    wdf = spark.createDataFrame([("a", 5)], "word string, wcount long")
    got = [tuple(r) for r in bpe_learn(spark, wdf, 4).collect()]
    assert got == [(1, "a", END_MARK, "a" + END_MARK, 5)]


def test_bpe_oracle_sql_matches_python_reference():
    import duckdb

    rng = random.Random(7)
    agg: Counter = Counter()
    for _ in range(40):
        agg["".join(rng.choice("xyz") for _ in range(rng.randint(1, 7)))] += (
            rng.randint(1, 5)
        )
    words = sorted(agg.items())
    con = duckdb.connect()
    con.execute("CREATE TABLE w(word VARCHAR, wcount BIGINT)")
    con.executemany("INSERT INTO w VALUES (?, ?)", words)
    got = con.execute(
        bpe_oracle_sql("SELECT word, wcount FROM w", 6)
    ).fetchall()
    assert got == _py_bpe(words, 6)


# ---------------------------------------------------------------------------
# exact_rank_cuts
# ---------------------------------------------------------------------------

def test_exact_rank_cuts_match_sorted_order_statistics(spark):
    rng = random.Random(3)
    vals = [rng.randint(0, 50) for _ in range(977)]
    df = spark.createDataFrame([(v,) for v in vals], "x long")
    fracs = [(1, 4), (1, 2), (3, 4), (9, 10)]
    cuts = {
        r["cut_id"]: r["cut"]
        for r in exact_rank_cuts(df, "x", fracs).collect()
    }
    s = sorted(vals)
    n = len(s)
    for i, (num, den) in enumerate(fracs, start=1):
        rank = max(1, (n * num + den - 1) // den)
        assert cuts[i] == s[rank - 1], (i, num, den)


def test_exact_rank_cuts_independent_of_partitioning(spark):
    vals = list(range(100)) * 3
    df1 = spark.createDataFrame([(v,) for v in vals], "x long").repartition(1)
    df7 = spark.createDataFrame([(v,) for v in vals], "x long").repartition(7)
    f = [(1, 3), (2, 3)]
    c1 = sorted(map(tuple, exact_rank_cuts(df1, "x", f).collect()))
    c7 = sorted(map(tuple, exact_rank_cuts(df7, "x", f).collect()))
    assert c1 == c7


# ---------------------------------------------------------------------------
# CCNet perplexity buckets — statistical behavior + tertile invariant
# ---------------------------------------------------------------------------

def test_ccnet_buckets_tertile_sizes_and_score_sanity(spark, sf_dir):
    from yanwenxian_week3_data_pipeline_spark.plans.lm_ext import (
        _q_ccnet_buckets,
    )

    rows = _q_ccnet_buckets(spark, sf_dir).collect()
    n = len(rows)
    assert n > 0
    sizes = Counter(r["bucket"] for r in rows)
    # value-based cuts put boundary ties in the lower bucket, so exact
    # thirds are not guaranteed — but each bucket must be within a loose
    # band and all three present on real data
    assert set(sizes) == {"head", "middle", "tail"}
    for b in sizes:
        assert sizes[b] >= n // 6, (b, sizes)
    # scores are positive (negative log-probs) and avg consistent
    for r in rows[:50]:
        assert r["nlp_micro"] > 0
        assert r["avg_micro"] == r["nlp_micro"] // r["n_bigrams"]
    # bucket ordering respects the score: max(head) <= min(tail)
    head_max = max(r["avg_micro"] for r in rows if r["bucket"] == "head")
    tail_min = min(r["avg_micro"] for r in rows if r["bucket"] == "tail")
    assert head_max <= tail_min


# ---------------------------------------------------------------------------
# triangle census — pure-Python reference on the fixture
# ---------------------------------------------------------------------------

def test_triangles_match_python_reference(spark, sf_dir):
    import duckdb

    from yanwenxian_week3_data_pipeline_spark.plans.graph_ext import (
        _TRI_MIN_SUPPORT,
        _q_triangles_copurchase,
    )

    got = _q_triangles_copurchase(spark, sf_dir).collect()[0]

    # Edge support counts ORDERS: build baskets as part SETS per order in
    # plain Python (duplicate part lines within an order must not inflate
    # support — the r4 bug), then count pair co-occurrence per basket.
    from collections import Counter
    from itertools import combinations

    con = duckdb.connect()
    rows = con.execute(
        f"""SELECT l_orderkey, list(DISTINCT l_partkey)
            FROM read_parquet('{sf_dir}/lineitem.parquet')
            GROUP BY l_orderkey"""
    ).fetchall()
    sup: Counter = Counter()
    for _okey, parts in rows:
        for p in combinations(sorted(parts), 2):
            sup[p] += 1
    pairs = [p for p, n in sup.items() if n >= _TRI_MIN_SUPPORT]
    adj: dict[int, set[int]] = {}
    for u, v in pairs:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    n_edges = len(pairs)
    n_nodes = len(adj)
    n_wedges = sum(len(s) * (len(s) - 1) // 2 for s in adj.values())
    # each triangle is counted once per edge -> divide by 3
    tri = sum(len(adj[u] & adj[v]) for u, v in pairs)
    assert tri % 3 == 0
    tri //= 3

    assert got["n_nodes"] == n_nodes
    assert got["n_edges"] == n_edges
    assert got["n_wedges"] == n_wedges
    assert got["n_triangles"] == tri
    assert got["capped"] is False
    assert got["n_wedges_dropped"] == 0
    if n_wedges:
        assert got["transitivity"] == pytest.approx(3 * tri / n_wedges)


def test_triangle_census_hub_cap_accounting(spark):
    """Capped census on a hub graph: n_triangles counts exactly the
    triangles whose orientation-minimal apex is under the cap, and
    n_wedges_dropped is the exact Σ C(d_out, 2) over hot apexes —
    recounted here with a sequential oriented-adjacency reference."""
    import random

    from yanwenxian_week3_data_pipeline_spark.operators.graphstats import (
        triangle_census,
    )

    rng = random.Random(5)
    n = 60
    edges = {(0, v) for v in range(1, 46)}  # hub: node 0 touches 45 nodes
    while len(edges) < 220:
        a, b = rng.randrange(n), rng.randrange(n)
        if a != b:
            edges.add((min(a, b), max(a, b)))
    cap = 6
    df = spark.createDataFrame(sorted(edges), "u long, v long").localCheckpoint()
    got = triangle_census(df, hub_cap=cap).collect()[0]
    exact = triangle_census(df).collect()[0]

    deg = defaultdict(int)
    for u, v in edges:
        deg[u] += 1
        deg[v] += 1
    out = defaultdict(set)
    for u, v in edges:
        a, b = ((u, v) if (deg[u], u) < (deg[v], v) else (v, u))
        out[a].add(b)
    o_edges = {(a, b) for a, s in out.items() for b in s}
    hot = {a for a, s in out.items() if len(s) > cap}
    dropped = sum(len(out[a]) * (len(out[a]) - 1) // 2 for a in hot)
    tri_capped = tri_all = 0
    for a, s in out.items():
        for b in s:
            for c in s:
                if b < c and ((b, c) in o_edges or (c, b) in o_edges):
                    tri_all += 1
                    if a not in hot:
                        tri_capped += 1

    assert exact["n_triangles"] == tri_all
    assert got["n_triangles"] == tri_capped
    assert got["capped"] is True
    assert got["n_wedges_dropped"] == dropped
    assert got["n_wedges"] == exact["n_wedges"]  # wedge COUNT stays exact


# ---------------------------------------------------------------------------
# NB language-ID — independent pure-Python third implementation
# ---------------------------------------------------------------------------

def test_nb_langid_matches_python_reference(spark, sf_dir):
    import hashlib
    import math

    import duckdb

    from yanwenxian_week3_data_pipeline_spark.constants import (
        NB_BUCKETS,
        NB_SPLIT_SEED,
    )
    from yanwenxian_week3_data_pipeline_spark.plans.documents_domain import (
        CLEAN_SQL,
    )
    from yanwenxian_week3_data_pipeline_spark.plans.lm_ext import (
        _q_nb_langid_confusion,
    )

    got = {
        (r["actual"], r["predicted"]): r["n_docs"]
        for r in _q_nb_langid_confusion(spark, sf_dir).collect()
    }

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf_dir}/documents.parquet')"
    )
    rows = con.execute(
        f"SELECT doc_id, lang, {CLEAN_SQL} FROM documents WHERE lang IS NOT NULL"
    ).fetchall()

    def h60(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    train_counts: dict[tuple[str, int], int] = {}
    t_l: dict[str, int] = {}
    n_l: dict[str, int] = {}
    test_docs = []
    for doc_id, lang, c in rows:
        toks = c.split(" ") if c else []
        if not toks:
            continue
        buckets = [h60(g) % NB_BUCKETS for g in toks]
        if h60(f"{NB_SPLIT_SEED}:{doc_id}") % 2 == 0:
            n_l[lang] = n_l.get(lang, 0) + 1
            for b in buckets:
                train_counts[(lang, b)] = train_counts.get((lang, b), 0) + 1
                t_l[lang] = t_l.get(lang, 0) + 1
        else:
            test_docs.append((doc_id, lang, buckets))

    n_train, n_langs = sum(n_l.values()), len(n_l)
    prior = {
        l: round(math.log((n + 1) / (n_train + n_langs)) * 1e6)
        for l, n in n_l.items()
    }
    exp: dict[tuple[str, str], int] = {}
    for _doc_id, lang, buckets in test_docs:
        best = None
        for cand in sorted(t_l):
            s = prior[cand] + sum(
                round(
                    math.log(
                        (train_counts.get((cand, b), 0) + 1)
                        / (t_l[cand] + NB_BUCKETS)
                    )
                    * 1e6
                )
                for b in buckets
            )
            if best is None or s > best[0]:
                best = (s, cand)
        exp[(lang, best[1])] = exp.get((lang, best[1]), 0) + 1

    assert got == exp


def test_nb_langid_beats_majority_class(spark, sf_dir):
    rows = []
    from yanwenxian_week3_data_pipeline_spark.plans.lm_ext import (
        _q_nb_langid_confusion,
    )

    rows = _q_nb_langid_confusion(spark, sf_dir).collect()
    total = sum(r["n_docs"] for r in rows)
    correct = sum(r["n_docs"] for r in rows if r["actual"] == r["predicted"])
    per_actual: dict[str, int] = {}
    for r in rows:
        per_actual[r["actual"]] = per_actual.get(r["actual"], 0) + r["n_docs"]
    majority = max(per_actual.values())
    assert correct >= majority, (correct, majority, total)


# ---------------------------------------------------------------------------
# Count-Min Sketch — pure-Python third implementation + guarantee
# ---------------------------------------------------------------------------

def test_cms_matches_python_reference(spark, sf_dir):
    import hashlib

    import duckdb

    from yanwenxian_week3_data_pipeline_spark.constants import (
        CMS_DEPTH,
        CMS_SEED,
        CMS_TOPK,
        CMS_WIDTH,
    )
    from yanwenxian_week3_data_pipeline_spark.plans.documents_domain import (
        CLEAN_SQL,
    )
    from yanwenxian_week3_data_pipeline_spark.plans.lm_ext import (
        _q_cms_token_counts,
    )

    got = {r["tok"]: tuple(r)[1:] for r in _q_cms_token_counts(spark, sf_dir).collect()}

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf_dir}/documents.parquet')"
    )
    rows = con.execute(f"SELECT {CLEAN_SQL} FROM documents").fetchall()

    def h60(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    exact: Counter = Counter()
    grid: Counter = Counter()
    for (c,) in rows:
        for tok in (c.split(" ") if c else []):
            exact[tok] += 1
            for r in range(CMS_DEPTH):
                grid[(r, h60(f"{CMS_SEED + r}:{tok}") % CMS_WIDTH)] += 1

    top = sorted(exact.items(), key=lambda kv: (-kv[1], kv[0]))[:CMS_TOPK]
    exp = {}
    for tok, n in top:
        est = min(
            grid[(r, h60(f"{CMS_SEED + r}:{tok}") % CMS_WIDTH)]
            for r in range(CMS_DEPTH)
        )
        exp[tok] = (n, est, est - n, est >= n)
    assert got == exp
    assert all(v[3] for v in got.values())  # one-sided guarantee


# ---------------------------------------------------------------------------
# k-core — sequential Python peel on the fixture
# ---------------------------------------------------------------------------

def test_kcore_matches_python_full_peel(spark, sf_dir):
    import duckdb

    from yanwenxian_week3_data_pipeline_spark.constants import KCORE_K
    from yanwenxian_week3_data_pipeline_spark.plans.graph_ext import (
        _q_kcore_copurchase,
    )

    got = _q_kcore_copurchase(spark, sf_dir).collect()[0]

    con = duckdb.connect()
    edges = set(
        con.execute(
            f"""SELECT DISTINCT a.l_partkey, b.l_partkey
                FROM read_parquet('{sf_dir}/lineitem.parquet') a
                JOIN read_parquet('{sf_dir}/lineitem.parquet') b
                  ON a.l_orderkey = b.l_orderkey
                 AND a.l_partkey < b.l_partkey"""
        ).fetchall()
    )
    # full peel to TRUE fixpoint (no round cap)
    while True:
        deg: Counter = Counter()
        for u, v in edges:
            deg[u] += 1
            deg[v] += 1
        alive = {n for n, d in deg.items() if d >= KCORE_K}
        nxt = {(u, v) for u, v in edges if u in alive and v in alive}
        if nxt == edges:
            break
        edges = nxt
    deg = Counter()
    for u, v in edges:
        deg[u] += 1
        deg[v] += 1

    # the bounded-round query must have converged on the fixture, and at
    # the fixpoint it equals the exact k-core
    assert got["converged"] is True
    assert got["n_core_nodes"] == len(deg)
    assert got["n_core_edges"] == len(edges)


# ---------------------------------------------------------------------------
# product quantization — python reference on a tiny synthetic set +
# clustered-fixture behavior
# ---------------------------------------------------------------------------

def test_pq_adc_matches_python_reference(spark):
    from yanwenxian_week3_data_pipeline_spark.operators.pq import (
        pq_adc_recall,
    )

    rng = random.Random(11)
    dim, m, kc, nq, k = 16, 4, 4, 2, 3
    vecs = [
        (i, [rng.uniform(-1, 1) for _ in range(dim)]) for i in range(30)
    ]
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in vecs],
        "vec_id long, embedding array<float>",
    )
    got = {
        r["query_id"]: r["n_overlap"]
        for r in pq_adc_recall(
            df, n_codewords=kc, n_queries=nq, n_sub=m, k=k
        ).collect()
    }

    import struct as _struct

    def f32(x):  # float32 round-trip, matching array<float> storage
        return _struct.unpack("f", _struct.pack("f", x))[0]

    vecs32 = [(i, [f32(x) for x in v]) for i, v in vecs]
    ds = dim // m
    cb = {
        (mm, c): vecs32[c][1][mm * ds : (mm + 1) * ds]
        for mm in range(m)
        for c in range(kc)
    }

    def l2(a, b):
        s = 0.0
        for x, y in zip(a, b):
            s += (x - y) * (x - y)
        return s

    def code(v, mm):
        return min(
            range(kc), key=lambda c: (l2(v[mm * ds : (mm + 1) * ds], cb[(mm, c)]), c)
        )

    exp = {}
    for qid, qv in vecs32[kc : kc + nq]:
        tab = {
            (mm, c): l2(qv[mm * ds : (mm + 1) * ds], cb[(mm, c)])
            for mm in range(m)
            for c in range(kc)
        }
        adc = {
            i: sum(tab[(mm, code(v, mm))] for mm in range(m))
            for i, v in vecs32
            if i != qid
        }
        approx = set(sorted(adc, key=lambda i: (adc[i], i))[:k])
        exact_d = {i: l2(qv, v) for i, v in vecs32 if i != qid}
        exact = set(sorted(exact_d, key=lambda i: (exact_d[i], i))[:k])
        exp[qid] = len(approx & exact)
    assert got == exp


def test_pq_clustered_precision_is_perfect(spark, sf_dir):
    from yanwenxian_week3_data_pipeline_spark.plans.llm_ops import (
        _pq_clustered_precision,
    )

    rows = _pq_clustered_precision(spark, sf_dir).collect()
    assert len(rows) == 5
    assert all(r["cluster_precision"] == 1.0 for r in rows)


# ---------------------------------------------------------------------------
# containment join — planted subset duplicate
# ---------------------------------------------------------------------------

def test_containment_catches_subset_dup_jaccard_misses(spark):
    from yanwenxian_week3_data_pipeline_spark.operators.dedup import (
        dedup_containment,
    )

    small = "alpha beta gamma delta epsilon zeta eta theta"
    filler = " ".join(f"w{i} x{i} y{i}" for i in range(60))
    docs = [
        (1, small),                      # contained doc
        (2, small + " " + filler),       # superset doc
        (3, "totally different words entirely " + " ".join(f"q{i}" for i in range(40))),
    ]
    df = spark.createDataFrame(docs, "doc_id long, c string")
    out = {
        (r["id_a"], r["id_b"]): (r["containment"], r["jaccard"])
        for r in dedup_containment(df, "c", "doc_id", 0.5, 64).collect()
    }
    assert (1, 2) in out
    cont, jac = out[(1, 2)]
    # the small doc is fully contained, but symmetric Jaccard is tiny —
    # exactly the pair the MINHASH_JACCARD_THRESHOLD pipeline misses
    assert cont == 1.0
    assert jac < 0.2
    assert not any(3 in k for k in out)


def test_containment_counting_identity_matches_brute_force(spark):
    """The r11 counting-identity verify (n_inter = n_rare + n_common over
    unique postings, sound c_tot pre-filter) against an independent
    pure-Python brute force, on a corpus engineered to exercise every
    branch: rare shingles (2 <= df <= max_df), common shingles
    (df > max_df, the n_common join), df = 1 shingles (contribute
    nothing), and pairs the pre-filter must keep vs drop."""
    import random

    from yanwenxian_week3_data_pipeline_spark.operators.dedup import (
        dedup_containment,
    )

    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(25)]
    boiler = "the quick brown fox jumps over the lazy dog again"  # df-heavy
    docs = []
    for i in range(30):
        body = " ".join(rng.choice(vocab) for _ in range(rng.randint(6, 40)))
        # half the docs carry the boilerplate run -> its shingles go common
        docs.append((i, (boiler + " " + body) if i % 2 == 0 else body))
    # planted subset pair: doc 100 fully inside doc 101
    core = " ".join(rng.choice(vocab) for _ in range(12))
    docs.append((100, core))
    docs.append((101, core + " " + " ".join(rng.choice(vocab) for _ in range(30))))
    threshold, max_df = 0.5, 3

    def brute(docs):
        k = 3
        sh = {}
        for did, text in docs:
            toks = text.split(" ")
            sh[did] = {
                " ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)
            }
        df_count: dict[str, int] = {}
        for s_set in sh.values():
            for s in s_set:
                df_count[s] = df_count.get(s, 0) + 1
        rare = {s for s, n in df_count.items() if 2 <= n <= max_df}
        out = {}
        ids = sorted(sh)
        for i, ia in enumerate(ids):
            for ib in ids[i + 1 :]:
                inter = sh[ia] & sh[ib]
                if not (inter & rare):
                    continue  # candidate iff >=1 shared RARE shingle
                mn = min(len(sh[ia]), len(sh[ib]))
                cont = len(inter) / mn
                if round(cont, 6) >= threshold:
                    jac = len(inter) / (len(sh[ia]) + len(sh[ib]) - len(inter))
                    out[(ia, ib)] = (cont, jac)
        return out

    expected = brute(docs)
    assert expected, "corpus must produce at least one qualifying pair"
    df = spark.createDataFrame(docs, "doc_id long, c string")
    got = {
        (r["id_a"], r["id_b"]): (r["containment"], r["jaccard"])
        for r in dedup_containment(df, "c", "doc_id", threshold, max_df).collect()
    }
    assert set(got) == set(expected)
    for pair, (cont, jac) in expected.items():
        assert got[pair][0] == pytest.approx(cont, abs=1e-6)
        assert got[pair][1] == pytest.approx(jac, abs=1e-6)
