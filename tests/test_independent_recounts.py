"""Independent pure-Python recounts for count-bearing EXT queries.

The oracle sweep certifies Spark == DuckDB, but both sides are generated
from the SAME recipe, so it proves agreement, not intent (the r4
basket-inflation bug sailed through every ALL MATCH sweep). Every test
here recomputes the query's business counts — orders, users, sessions,
docs — sequentially from the raw parquet with plain Python dicts/sets,
sharing nothing with the Spark expression tree beyond the frozen
constants (thresholds, the md5-prefix hash definition, entity tables),
then asserts exact equality with the registered query's output.
"""

from __future__ import annotations

import hashlib
import re
from collections import defaultdict
from datetime import timedelta
from decimal import ROUND_HALF_UP, Decimal

import pyarrow.parquet as pq
import pytest

from yanwenxian_week3_data_pipeline_spark.constants import (
    HTML_ENTITIES,
    QUALITY_STOPWORDS,
)


def _run(spark, sf_dir, name):
    from yanwenxian_week3_data_pipeline_spark.plans import all_queries

    return all_queries()[name].build(spark, sf_dir).collect()


@pytest.fixture(scope="module")
def events(sf_dir):
    t = pq.read_table(f"{sf_dir}/events.parquet")
    return t.to_pylist()


@pytest.fixture(scope="module")
def documents(sf_dir):
    return pq.read_table(f"{sf_dir}/documents.parquet").to_pylist()


# ---------------------------------------------------------------------------
# Shared pure-Python twins of the frozen scalar definitions. These are
# REIMPLEMENTATIONS from the documented definitions (hash60(s) =
# int(md5(s)[:15], 16); clean = unescape entity table -> collapse ws runs
# -> trim), not calls into the package's Column/SQL builders.
# ---------------------------------------------------------------------------

_WS = re.compile("[ \t\n\r\f\x0b\xa0]+")


def _clean(t: str | None) -> str:
    if t is None:
        return ""
    for ent, ch in HTML_ENTITIES:
        t = t.replace(ent, ch)
    return _WS.sub(" ", t).strip(" ")


def _hash60(s: str, seed: int | None = None) -> int:
    if seed is not None:
        s = f"{seed}:{s}"
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _round_half_up(x: float, places: int) -> Decimal:
    # Spark's round()/cast(double -> decimal) goes through
    # BigDecimal.valueOf, i.e. the SHORTEST decimal representation of the
    # double — Python's repr() is the same shortest round-trip string.
    return Decimal(repr(x)).quantize(Decimal(1).scaleb(-places), ROUND_HALF_UP)


def _quality(c: str) -> tuple[int, Decimal]:
    """(n_tokens, quality_score) twin of quality_features_expr."""
    toks = c.split(" ") if c else []
    n_chars, n_tokens = len(c), len(toks)
    alpha = len(re.sub("[^A-Za-z]", "", c))
    stop_hits = sum(1 for t in toks if t in QUALITY_STOPWORDS)
    nz, nzt = max(n_chars, 1), max(n_tokens, 1)
    alpha_ratio = _round_half_up(alpha / nz, 4)
    stop_ratio = _round_half_up(stop_hits / nzt, 4)
    len_term = min(_round_half_up(n_chars / 500.0, 6), Decimal("1.0"))
    score = (
        len_term * Decimal("0.3")
        + alpha_ratio * Decimal("0.4")
        + stop_ratio * Decimal("0.3")
    ).quantize(Decimal("1e-5"))
    return n_tokens, score


def _grams5(toks: list[str], seed: int) -> set[int]:
    if len(toks) < 5:
        return set()
    return {_hash60(" ".join(toks[i : i + 5]), seed) for i in range(len(toks) - 4)}


# ---------------------------------------------------------------------------
# events_retention_cohorts — cohort week of first activity x weeks-since,
# distinct active users
# ---------------------------------------------------------------------------

def test_retention_cohorts_recount(spark, sf_dir, events):
    got = {
        (r["cohort_week"], r["weeks_since"]): r["n_active"]
        for r in _run(spark, sf_dir, "events_retention_cohorts")
    }

    days = [(e["user_id"], e["ts"].date()) for e in events]
    first = {}
    for u, d in days:
        if u not in first or d < first[u]:
            first[u] = d
    cells = defaultdict(set)
    for u, d in days:
        f = first[u]
        monday = f - timedelta(days=f.weekday())
        cells[(monday, (d - f).days // 7)].add(u)
    exp = {
        (
            __import__("datetime").datetime.combine(monday, __import__("datetime").time()),
            w,
        ): len(users)
        for (monday, w), users in cells.items()
    }
    assert got == exp


# ---------------------------------------------------------------------------
# events_funnel_conversion — signup -> view strictly after -> purchase
# strictly after the first qualifying view
# ---------------------------------------------------------------------------

def test_funnel_conversion_recount(spark, sf_dir, events):
    row = _run(spark, sf_dir, "events_funnel_conversion")[0]

    by_user = defaultdict(list)
    for e in events:
        by_user[e["user_id"]].append((e["ts"], e["event_type"]))
    n_users = len(by_user)
    s1 = s2 = s3 = 0
    for evs in by_user.values():
        signups = [ts for ts, t in evs if t == "signup"]
        if not signups:
            continue
        s1 += 1
        s = min(signups)
        views = [ts for ts, t in evs if t == "view" and ts > s]
        if not views:
            continue
        s2 += 1
        v = min(views)
        if any(t == "purchase" and ts > v for ts, t in evs):
            s3 += 1
    assert (
        row["n_users"],
        row["n_signup"],
        row["n_view_after_signup"],
        row["n_purchase_after_view"],
    ) == (n_users, s1, s2, s3)


# ---------------------------------------------------------------------------
# events_sessionize + events_session_conversion — 30-minute-gap sessions
# ---------------------------------------------------------------------------

def _sessions(events):
    """{(user, seq): [event dict, ...]} with the 30-min strict-gap split."""
    by_user = defaultdict(list)
    for e in events:
        by_user[e["user_id"]].append(e)
    out = {}
    gap = timedelta(minutes=30)
    for u, evs in by_user.items():
        evs.sort(key=lambda e: (e["ts"], e["event_id"]))
        seq = 0
        for i, e in enumerate(evs):
            if i and e["ts"] - evs[i - 1]["ts"] > gap:
                seq += 1
            out.setdefault((u, seq), []).append(e)
    return out


def _dec3(v: float) -> Decimal:
    return _round_half_up(v, 3)


def test_sessionize_recount(spark, sf_dir, events):
    got = {
        (r["user_id"], r["session_seq"]): (
            r["n_events"],
            r["session_start"],
            r["session_end"],
            r["sum_value"],
        )
        for r in _run(spark, sf_dir, "events_sessionize")
    }

    exp = {}
    for key, evs in _sessions(events).items():
        vals = [_dec3(e["value"]) for e in evs if e["value"] is not None]
        exp[key] = (
            len(evs),
            min(e["ts"] for e in evs),
            max(e["ts"] for e in evs),
            # the registered query surfaces the decimal sum as double
            # (dec_as_double house rule); exact decimal -> one float cast
            float(sum(vals)) if vals else None,
        )
    assert got == exp


def test_session_conversion_recount(spark, sf_dir, events):
    row = _run(spark, sf_dir, "events_session_conversion")[0]

    n_sessions = n_with_view = n_converted = 0
    for evs in _sessions(events).values():
        n_sessions += 1
        views = [e["ts"] for e in evs if e["event_type"] == "view"]
        if not views:
            continue
        n_with_view += 1
        v = min(views)
        if any(e["event_type"] == "purchase" and e["ts"] > v for e in evs):
            n_converted += 1
    rate = _round_half_up(n_converted / max(n_with_view, 1), 6)
    assert (
        row["n_sessions"],
        row["n_with_view"],
        row["n_converted"],
        _round_half_up(row["conversion_rate"], 6),
    ) == (n_sessions, n_with_view, n_converted, rate)


# ---------------------------------------------------------------------------
# events_sliding_distinct_users — 15m/5m sliding windows, exact distinct
# ---------------------------------------------------------------------------

def test_sliding_distinct_users_recount(spark, sf_dir, events):
    got = {
        r["window_start"]: r["n_users"]
        for r in _run(spark, sf_dir, "events_sliding_distinct_users")
    }

    from datetime import datetime

    epoch = datetime(1970, 1, 1)
    wins = defaultdict(set)
    for e in events:
        if e["user_id"] is None:
            continue
        secs = int((e["ts"] - epoch).total_seconds())
        base = secs - secs % 300
        for k in range(3):
            wins[epoch + timedelta(seconds=base - 300 * k)].add(e["user_id"])
    assert got == {w: len(u) for w, u in wins.items()}


# ---------------------------------------------------------------------------
# events_audience_overlap — pairwise audience intersection + Jaccard
# ---------------------------------------------------------------------------

def test_audience_overlap_recount(spark, sf_dir, events):
    got = {
        (r["type_a"], r["type_b"]): (r["n_a"], r["n_b"], r["n_both"], r["jaccard"])
        for r in _run(spark, sf_dir, "events_audience_overlap")
    }

    aud = defaultdict(set)
    for e in events:
        if e["event_type"] is not None and e["user_id"] is not None:
            aud[e["event_type"]].add(e["user_id"])
    types = sorted(aud)
    exp = {}
    for i, a in enumerate(types):
        for b in types[i + 1 :]:
            both = len(aud[a] & aud[b])
            if both:
                j = _round_half_up(both / (len(aud[a]) + len(aud[b]) - both), 6)
                exp[(a, b)] = (len(aud[a]), len(aud[b]), both, float(j))
    assert got == exp


# ---------------------------------------------------------------------------
# agg_heavy_hitters_mg — the exact-recount phase: all event types with
# frequency strictly above n/K (counts must be exact, sketch-independent)
# ---------------------------------------------------------------------------

def test_heavy_hitters_mg_recount(spark, sf_dir, events):
    from yanwenxian_week3_data_pipeline_spark.plans.analytic_ext import HH_K

    got = {
        r["event_type"]: (r["n_occurrences"], r["frequency"])
        for r in _run(spark, sf_dir, "agg_heavy_hitters_mg")
    }

    n = len(events)
    counts = defaultdict(int)
    for e in events:
        if e["event_type"] is not None:
            counts[e["event_type"]] += 1
    exp = {
        t: (c, float(_round_half_up(c / n, 6)))
        for t, c in counts.items()
        if c * HH_K > n
    }
    assert got == exp


# ---------------------------------------------------------------------------
# docs_decontaminate — hashed-5-gram overlap of train docs vs bench split
# ---------------------------------------------------------------------------

def _doc_grams(documents):
    from yanwenxian_week3_data_pipeline_spark.plans.llm_ops import DECON_HASH_SEED

    out = {}
    for d in documents:
        c = _clean(d["text"])
        toks = c.split(" ") if c else []
        out[d["doc_id"]] = (
            _hash60(str(d["doc_id"])) % 1000,
            _grams5(toks, DECON_HASH_SEED),
        )
    return out


def test_decontaminate_recount(spark, sf_dir, documents):
    from yanwenxian_week3_data_pipeline_spark.plans.llm_ops import (
        DECON_BENCH_MIN_BUCKET,
        DECON_TRAIN_MAX_BUCKET,
    )

    got = {
        r["doc_id"]: (r["n_hit_grams"], r["n_bench_docs"])
        for r in _run(spark, sf_dir, "docs_decontaminate")
    }

    dg = _doc_grams(documents)
    bench = {
        did: grams for did, (bkt, grams) in dg.items() if bkt >= DECON_BENCH_MIN_BUCKET
    }
    exp = {}
    for did, (bkt, grams) in dg.items():
        if bkt >= DECON_TRAIN_MAX_BUCKET:
            continue
        hit_grams = set()
        hit_docs = set()
        for bid, bgrams in bench.items():
            inter = grams & bgrams
            if inter:
                hit_grams |= inter
                hit_docs.add(bid)
        if hit_docs:
            exp[did] = (len(hit_grams), len(hit_docs))
    assert got == exp


# ---------------------------------------------------------------------------
# docs_training_funnel — cumulative stage-survival counts over the corpus
# ---------------------------------------------------------------------------

def test_training_funnel_recount(spark, sf_dir, documents):
    from yanwenxian_week3_data_pipeline_spark.plans.llm_ops import (
        CURATION_MIN_SCORE,
        CURATION_MIN_TOKENS,
        DECON_BENCH_MIN_BUCKET,
        DECON_TRAIN_MAX_BUCKET,
        FUNNEL_STAGES,
    )

    got = {
        r["stage"]: (r["stage_idx"], r["n_docs"], r["n_tokens"])
        for r in _run(spark, sf_dir, "docs_training_funnel")
    }

    dg = _doc_grams(documents)
    rows = []
    for d in documents:
        c = _clean(d["text"])
        n_tokens, score = _quality(c)
        rows.append((d["doc_id"], c, n_tokens, score, dg[d["doc_id"]][0]))

    min_score = Decimal(CURATION_MIN_SCORE)
    s3 = {
        did
        for did, c, nt, sc, _b in rows
        if c != "" and sc >= min_score and nt >= CURATION_MIN_TOKENS
    }
    # s4: survives exact dedup — the min doc_id among s3 docs sharing the text
    best = {}
    for did, c, *_ in rows:
        if did in s3 and (c not in best or did < best[c]):
            best[c] = did
    s4 = {did for did, c, *_ in rows if did in s3 and best.get(c) == did}
    # contamination: shares a hashed 5-gram with a DIFFERENT bench-bucket doc
    bench = {
        did: grams for did, (bkt, grams) in dg.items() if bkt >= DECON_BENCH_MIN_BUCKET
    }
    contam = set()
    for did, (_bkt, grams) in dg.items():
        if any(bid != did and grams & bgrams for bid, bgrams in bench.items()):
            contam.add(did)
    s5 = s4 - contam
    s6 = {did for did in s5 if dg[did][0] < DECON_TRAIN_MAX_BUCKET}

    flags = [
        {did for did, *_ in rows},
        {did for did, c, *_ in rows if c != ""},
        s3,
        s4,
        s5,
        s6,
    ]
    toks = {did: nt for did, _c, nt, _sc, _b in rows}
    exp = {
        name: (i, len(fl), sum(toks[did] for did in fl))
        for i, (name, fl) in enumerate(zip(FUNNEL_STAGES, flags))
    }
    assert got == exp


# ---------------------------------------------------------------------------
# dedup_exact — duplicate groups over cleaned text
# ---------------------------------------------------------------------------

def test_dedup_exact_recount(spark, sf_dir, documents):
    got = {
        r["keep_id"]: r["n_copies"] for r in _run(spark, sf_dir, "dedup_exact")
    }
    groups = defaultdict(list)
    for d in documents:
        groups[_clean(d["text"])].append(d["doc_id"])
    exp = {min(ids): len(ids) for ids in groups.values()}
    assert got == exp


# ---------------------------------------------------------------------------
# docs_gopher_filter + docs_domain_stats — rule booleans and the per-source
# accounting built on them
# ---------------------------------------------------------------------------

def _gopher_pass(c: str) -> bool:
    from yanwenxian_week3_data_pipeline_spark.functions.textstats import (
        GOPHER_MAX_MEAN_WORD_LEN,
        GOPHER_MAX_NUMERIC_FRAC,
        GOPHER_MAX_SYMBOL_RATIO,
        GOPHER_MAX_TOKENS,
        GOPHER_MIN_MEAN_WORD_LEN,
        GOPHER_MIN_STOPWORD_HITS,
        GOPHER_MIN_TOKENS,
    )

    toks = c.split(" ") if c else []
    n = len(toks)
    nz = max(n, 1)
    mean_len = sum(len(t) for t in toks) / nz
    n_symbols = c.count("#") + c.count("...")
    n_numeric = sum(1 for t in toks if re.fullmatch("[0-9]+", t))
    stop_hits = sum(1 for t in toks if t in QUALITY_STOPWORDS)
    return (
        GOPHER_MIN_TOKENS <= n <= GOPHER_MAX_TOKENS
        and GOPHER_MIN_MEAN_WORD_LEN <= mean_len <= GOPHER_MAX_MEAN_WORD_LEN
        and n_symbols / nz < GOPHER_MAX_SYMBOL_RATIO
        and n_numeric / nz < GOPHER_MAX_NUMERIC_FRAC
        and stop_hits >= GOPHER_MIN_STOPWORD_HITS
    )


def test_gopher_filter_recount(spark, sf_dir, documents):
    got = {
        r["doc_id"]: r["passes_gopher"]
        for r in _run(spark, sf_dir, "docs_gopher_filter")
    }
    exp = {d["doc_id"]: _gopher_pass(_clean(d["text"])) for d in documents}
    assert got == exp


def test_domain_stats_recount(spark, sf_dir, documents):
    got = {
        r["source"]: (r["n_docs"], r["n_langs"], r["total_chars"], r["n_pass_gopher"])
        for r in _run(spark, sf_dir, "docs_domain_stats")
    }
    agg = defaultdict(lambda: [0, set(), 0, 0])
    for d in documents:
        cell = agg[d["source"]]
        cell[0] += 1
        cell[1].add(d["lang"])
        cell[2] += d["n_chars"]
        if _gopher_pass(_clean(d["text"])):
            cell[3] += 1
    exp = {s: (n, len(ls), ch, ok) for s, (n, ls, ch, ok) in agg.items()}
    assert got == exp


# ---------------------------------------------------------------------------
# text_ngram_topk — corpus bigram counts and doc frequencies
# ---------------------------------------------------------------------------

def test_ngram_topk_recount(spark, sf_dir, documents):
    from yanwenxian_week3_data_pipeline_spark.constants import (
        NGRAM_TOPK_K,
        NGRAM_TOPK_N,
    )

    got = [tuple(r) for r in _run(spark, sf_dir, "text_ngram_topk")]

    occ = defaultdict(int)
    docs_of = defaultdict(set)
    for d in documents:
        c = _clean(d["text"])
        toks = c.split(" ") if c else []
        for i in range(len(toks) - NGRAM_TOPK_N + 1):
            g = " ".join(toks[i : i + NGRAM_TOPK_N])
            occ[g] += 1
            docs_of[g].add(d["doc_id"])
    exp = sorted(
        ((g, n, len(docs_of[g])) for g, n in occ.items()),
        key=lambda r: (-r[1], r[0]),
    )[:NGRAM_TOPK_K]
    assert got == exp


# ---------------------------------------------------------------------------
# events_gapfill_hourly — dense hourly spine with gap flags
# ---------------------------------------------------------------------------

def test_gapfill_hourly_recount(spark, sf_dir, events):
    got = {
        r["window_start"]: (r["n_events"], r["sum_value"], r["was_gap"])
        for r in _run(spark, sf_dir, "events_gapfill_hourly")
    }

    def hour(ts):
        return ts.replace(minute=0, second=0, microsecond=0)

    hours = defaultdict(lambda: [0, Decimal(0)])
    for e in events:
        cell = hours[hour(e["ts"])]
        cell[0] += 1
        if e["value"] is not None:
            cell[1] += _round_half_up(e["value"], 2)
    lo = hour(min(e["ts"] for e in events))
    hi = hour(max(e["ts"] for e in events))
    exp = {}
    h = lo
    while h <= hi:
        if h in hours:
            n, s = hours[h]
            exp[h] = (n, float(s), False)
        else:
            exp[h] = (0, 0.0, True)
        h += timedelta(hours=1)
    assert got == exp


# ---------------------------------------------------------------------------
# docs_length_histogram — per-language fixed-width length buckets
# ---------------------------------------------------------------------------

def test_length_histogram_recount(spark, sf_dir, documents):
    from yanwenxian_week3_data_pipeline_spark.constants import (
        HIST_BUCKET_WIDTH,
        HIST_NUM_BUCKETS,
    )

    got = {
        (r["lang"], r["bucket"]): (r["bucket_lo"], r["n_docs"], r["lang_share"])
        for r in _run(spark, sf_dir, "docs_length_histogram")
    }
    cells = defaultdict(int)
    per_lang = defaultdict(int)
    for d in documents:
        b = min(d["n_chars"] // HIST_BUCKET_WIDTH, HIST_NUM_BUCKETS - 1)
        cells[(d["lang"], b)] += 1
        per_lang[d["lang"]] += 1
    exp = {
        (lang, b): (
            b * HIST_BUCKET_WIDTH,
            n,
            float(_round_half_up(n / per_lang[lang], 6)),
        )
        for (lang, b), n in cells.items()
    }
    assert got == exp


# ---------------------------------------------------------------------------
# docs_corpus_curation — per (lang, source) quality/dedup survival counts
# ---------------------------------------------------------------------------

def test_corpus_curation_recount(spark, sf_dir, documents):
    from yanwenxian_week3_data_pipeline_spark.plans.llm_ops import (
        CURATION_MIN_SCORE,
        CURATION_MIN_TOKENS,
    )

    got = {
        (r["lang"], r["source"]): (
            r["n_loaded"],
            r["n_quality"],
            r["n_unique"],
            r["tokens_kept"],
        )
        for r in _run(spark, sf_dir, "docs_corpus_curation")
    }

    min_score = Decimal(CURATION_MIN_SCORE)
    rows = []
    for d in documents:
        c = _clean(d["text"])
        nt, sc = _quality(c)
        rows.append(
            (d["doc_id"], d["lang"], d["source"], c, nt,
             sc >= min_score and nt >= CURATION_MIN_TOKENS)
        )
    best = {}
    for did, _l, _s, c, _nt, ok in rows:
        if ok and (c not in best or did < best[c]):
            best[c] = did
    exp = defaultdict(lambda: [0, 0, 0, 0])
    for did, lang, source, c, nt, ok in rows:
        cell = exp[(lang, source)]
        cell[0] += 1
        if ok:
            cell[1] += 1
            if best[c] == did:
                cell[2] += 1
                cell[3] += nt
    assert got == {k: tuple(v) for k, v in exp.items()}


# ---------------------------------------------------------------------------
# events_out_of_order_stats — arrival-order disorder accounting per user
# ---------------------------------------------------------------------------

def test_out_of_order_stats_recount(spark, sf_dir, events):
    from yanwenxian_week3_data_pipeline_spark.plans.analytic_ext import OOO_GAP_MIN

    got = {
        r["user_id"]: (r["n_events"], r["n_late_10m"], r["max_disorder_s"])
        for r in _run(spark, sf_dir, "events_out_of_order_stats")
    }

    by_user = defaultdict(list)
    for e in events:
        if e["user_id"] is not None:
            by_user[e["user_id"]].append((e["event_id"], e["ts"]))
    exp = {}
    gap_us = OOO_GAP_MIN * 60 * 1_000_000
    epoch = __import__("datetime").datetime(1970, 1, 1)
    for u, evs in by_user.items():
        evs.sort()
        run_max, late, worst = None, 0, 0
        for _eid, ts in evs:
            t = (ts - epoch) // timedelta(microseconds=1)  # exact micros
            if run_max is not None:
                d = max(run_max - t, 0)
                worst = max(worst, d)
                if d > gap_us:
                    late += 1
            run_max = t if run_max is None else max(run_max, t)
        exp[u] = (len(evs), late, worst // 1_000_000)
    assert got == exp


# ---------------------------------------------------------------------------
# events_funnel_timed — deadline-bounded funnel recount
# ---------------------------------------------------------------------------

def test_funnel_timed_recount(spark, sf_dir, events):
    from yanwenxian_week3_data_pipeline_spark.plans.analytic_ext import (
        FUNNEL_DEADLINE_MIN,
    )

    row = _run(spark, sf_dir, "events_funnel_timed")[0]

    by_user = defaultdict(list)
    for e in events:
        by_user[e["user_id"]].append((e["ts"], e["event_type"]))
    deadline = timedelta(minutes=FUNNEL_DEADLINE_MIN)
    n_users = len(by_user)
    s1 = s2 = s3 = 0
    for evs in by_user.values():
        signups = [ts for ts, t in evs if t == "signup"]
        if not signups:
            continue
        s1 += 1
        s = min(signups)
        views = [ts for ts, t in evs if t == "view" and ts > s]
        if not views:
            continue
        s2 += 1
        v = min(views)
        if any(
            t == "purchase" and v < ts <= v + deadline for ts, t in evs
        ):
            s3 += 1
    assert (
        row["n_users"],
        row["n_signup"],
        row["n_view_after_signup"],
        row["n_purchase_within_1h"],
    ) == (n_users, s1, s2, s3)


# ---------------------------------------------------------------------------
# events_hll_rollup_daily — exact weekly distincts + the sketch bound
# ---------------------------------------------------------------------------

def test_hll_rollup_recount(spark, sf_dir, events):
    got = {
        r["week"]: (r["n_days"], r["exact_distinct_users"], r["hll_within_bound"])
        for r in _run(spark, sf_dir, "events_hll_rollup_daily")
    }
    weeks = defaultdict(lambda: [set(), set()])
    for e in events:
        if e["user_id"] is None:
            continue
        d = e["ts"].date()
        monday = d - timedelta(days=d.weekday())
        cell = weeks[__import__("datetime").datetime.combine(monday, __import__("datetime").time())]
        cell[0].add(d)
        cell[1].add(e["user_id"])
    exp = {w: (len(ds), len(us), True) for w, (ds, us) in weeks.items()}
    assert got == exp
