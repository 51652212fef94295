"""Round-over-round bench tripwire (r7 VERDICT item 6).

Usage: python tools/bench_regression.py [new_bench.json] [baseline.json]

Compares a fresh ``bench.py`` output line (default: /tmp/bench_gate.json)
against the committed prior-round baseline (default:
docs/BENCH_BASELINE.json, recomputed from the driver's BENCH_r{N} warm
samples each round) across BOTH the 12-query headline set and the
extended section — the r6 lesson: docs_lrs_capped regressed +30-40 %
through a "definitive ALL GREEN" gate because nothing thresholded
extended wall.

A query REGRESSES when its new warm median exceeds the baseline median
by >15 % AND by more than max(3x the baseline IQR, 0.25 s) — the double
test keeps single-session machine noise from tripping the gate while
still catching real plan-level slowdowns. Calibration data (r7): the
r6 docs_lrs_capped regression this gate exists for was +0.66 s (trips
every setting); a same-code dedup_embedding_lsh run measured 1.62 s
in-gate right after a 10-min pytest + two full sweeps vs 1.37 s
isolated — ±0.25 s session noise on a 1.4 s query is real, so the
absolute guard sits exactly there. Exit 1 on any regression unless
BENCH_REGRESSION_WARN_ONLY=1.
"""

from __future__ import annotations

import json
import os
import sys

THRESH_PCT = 0.15
IQR_MULT = 3.0
ABS_FLOOR = 0.25


def _load(path: str) -> dict:
    with open(path) as f:
        txt = f.read().strip()
    try:
        return json.loads(txt)  # pretty-printed baseline file
    except json.JSONDecodeError:
        # bench.py prints one JSON line; tolerate leading log noise
        return json.loads(txt.splitlines()[-1])


def main() -> int:
    new_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/bench_gate.json"
    base_path = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.path.join(os.path.dirname(__file__), "..", "docs", "BENCH_BASELINE.json")
    )
    new, base = _load(new_path), _load(base_path)

    bad: list[str] = []
    for section, iqr_key in (("queries", "iqr_sec"), ("extended_queries", "extended_iqr_sec")):
        nq, bq = new.get(section, {}), base.get(section, {})
        biqr = base.get(iqr_key, {})
        for name in sorted(bq):
            if name not in nq:
                print(f"bench-regression: {name} missing from new run ({section})")
                continue
            old, cur = float(bq[name]), float(nq[name])
            guard = max(IQR_MULT * float(biqr.get(name, 0.0)), ABS_FLOOR)
            delta = cur - old
            pct = delta / old if old else 0.0
            tag = ""
            if pct > THRESH_PCT and delta > guard:
                tag = "  <-- REGRESSION"
                bad.append(name)
            elif pct > THRESH_PCT:
                tag = "  (over 15% but inside noise guard)"
            if tag or abs(pct) > THRESH_PCT:
                print(
                    f"bench-regression: {name}: {old:.3f} -> {cur:.3f} "
                    f"({pct:+.0%}, guard ±{guard:.3f}s){tag}"
                )
    if bad:
        msg = f"bench-regression: {len(bad)} regressed vs baseline: {bad}"
        if os.environ.get("BENCH_REGRESSION_WARN_ONLY") == "1":
            print(msg + " (WARN_ONLY)")
            return 0
        print(msg)
        return 1
    print("bench-regression: no query regressed >15% beyond its noise guard")
    return 0


if __name__ == "__main__":
    sys.exit(main())
