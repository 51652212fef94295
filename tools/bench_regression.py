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
absolute guard sits exactly there.

SECOND STRIKE (r7 continuation; subprocess-exact since r9): a flagged
query is re-measured ISOLATED — a fresh JVM subprocess running ONLY
that query (make_bench_baseline's --isolated-one child, the same code
path that records the isolated baseline), 1 cold + 9 warm runs — and
only fails the gate if the isolated median ALSO breaks the
same thresholds. Calibration: the gate's in-suite bench read
dedup_minhash_lsh at 2.749 s (+17 %) on a diff that provably does not
touch the minhash path, while the isolated median on the same machine
minutes later was 2.511 s — inside the guard; in-suite context
inflation (~0.2-0.4 s after two full sweeps in the same shell) is the
second false-trigger class after session noise, and a REAL code
regression (the r6 lrs class, +0.66 s structural) persists isolated by
definition. Exit 1 only on confirmed regressions unless
BENCH_REGRESSION_WARN_ONLY=1; BENCH_REGRESSION_NO_CONFIRM=1 restores
the single-strike behavior (used by the unit test).

LIKE-WITH-LIKE (r8, closes r7 ADVICE on this file): isolated walls run
~0.2-0.4 s faster than in-suite ones — the inflation documented above —
so a second strike that compares its ISOLATED re-measure against an
IN-SUITE baseline would systematically clear real regressions smaller
than that margin on top of the 15 %/guard thresholds. When the baseline
file carries ``isolated_sec`` / ``isolated_iqr_sec`` (recorded by
``tools/make_bench_baseline.py --isolated`` with the same fresh-JVM
1-cold+9-warm protocol), the second strike compares against THOSE; the
in-suite medians remain the first-strike reference only.

STEADY-TAIL VERDICT (r10): a CONFIRMED verdict must be backed by the
probe's steady tail, not its warm-up slope. Evidence: during an r10
external load storm that evicted the page cache, EVERY fresh-JVM probe
started 5-10x slow and decayed monotonically for 10+ runs (control
q1_pricing_summary: cold 12.7 s, warm 3.8 -> 0.94; docs_lrs_capped
probe samples 14.3 -> 3.2), so the 9-warm median landed mid-slope at
8.567 s against a 1.960 s baseline and falsely CONFIRMED — while a
20-run in-session probe of the same commit plateaued at 1.85 s, BELOW
the baseline. Cold/JIT-slope costs are one-time and amortized at scale;
bench.py's own protocol already excludes them (cold run recorded but
not counted). So the second strike now confirms only when the median of
the probe's LAST FIVE samples (its best available steady-state
estimate) ALSO breaks the same thresholds; a probe whose tail clears is
printed as slope-dominated and cleared. A real plan regression (the r6
lrs class, +0.66 s structural) inflates the steady state by definition
and still confirms.
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
    if bad and os.environ.get("BENCH_REGRESSION_NO_CONFIRM") != "1":
        confirmed = _confirm_isolated(bad, base, audit_path=new_path + ".second_strike.jsonl")
        cleared = [n for n in bad if n not in confirmed]
        if cleared:
            print(
                f"bench-regression: {len(cleared)} in-suite flag(s) cleared by the"
                f" isolated second strike: {cleared}"
            )
        bad = confirmed
    if bad:
        msg = f"bench-regression: {len(bad)} regressed vs baseline: {bad}"
        if os.environ.get("BENCH_REGRESSION_WARN_ONLY") == "1":
            print(msg + " (WARN_ONLY)")
            return 0
        print(msg)
        return 1
    print("bench-regression: no query regressed >15% beyond its noise guard")
    return 0


def _confirm_isolated(names: list[str], base: dict, audit_path: str | None = None) -> list[str]:
    """Second strike: re-measure each flagged query ISOLATED — one fresh
    JVM subprocess per query via make_bench_baseline's ``--isolated-one``
    child mode, the IDENTICAL protocol that recorded the isolated
    baseline (r8 ADVICE: the previous in-process getOrCreate re-measure
    inherited the suite's warmed JVM, and the 2nd+ flagged query ran in
    a session the 1st had warmed — both warmer than the fresh-JVM
    baseline, biasing toward clearing borderline regressions). Keep only
    queries whose isolated median still breaks the same (>15 % AND
    guard) thresholds; a query whose re-measure FAILS stays flagged (a
    regression must be cleared by evidence, not by a broken probe)."""
    import subprocess
    import time

    tool = os.path.join(os.path.dirname(os.path.abspath(__file__)), "make_bench_baseline.py")
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    def _load1m() -> float | None:
        try:
            with open("/proc/loadavg") as f:
                return float(f.read().split()[0])
        except (OSError, ValueError, IndexError):
            return None

    # The launch threshold is the bench's own pre-suite contamination
    # threshold (ADVICE r10: it was hardcoded 2.0 here while bench.py read
    # it from env — tuning one silently desynchronized the other).
    try:
        load_start_max = float(os.environ.get("SPARK_GRAFT_BENCH_LOAD_START_MAX", "2.0"))
    except ValueError:
        load_start_max = 2.0
    # ONE 10-minute trough budget shared across the whole confirmation
    # loop (ADVICE r10: per-query waits could stall a stormy gate
    # N x 10 min). Between probes the load is still re-checked cheaply;
    # once the budget is spent, remaining probes launch regardless (their
    # verdict line records the load at launch either way).
    wait_budget = [600.0]

    def _wait_trough() -> float | None:
        """Probe-level trough wait (r10): at the instant a probe would
        launch, nothing of ours is running — a 1-min load above the bench's
        own LOAD_START_MAX is external. A probe launched into a SUSTAINED
        storm reads flat-high (observed: docs_lrs 7.191 s flat, +267 %
        against a 1.960 baseline, minutes after a quiet-box probe of the
        same commit read 2.266 flat) and the steady-tail verdict rightly
        refuses to clear it — so wait for the trough the way
        round_gate.sh's bench retry already does (load < 1.0), then
        launch. A real regression confirms in a trough just the same.
        Any falsy BENCH_REGRESSION_TROUGH_WAIT value ("0", "false", "")
        disables the wait (unit tests use mocked probes and must not
        sleep; ADVICE r10 — only the literal "0" used to count)."""
        tw = os.environ.get("BENCH_REGRESSION_TROUGH_WAIT")
        if tw is not None and tw.strip().lower() in ("0", "false", "no", "off", ""):
            return _load1m()
        load = _load1m()
        if load is None or load <= load_start_max:
            return load
        deadline = time.monotonic() + wait_budget[0]
        t0 = time.monotonic()
        try:
            while time.monotonic() < deadline:
                time.sleep(10)
                load = _load1m()
                if load is None or load < 1.0:
                    return load
        finally:
            wait_budget[0] = max(0.0, wait_budget[0] - (time.monotonic() - t0))
        print(
            f"bench-regression: trough-wait budget exhausted (1-min load {load});"
            " probing anyway — verdict may be storm-inflated"
        )
        return load
    baseq = {**base.get("queries", {}), **base.get("extended_queries", {})}
    biqr = {**base.get("iqr_sec", {}), **base.get("extended_iqr_sec", {})}
    # like-with-like: prefer the isolated baseline (same fresh-JVM
    # protocol as this re-measure) when the baseline file records one
    iso_q = base.get("isolated_sec", {})
    iso_iqr = base.get("isolated_iqr_sec", {})
    confirmed: list[str] = []
    for name in names:
        load_at_launch = _wait_trough()
        proc = subprocess.run(
            [sys.executable, tool, "--isolated-one", name, sf],
            capture_output=True,
            text=True,
        )
        try:
            rec = json.loads(proc.stdout.strip().splitlines()[-1])
            med = float(rec["median"])
            # steady-tail estimate (module docstring, r10): median of the
            # last 5 samples in RUN ORDER — on a flat probe it equals the
            # warm median up to noise; on a cold-cache/JIT-slope probe it
            # is the only honest steady-state reading the probe contains.
            # Probes predating the samples field fall back to the median.
            tail = sorted(float(x) for x in rec.get("samples", [med])[-5:])
            tail_med = tail[len(tail) // 2]
        except (IndexError, TypeError, ValueError, KeyError, json.JSONDecodeError):
            print(
                f"bench-regression: isolated second strike {name}: re-measure "
                f"FAILED (rc={proc.returncode}) — keeping the flag\n"
                + proc.stderr.strip()[-500:]
            )
            confirmed.append(name)
            continue
        like = name in iso_q
        old = float(iso_q[name]) if like else float(baseq[name])
        guard = max(
            IQR_MULT * float((iso_iqr if like else biqr).get(name, 0.0)), ABS_FLOOR
        )
        breaks = lambda v: (v - old) / old > THRESH_PCT and (v - old) > guard
        slope_dominated = breaks(med) and not breaks(tail_med)
        still = breaks(med) and breaks(tail_med)
        # Persist the full verdict evidence next to the gate's bench line
        # (ADVICE r10: slope-dominated clearances existed only in stdout —
        # a cleared flag could not be re-examined later).
        if audit_path:
            try:
                with open(audit_path, "a") as f:
                    f.write(
                        json.dumps(
                            {
                                "name": name,
                                "baseline": old,
                                "baseline_kind": "isolated" if like else "in_suite",
                                "guard": round(guard, 3),
                                "probe_median": med,
                                "probe_tail_median": tail_med,
                                "probe_samples": rec.get("samples"),
                                "load_at_launch": load_at_launch,
                                "verdict": "confirmed"
                                if still
                                else ("cleared_slope_dominated" if slope_dominated else "cleared"),
                            }
                        )
                        + "\n"
                    )
            except OSError:
                pass  # the audit record is best-effort; the verdict stands
        print(
            f"bench-regression: isolated second strike {name}: {old:.3f}"
            f"{' (isolated baseline)' if like else ' (in-suite baseline)'} ->"
            f" {med:.3f} (tail {tail_med:.3f}) ({(med - old) / old:+.0%},"
            f" guard ±{guard:.3f}s, load@launch"
            f" {load_at_launch if load_at_launch is not None else '?'})"
            + (
                "  <-- CONFIRMED"
                if still
                else (
                    "  (cleared: slope-dominated probe, steady tail inside guard)"
                    if slope_dominated
                    else "  (cleared)"
                )
            )
        )
        if still:
            confirmed.append(name)
    return confirmed


if __name__ == "__main__":
    sys.exit(main())
