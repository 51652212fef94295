"""Trough-triggered per-query isolated pin sweep (r9 SF1_PINS protocol).

For each query name: wait for a 1-minute load trough (< LOAD_TROUGH, up to
MAX_WAIT), then run ``make_bench_baseline.py --isolated-one`` (one fresh
JVM, 1 cold + N warm, median/IQR of the warm runs) against each given
sf_dir, recording the load window around the session. Appends one JSON line
per (query, sf_dir) measurement to the output file, so an interrupted sweep
resumes by re-running with the remaining names.

Usage:
    python tools/pin_sweep.py <out.jsonl> <sf_dir[,sf_dir2,...]> <query> [query ...]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

LOAD_TROUGH = float(os.environ.get("PIN_LOAD_TROUGH", "0.4"))
MAX_WAIT_SEC = int(os.environ.get("PIN_MAX_WAIT_SEC", "600"))


def _load1m() -> float | None:
    try:
        with open("/proc/loadavg") as f:
            return float(f.read().split()[0])
    except (OSError, ValueError, IndexError):
        return None


def _wait_trough() -> float | None:
    t0 = time.time()
    while True:
        load = _load1m()
        if load is None or load < LOAD_TROUGH or time.time() - t0 > MAX_WAIT_SEC:
            return load
        time.sleep(15)


def main() -> int:
    out_path, sf_dirs, names = sys.argv[1], sys.argv[2].split(","), sys.argv[3:]
    tool = os.path.join(os.path.dirname(os.path.abspath(__file__)), "make_bench_baseline.py")
    for name in names:
        for sf_dir in sf_dirs:
            load_before = _wait_trough()
            t0 = time.time()
            proc = subprocess.run(
                [sys.executable, tool, "--isolated-one", name, sf_dir],
                capture_output=True,
                text=True,
            )
            load_after = _load1m()
            try:
                rec = json.loads(proc.stdout.strip().splitlines()[-1])
            except (IndexError, ValueError, json.JSONDecodeError):
                rec = {"name": name, "error": proc.stderr.strip()[-400:]}
            rec.update(
                sf_dir=sf_dir,
                load_1m_before=load_before,
                load_1m_after=load_after,
                wall_total=round(time.time() - t0, 1),
            )
            with open(out_path, "a") as f:
                f.write(json.dumps(rec) + "\n")
            print(json.dumps(rec), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
