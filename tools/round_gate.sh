#!/bin/sh
# Full round gate, in dependency order (one Spark JVM at a time):
#   1. pytest           (~6 min)  unit/golden/plan/property/streaming
#   2. sf0.01 sweep     (~3 min)  driver-exact oracle gate, all queries
#   3. sf0.01 TZ sweep  (~3 min)  same, under a non-UTC session zone
#   4. plan audit       (~2 min)  registry-wide anti-pattern scan
#   5. bench            (~2 min)  headline wall-times at sf0.1
# Optional: pass a sf dir for an extra full sweep at that scale (the sf0.1
# sweep adds ~9 min and is worth running before a round ends).
set -e
cd "$(dirname "$0")/.."
python -m pytest tests/ -q
python tools/verify_all.py /root/testdata/sf0.01
VERIFY_TZ=America/New_York python tools/verify_all.py /root/testdata/sf0.01
python tools/plan_audit.py
python bench.py
if [ -n "$1" ]; then
  python tools/verify_all.py "$1"
fi
echo "round gate: ALL GREEN"
