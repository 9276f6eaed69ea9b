#!/usr/bin/env bash
# Survivability checks for graft.Bench (VERDICT r12 task 1 + r13 task 1).
#
# Part A — external kill: kills a bench run mid-list and asserts that
#   (a) the incremental history artifact exists and parses, (b) every query
#   that streamed a bench_query stdout line before the kill is covered in
#   the artifact, and (c) no query is recorded ok:false with a
#   "SparkContext was shut down" cascade — context death marks queries
#   NOT RUN, never failed.
# Part B — env-free overrun: runs WITHOUT SPARK_GRAFT_BENCH_BUDGET_S and
#   with the built-in default budget shrunk via the test-only
#   -Dgraft.bench.defaultBudgetS property, and asserts the run self-degrades
#   ("degraded":true), still covers every query it reached with >=1 rep,
#   emits the FINAL total/digest lines, writes a NON-partial history file,
#   and exits 0 — no external kill needed.
#
# Usage: tools/bench_timeout_check.sh [sf-dir] [timeout-seconds]
set -euo pipefail
cd "$(dirname "$0")/.."
SF="${1:-/root/testdata/sf0.001}"
TIMEOUT="${2:-150}"
HIST=$(mktemp -d /tmp/bench_timeout_check.XXXXXX)
trap 'rm -rf "$HIST"' EXIT

echo "=== part A: external kill at ${TIMEOUT}s ==="
rc=0
SPARK_GRAFT_SF_DIR="$SF" SPARK_GRAFT_HISTORY_DIR="$HIST" SPARK_GRAFT_REPS=2 \
  timeout "${TIMEOUT}s" sbt -batch "runMain graft.Bench" \
  > "$HIST/stdout.log" 2>&1 || rc=$?
echo "bench exited rc=$rc (124 = killed by timeout, expected)"
python3 - "$HIST" <<'EOF'
import json, sys, glob, os
hist = sys.argv[1]
files = sorted(glob.glob(os.path.join(hist, "*.json")))
assert files, "no history artifact written before the kill"
art = json.load(open(files[-1]))
qlines = []
for l in open(os.path.join(hist, "stdout.log")):
    if '"metric":"bench_query"' in l:
        qlines.append(json.loads(l[l.index('{'):]))
assert qlines, "no streamed bench_query lines on stdout"
names = {q["name"] for q in qlines}
missing = names - set(art["queries"])
assert not missing, f"history artifact missing completed queries: {missing}"
# no post-shutdown false-failure cascade: every artifact row is either a
# measured ok:true / genuine failure, or an explicit notrun marker
cascade = [n for n, q in art["queries"].items()
           if q.get("ok") is False]
assert not cascade, f"killed run recorded false failures: {cascade}"
print(f"OK(A): artifact parseable, {len(art['queries'])} queries covered, "
      f"{len(names)} streamed, partial={art.get('partial', False)}, "
      f"notrun={sum(1 for q in art['queries'].values() if q.get('notrun'))}")
EOF

echo "=== part B: env-free overrun (built-in default budget binds) ==="
HISTB=$(mktemp -d /tmp/bench_timeout_check.XXXXXX)
trap 'rm -rf "$HIST" "$HISTB"' EXIT
rcb=0
SPARK_GRAFT_SF_DIR="$SF" SPARK_GRAFT_HISTORY_DIR="$HISTB" SPARK_GRAFT_REPS=3 \
  sbt -batch -Dgraft.bench.defaultBudgetS=60 "runMain graft.Bench" \
  > "$HISTB/stdout.log" 2>&1 || rcb=$?
echo "bench exited rc=$rcb (0 expected: self-degraded, never killed)"
python3 - "$HISTB" "$rcb" <<'EOF'
import json, sys, glob, os
hist, rcb = sys.argv[1], int(sys.argv[2])
assert rcb == 0, f"env-free overrun did not exit 0 (rc={rcb})"
files = sorted(glob.glob(os.path.join(hist, "*.json")))
assert files, "no history artifact written"
art = json.load(open(files[-1]))
assert not art.get("partial"), "final history flush still marked partial"
assert art.get("degraded"), "run overran the default budget but never degraded"
totals = [json.loads(l[l.index('{'):]) for l in open(os.path.join(hist, "stdout.log"))
          if '"metric":"total"' in l or '"metric":"total_digest"' in l]
kinds = {t["metric"] for t in totals}
assert {"total", "total_digest"} <= kinds, f"final lines missing: {kinds}"
qlines = {json.loads(l[l.index('{'):])["name"]
          for l in open(os.path.join(hist, "stdout.log"))
          if '"metric":"bench_query"' in l}
missing = qlines - set(art["queries"])
assert not missing, f"history artifact missing queries: {missing}"
print(f"OK(B): rc=0, degraded=true, non-partial history with "
      f"{len(art['queries'])} queries, final total+digest emitted")
EOF
echo "all survivability checks passed"
