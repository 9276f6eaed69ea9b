#!/usr/bin/env bash
# Timeout-survivability check for graft.Bench (VERDICT r12 task 1).
#
# Kills a bench run mid-list and asserts that (a) the incremental history
# artifact exists and parses, (b) every query that streamed a bench_query
# stdout line before the kill is covered in the artifact. Usage:
#   tools/bench_timeout_check.sh [sf-dir] [timeout-seconds]
set -euo pipefail
cd "$(dirname "$0")/.."
SF="${1:-/root/testdata/sf0.001}"
TIMEOUT="${2:-150}"
HIST=$(mktemp -d /tmp/bench_timeout_check.XXXXXX)
trap 'rm -rf "$HIST"' EXIT
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
print(f"OK: artifact parseable, {len(art['queries'])} queries covered, "
      f"{len(names)} streamed, partial={art.get('partial', False)}")
EOF
