#!/usr/bin/env bash
# Same-day A/B bench control (VERDICT r12 task 5, codifying the manual
# protocol from the r12 host-degradation attribution).
#
#   tools/ab_bench.sh <ref-commit> [sf-dir]
#
# Builds <ref-commit> in a detached worktree, GRAFTS THE CURRENT
# Bench.scala onto it (the measurement harness is not the system under
# test — the r11-tree control lacked per-rep t/load1/steal arrays, so
# single-gate deltas could not be load-attributed), runs the control
# bench and the working-tree bench back-to-back in the same host window,
# and emits a per-query min-ratio table with load/steal attribution.
# Artifacts land in bench_history/ab/: ref_<commit>_<ts>.json,
# cur_<ts>.json, ratio_<ts>.txt.
set -euo pipefail
cd "$(dirname "$0")/.."
REF="${1:?usage: tools/ab_bench.sh <ref-commit> [sf-dir]}"
SF="${2:-/root/testdata/sf0.1}"
TS=$(date +%Y%m%d_%H%M%S)
WT="/tmp/graft_ab_${TS}"
AB_DIR="$(pwd)/bench_history/ab"
mkdir -p "$AB_DIR"

git worktree add --detach "$WT" "$REF"
trap 'git worktree remove --force "$WT" 2>/dev/null || true' EXIT
cp src/main/scala/graft/Bench.scala "$WT/src/main/scala/graft/Bench.scala"
# Bench's companions travel with it (BenchMode since r14): grafting them
# into an older control tree is inert — old gates never read the flags —
# so measurement parity is preserved
[ -f src/main/scala/graft/BenchMode.scala ] && \
  cp src/main/scala/graft/BenchMode.scala "$WT/src/main/scala/graft/BenchMode.scala"

# each bench writes into its OWN empty temp history dir — recovering "the
# newest *.json" from the shared ab/ dir could pick a prior run's renamed
# artifact under clock skew or a concurrent run
REF_HIST=$(mktemp -d /tmp/ab_ref_hist.XXXXXX)
CUR_HIST=$(mktemp -d /tmp/ab_cur_hist.XXXXXX)
trap 'rm -rf "$REF_HIST" "$CUR_HIST"; git worktree remove --force "$WT" 2>/dev/null || true' EXIT

echo "[ab] control bench: $REF (worktree $WT, current Bench.scala grafted)"
( cd "$WT" && SPARK_GRAFT_SF_DIR="$SF" SPARK_GRAFT_HISTORY_DIR="$REF_HIST" \
    sbt -batch "runMain graft.Bench" ) > "/tmp/ab_ref_${TS}.log" 2>&1 \
  || { echo "[ab] control bench FAILED — see /tmp/ab_ref_${TS}.log"; exit 1; }
REF_ART=$(ls "$REF_HIST"/*.json | head -1)
REF_OUT="$AB_DIR/ref_${REF}_${TS}.json"
mv "$REF_ART" "$REF_OUT"

echo "[ab] current-tree bench (back-to-back, same host window)"
SPARK_GRAFT_SF_DIR="$SF" SPARK_GRAFT_HISTORY_DIR="$CUR_HIST" \
  sbt -batch "runMain graft.Bench" > "/tmp/ab_cur_${TS}.log" 2>&1 \
  || { echo "[ab] current bench FAILED — see /tmp/ab_cur_${TS}.log"; exit 1; }
CUR_ART=$(ls "$CUR_HIST"/*.json | head -1)
CUR_OUT="$AB_DIR/cur_${TS}.json"
mv "$CUR_ART" "$CUR_OUT"

python3 tools/ab_compare.py "$REF_OUT" "$CUR_OUT" | tee "$AB_DIR/ratio_${TS}.txt"
