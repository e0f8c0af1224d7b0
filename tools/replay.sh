#!/usr/bin/env bash
# One-command replay of the full round gate (round-10 verdict item 8 /
# round-11 item 7): unit+streaming suite → oracle dress rehearsal →
# bench → plan audit → 10× scale spot-check, writing every artifact the
# judge reads. Each stage's exit code is checked; the script stops at
# the first red stage so a broken engine never overwrites good
# artifacts with partial ones.
#
# Usage: tools/replay.sh [sfVerify] [sfBench]
#   sfVerify  testdata dir for the oracle gate   (default /root/testdata/sf0.01)
#   sfBench   testdata dir for the bench         (default /root/testdata/sf0.1)
#
# Artifacts written (repo root unless noted):
#   REPLAY_TESTS.log          sbt test summary (full log in /tmp)
#   /tmp/replay_verify/…      per-query parquet dumps + oracle_sql.json
#   REPLAY_ORACLE.log         check_oracle per-query PASS/FAIL lines
#   BENCH_LOCAL_replay.json   the bench JSON line
#   PLANS.md / PLAN_EXPECTATIONS.tsv  regenerated at current HEAD
#   CORRECTNESS_scale.json    10× replica oracle results
#
# Stage cost on this box: tests ~10 min, verify+oracle ~12 min, bench
# ~4 min, plan audit ~4 min, scale spot ~15 min (≈45 min total).
set -euo pipefail
cd "$(dirname "$0")/.."

SF_VERIFY="${1:-/root/testdata/sf0.01}"
SF_BENCH="${2:-/root/testdata/sf0.1}"
# a killed DuckDB leaves multi-GB spill behind — keep it out of the repo
export TMPDIR="${TMPDIR:-/tmp/replay_duckdb_tmp}"
mkdir -p "$TMPDIR"

echo "== [1/5] sbt test =="
sbt -batch test > /tmp/replay_tests_full.log 2>&1 \
  || { tail -30 /tmp/replay_tests_full.log; echo "TESTS RED — stopping"; exit 1; }
# commit-sized summary: suite-level results + totals (full log in /tmp)
{ echo "replay at $(git rev-parse --short HEAD) $(date -u +%FT%TZ)";
  grep -E "^\[info\] (Run completed|Total number|Suites:|Tests:|All tests)" \
    /tmp/replay_tests_full.log | tail -5; } > REPLAY_TESTS.log
cat REPLAY_TESTS.log

echo "== [2/5] oracle dress rehearsal ($SF_VERIFY) =="
rm -rf /tmp/replay_verify
sbt -batch "runMain graft.Verify $SF_VERIFY /tmp/replay_verify" \
  > /tmp/replay_verify_run.log 2>&1 \
  || { tail -30 /tmp/replay_verify_run.log; echo "VERIFY RED"; exit 1; }
python3 tools/check_oracle.py "$SF_VERIFY" /tmp/replay_verify \
  > REPLAY_ORACLE.log 2>&1 || true
tail -1 REPLAY_ORACLE.log
# b11 is the ONE rows-only id (HLL++ state, no oracle by design —
# x19/x31/x79/x151 carry full oracles since round 16); anything else
# failing is a real red
if grep "^FAIL" REPLAY_ORACLE.log | grep -v "b11_" | grep -q .; then
  grep "^FAIL" REPLAY_ORACLE.log | grep -v "b11_"
  echo "ORACLE RED — stopping"; exit 1
fi

echo "== [3/5] bench ($SF_BENCH) =="
SPARK_GRAFT_SF_DIR="$SF_BENCH" sbt -batch "runMain graft.Bench" \
  > /tmp/replay_bench.log 2>&1 \
  || { tail -30 /tmp/replay_bench.log; echo "BENCH RED"; exit 1; }
grep '"metric"' /tmp/replay_bench.log | tail -1 > BENCH_LOCAL_replay.json
cat BENCH_LOCAL_replay.json
# keep the _replay artifact trio n-consistent (round-12 verdict item 5:
# a reader pairing BENCH_LOCAL_replay with a stale per-query map from a
# mid-round subset run gets a different query count)
cp BENCH_QUERIES.json BENCH_QUERIES_replay.json
cp BENCH_SENTINEL.json BENCH_SENTINEL_replay.json

echo "== [4/5] plan audit =="
sbt -batch "runMain graft.PlanAudit" > /tmp/replay_plans.log 2>&1 \
  || { tail -30 /tmp/replay_plans.log; echo "PLAN AUDIT RED"; exit 1; }
echo "PLANS.md + PLAN_EXPECTATIONS.tsv regenerated"

echo "== [5/5] 10x scale spot ($SF_BENCH base) =="
sbt -batch "runMain graft.ScaleVerify $SF_BENCH" \
  > /tmp/replay_scale.log 2>&1 \
  || { tail -30 /tmp/replay_scale.log; echo "SCALE VERIFY RED"; exit 1; }
CHECK_ORACLE_JSON=CORRECTNESS_scale.json python3 tools/check_oracle.py \
  target/scale_verify/tables target/scale_verify \
  > /tmp/replay_scale_oracle.log 2>&1 || true
tail -1 /tmp/replay_scale_oracle.log

# Optional 30× hash gate for the linear-tracking tail (round-18 verdict
# item 5). OFF by default: the x145 lossless oracle at 30× costs hours of
# DuckDB CPU (round-protocol notes). REPLAY_SCALE30=fast runs the five
# sub-hour trackers; REPLAY_SCALE30=full adds x145.
if [[ "${REPLAY_SCALE30:-}" == "fast" || "${REPLAY_SCALE30:-}" == "full" ]]; then
  echo "== [6/6] 30x scale gate ($SF_BENCH base, mode=$REPLAY_SCALE30) =="
  sbt -batch "runMain graft.ScaleVerify $SF_BENCH target/scale_verify30 30" \
    > /tmp/replay_scale30.log 2>&1 \
    || { tail -30 /tmp/replay_scale30.log; echo "SCALE30 VERIFY RED"; exit 1; }
  NAMES="x125_winnowing_match,x137_theta_overlap,x146_dedup_recall,x62_setsim_prefix_join,x63_containment_join"
  [[ "$REPLAY_SCALE30" == "full" ]] && NAMES="$NAMES,x145_semdedup"
  CHECK_ORACLE_JSON=CORRECTNESS_scale30.json python3 tools/check_oracle.py \
    target/scale_verify30/tables target/scale_verify30 "$NAMES" \
    > /tmp/replay_scale30_oracle.log 2>&1 || true
  tail -1 /tmp/replay_scale30_oracle.log
fi

echo "== replay complete — artifacts: REPLAY_TESTS.log REPLAY_ORACLE.log" \
  "BENCH_LOCAL_replay.json PLANS.md PLAN_EXPECTATIONS.tsv" \
  "CORRECTNESS_scale.json =="
