#!/usr/bin/env bash
# Round close-out, as ONE scripted step (round 17 — the r16 verdict's
# item 2: the bpe-trie bench-reference row went stale because the bench
# regen and the fingerprint regen ran against DIFFERENT build states
# during a hand-driven close; this ordering bug bit in r14 and r16).
#
# Usage: tools/close_round.sh <round-number>
#
# Sequence (every step against the SAME committed tree):
#   0. refuse a dirty working tree — a regen must describe committed code
#   1. wait for a quiet machine window (steal ~ 0, load sane)
#   2. regen plan fingerprints (Test/testOnly graft.PlanFingerprintSpec)
#   3. regen the bench reference (full sweep, SPARK_GRAFT_REGEN_BENCH_REFERENCE=1)
#      -- this run compares against the PRE-regen reference, so its own
#      n_ref_matched is meaningless; that is WHY step 4 exists
#   4. confirm sweep (no regen flag): must report n_ref_matched == registry
#      size, zero failed, zero contended, raw vs_reference <= 1.3
#   5. copy bench_details.json -> bench_r<N>_gates.json (the committed
#      round record BenchSpec's freshness contract checks)
#   6. full sbt test must be green against the regenerated artifacts
#
# The script stops at the first violated contract; nothing is committed —
# review the diff and commit the artifacts it leaves behind.
set -euo pipefail
cd "$(dirname "$0")/.."

ROUND="${1:?usage: tools/close_round.sh <round-number>}"
SF_DIR="${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}"

# the script's OWN outputs are exempt — a storm-aborted earlier attempt
# leaves them modified (min-merge makes the retry converge), and that must
# not block the retry
if [[ -n "$(git status --porcelain -- src build.sbt \
    ':(exclude)src/main/resources/bench_reference.txt' \
    ':(exclude)src/test/resources/plan_fingerprints.txt')" ]]; then
  echo "FATAL: src/build.sbt have uncommitted changes — commit first so the" >&2
  echo "regenerated reference describes a reproducible tree" >&2
  exit 2
fi
echo "close_round: regenerating against $(git rev-parse --short HEAD) at $SF_DIR"

quiet_wait() {
  # steal ~ 0 over an 8 s window AND load1 below ~2.5, retried up to ~20 min
  python3 - <<'PY'
import os, sys, time
def steal():
    return int(open('/proc/stat').readline().split()[8])
for attempt in range(60):
    s0, t0 = steal(), time.time()
    time.sleep(8)
    rate = (steal() - s0) / 100.0 / (time.time() - t0)
    load = os.getloadavg()[0]
    if rate < 0.05 and load < 2.5:
        print(f"quiet: steal/s={rate:.3f} load1={load:.2f}")
        sys.exit(0)
    print(f"busy (attempt {attempt+1}/60): steal/s={rate:.3f} load1={load:.2f}; waiting")
    time.sleep(12)
sys.exit(3)
PY
}

echo "== step 1: quiet window (pre-fingerprint)"
quiet_wait

echo "== step 2: plan fingerprints"
SPARK_GRAFT_REGEN_FINGERPRINTS=1 sbt "Test/testOnly graft.PlanFingerprintSpec"

echo "== step 3: quiet window (pre-reference-regen)"
quiet_wait
echo "== step 3: bench reference regen (full sweep)"
# tail -1: the headline is the LAST {-prefixed stdout line — any other
# JSON-ish sbt line must not poison the json.load below (ADVICE r17)
SPARK_GRAFT_SF_DIR="$SF_DIR" SPARK_GRAFT_REGEN_BENCH_REFERENCE=1 \
  sbt "runMain graft.Bench" | grep '^{' | tail -n 1 > /tmp/close_round_regen.json
python3 - /tmp/close_round_regen.json <<'PY'
import json, sys
d = json.load(open(sys.argv[1]))
steal = d.get("steal_sec", 0.0)
assert not d.get("failed"), f"regen sweep had failures: {d.get('failed')}"
assert steal < 30, f"regen sweep saw {steal}s hypervisor steal - rows poisoned, re-run"
print(f"regen ok: {d['value']:.1f}s, steal {steal}s")
PY

echo "== step 4: confirm sweep (prices every gate against the NEW reference)"
quiet_wait
SPARK_GRAFT_SF_DIR="$SF_DIR" sbt "runMain graft.Bench" | grep '^{' \
  | tail -n 1 > /tmp/close_round_confirm.json
# per-gate data lives in bench_details.json (the stdout headline carries
# only n_queries/flags) — judge the record from the file the record IS
python3 - bench_details.json <<'PY'
import json, sys
d = json.load(open(sys.argv[1]))
n = len(d.get("queries", {}))
assert not d.get("failed"), f"confirm sweep failures: {d.get('failed')}"
assert d.get("n_ref_matched") == n, (
    f"n_ref_matched {d.get('n_ref_matched')} != {n} gates - a reference row "
    "was recorded from different code (the r16 trie bug); re-run the script")
assert not d.get("contended"), f"confirm sweep contended (n={d.get('n_contended')})"
assert d.get("vs_reference", 99) <= 1.3, f"confirm inflated: {d.get('vs_reference')}x"
print(f"confirm ok: {d['value']:.1f}s, {n} gates, vs_ref {d['vs_reference']}x")
PY

echo "== step 5: round record"
cp bench_details.json "bench_r${ROUND}_gates.json"

echo "== step 6: full test suite against the regenerated artifacts"
sbt test

echo "close_round: DONE — review 'git status' and commit:"
echo "  src/test/resources/plan_fingerprints.txt"
echo "  src/main/resources/bench_reference.txt"
echo "  bench_r${ROUND}_gates.json"
