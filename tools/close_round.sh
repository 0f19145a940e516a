#!/usr/bin/env bash
# Round close-out, as ONE scripted step.
#
# Usage: tools/close_round.sh <round-number>
#
# History: round 17 scripted the close because hand-driven regens bit
# twice (r14/r16: bench reference and fingerprints regenerated from
# DIFFERENT build states). Round 19 made the close STORM-RESILIENT: the
# r18 close demanded one uninterrupted storm-free ~30-minute confirm
# sweep, ran NINE of them into recurring hypervisor-steal storms
# (25-434 s each), and the round shipped without a record. The machine
# delivers quiet only in windows, so the record is now MINTED per gate
# from every sweep whose window for that gate was quiet (graft.RecordMint
# — min-merged exactly like the reference regen already was; the
# per-gate /proc evidence decides). The hard contracts are unchanged:
# zero failed gates, full-registry coverage, record plan hashes == the
# committed reference's, merged vs_reference <= 1.3, full sbt test green.
#
# CONTRACT: bench_reference.txt and plan_fingerprints.txt are regenerated
# ONLY here. Between a mid-round re-plan/registry change and the next
# close, BenchSpec's two reference-coupled tests are expectedly red; this
# script's final `sbt test` is the green gate.
#
# Sequence (every step against the SAME committed tree):
#   0. refuse a dirty working tree — a regen must describe committed code
#   1. regen plan fingerprints (Test/testOnly graft.PlanFingerprintSpec)
#   2. sweep loop (up to MAX_SWEEPS):
#      a. wait (bounded, best-effort) for a quiet-ish machine window
#      b. full bench sweep with SPARK_GRAFT_REGEN_BENCH_REFERENCE=1 —
#         min-merges the committed reference DOWN per unchanged-plan gate,
#         so a storm-hit sweep can only fail to improve it, never poison it
#      c. archive bench_details.json as this sweep's evidence
#      d. attempt the mint over ALL archived sweeps; success ends the loop
#   3. full sbt test against the regenerated artifacts
#
# The script stops only on real failures (crashed gates, malformed
# artifacts); a storm merely costs another sweep. Nothing is committed —
# review the diff and commit the artifacts it leaves behind.
set -euo pipefail
cd "$(dirname "$0")/.."

ROUND="${1:?usage: tools/close_round.sh <round-number>}"
SF_DIR="${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}"
MAX_SWEEPS="${CLOSE_ROUND_MAX_SWEEPS:-6}"
# CLOSE_ROUND_SWEEP_DIR: reuse one evidence dir across close runs — the
# mint min-merges per gate, so sweeps from an earlier (stormier) close
# can only improve the record, never poison it. Stale-build sweeps are
# harmless: the mint drops any measurement whose plan hash is not the
# CURRENT committed reference's. Default: a fresh dir per run.
SWEEP_DIR="${CLOSE_ROUND_SWEEP_DIR:-$(mktemp -d /tmp/close_round_r${ROUND}_sweeps.XXXX)}"
mkdir -p "$SWEEP_DIR"

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
echo "close_round: sweep evidence dir $SWEEP_DIR"

quiet_wait() {
  # BEST-EFFORT: steal ~ 0 over an 8 s window AND load1 sane, retried up
  # to ~4 min, then proceed anyway — the per-gate mint evidence (not this
  # wait) is what keeps a storm out of the record; waiting longer only
  # delays the sweep that might catch the next quiet window
  python3 - <<'PY'
import os, sys, time
def steal():
    return int(open('/proc/stat').readline().split()[8])
for attempt in range(12):
    s0, t0 = steal(), time.time()
    time.sleep(8)
    rate = (steal() - s0) / 100.0 / (time.time() - t0)
    load = os.getloadavg()[0]
    if rate < 0.05 and load < 2.5:
        print(f"quiet: steal/s={rate:.3f} load1={load:.2f}")
        sys.exit(0)
    print(f"busy (attempt {attempt+1}/12): steal/s={rate:.3f} load1={load:.2f}; waiting")
    time.sleep(12)
print("no quiet window in ~4 min - sweeping anyway (per-gate evidence decides)")
PY
}

echo "== step 1: plan fingerprints"
quiet_wait
SPARK_GRAFT_REGEN_FINGERPRINTS=1 sbt "Test/testOnly graft.PlanFingerprintSpec"

for i in $(seq 1 "$MAX_SWEEPS"); do
  echo "== step 2.$i: full sweep (reference min-merge regen)"
  quiet_wait
  # tail -1: the headline is the LAST {-prefixed stdout line — any other
  # JSON-ish sbt line must not poison json parsing (ADVICE r17)
  # sweep files number PAST any evidence already in the dir (a reused
  # CLOSE_ROUND_SWEEP_DIR must accumulate, never overwrite). Derived
  # from the MAX existing index, not the file count (ADVICE r19: a dir
  # with gaps — sweep_1 deleted, sweep_2/3 kept — would count to N=3
  # and silently overwrite sweep_3's evidence)
  # find (not ls): with zero matches ls exits 2 and pipefail kills the
  # script before its first sweep on a FRESH evidence dir
  N=$(find "$SWEEP_DIR" -maxdepth 1 -name 'sweep_*.json' \
    | sed -E 's/.*sweep_([0-9]+)\.json$/\1/' | sort -n | tail -1)
  N=$(( ${N:-0} + 1 ))
  SPARK_GRAFT_SF_DIR="$SF_DIR" SPARK_GRAFT_REGEN_BENCH_REFERENCE=1 \
    sbt "runMain graft.Bench" | grep '^{' | tail -n 1 \
    > "$SWEEP_DIR/headline_$N.json"
  python3 - "$SWEEP_DIR/headline_$N.json" <<'PY'
import json, sys
d = json.load(open(sys.argv[1]))
assert not d.get("failed"), f"sweep had CRASHED gates: {d.get('failed')} - fix them first"
print(f"sweep ok: {d['value']:.1f}s raw, steal {d.get('steal_sec', '?')}s, "
      f"contended={d.get('n_contended', 0)}")
PY
  cp bench_details.json "$SWEEP_DIR/sweep_$N.json"

  echo "== step 2.$i mint attempt over $i sweep(s)"
  # the mint reads the JUST-regenerated reference: per-gate quiet
  # evidence min-merged across sweeps. Sentinels on stdout (sbt does not
  # propagate the forked JVM's exit code): MINTED = done; RETRY = not
  # enough quiet windows yet, run another sweep; anything else = real
  # failure (the sbt task itself fails, -euo pipefail stops the script)
  sbt "runMain graft.RecordMint $ROUND $(ls "$SWEEP_DIR"/sweep_*.json | tr '\n' ' ')" \
    | tee "$SWEEP_DIR/mint_$i.log"
  if grep -q '^\[mint\] MINTED' "$SWEEP_DIR/mint_$i.log"; then
    echo "== minted bench_r${ROUND}_gates.json from $i sweep(s)"
    break
  elif ! grep -q '^\[mint\] RETRY' "$SWEEP_DIR/mint_$i.log"; then
    echo "FATAL: mint emitted neither MINTED nor RETRY — inspect $SWEEP_DIR/mint_$i.log" >&2
    exit 4
  elif [[ $i -eq $MAX_SWEEPS ]]; then
    echo "FATAL: no mint after $MAX_SWEEPS sweeps — the storm never left a" >&2
    echo "quiet window for some gate; evidence kept in $SWEEP_DIR" >&2
    exit 3
  fi
done

echo "== step 3: full test suite against the regenerated artifacts"
sbt test

echo "close_round: DONE — review 'git status' and commit:"
echo "  src/test/resources/plan_fingerprints.txt"
echo "  src/main/resources/bench_reference.txt"
echo "  bench_r${ROUND}_gates.json"
echo "  bench_last_quiet.json"
