#!/usr/bin/env python3
"""Fingerprint-aware diff of two bench_details.json files.

Usage: bench_diff.py OLD.json NEW.json [--threshold SECONDS]

Joins the two runs by gate name and splits every per-gate delta into
buckets a reader can act on without re-running anything:

  plan_changed   — the plan fingerprint differs: the delta is (at least
                   partly) REAL plan drift; investigate the code change.
  contended      — same plan, but one side's window saw foreign CPU load
                   (the gate's own `contended` marker): the delta is
                   measurement noise until re-run on a quiet machine.
  inflated       — same plan, no contention markers, but the RUN-LEVEL
                   ratio of same-plan totals says one whole side ran
                   slow (>= 40% across many gates): per-gate markers
                   provably miss bandwidth/bursty load (round 9: 1.86×
                   inflation, zero contended flags), so these deltas are
                   the suspect run's inflation, NOT attributable drift.
  drift          — same plan, quiet machine, abs(delta) >= threshold
                   (and >= 10% relative, so jitter on a huge gate does
                   not alert): no mechanical alibi; worth a look (data
                   change, spill, JIT cliff).
  noise          — everything else on a same-plan quiet pair: steady-
                   state jitter, ignore.
  added/removed  — gate exists on only one side.

Compares STEADY times when both sides carry them (round >= 9 artifacts),
falling back to cold so pre-round-9 files still diff. Machine-speed
normalization (a sweep on a measurably slow box must not read as uniform
drift): when BOTH artifacts carry raw probe passes the new side's times
are divided by the RELATIVE ratio of the two runs' own mean single-thread
passes (reference-free — min-merge bias and format statistic mismatches
cancel); otherwise each side divides by its recorded probe ratio, gated
on the 1.3x quiet-jitter band. Exit code is 0 unless a side fails to
parse; the tool adjudicates, it does not gate.
"""
import json
import sys

# Run-level inflation trigger: same-plan quiet totals differ by >= 40%
# across at least this many gates. One slow gate is that gate's story;
# dozens moving together with identical plans is the machine's.
INFLATED_RATIO = 1.4
INFLATED_MIN_GATES = 8


def load(path):
    with open(path) as f:
        doc = json.loads(f.read())
    qs = doc.get("queries")
    if not isinstance(qs, dict) or not qs:
        raise SystemExit(f"{path}: no per-gate 'queries' map — need bench_details.json, "
                         "not the stdout headline line")
    return doc, qs


def best_time(g):
    # steady (round >= 9) falls back to min(cold, warm) then cold, so two
    # artifacts from different rounds stay comparable.
    for k in ("steady",):
        if isinstance(g.get(k), (int, float)):
            return float(g[k])
    times = [g[k] for k in ("cold", "warm") if isinstance(g.get(k), (int, float))]
    return min(times) if times else None


# Per-side probe ratios under this band are quiet-machine jitter, not
# slowdown: the committed probe reference min-merges to the all-time-
# fastest pass, so a genuinely quiet run reads 1.0-1.3x against it
# (Bench.ProbeSlowRatio's rationale). Applying such a ratio to ONE side
# fabricates uniform drift the size of the band on every long gate —
# sub-band ratios therefore normalize to 1.0. The relative path below
# is immune (the reference cancels out of a two-run comparison) and is
# preferred whenever both artifacts carry raw probe passes.
JITTER_BAND = 1.3


def rel_probe(old_doc, new_doc):
    """Relative machine-speed ratio new/old from the two runs' OWN probe
    passes (mean of the bracketing single-thread passes — the statistic
    every probe-carrying format records raw). Reference-free: the
    committed quiet probe's min-merge bias, and the max-vs-mean
    statistic mismatch between format-3 vs_ref and format-4 adj_ratio,
    cancel out of a two-run comparison entirely. Single-thread only —
    the multi pass is per-thread-count and format-3 artifacts do not
    record the count. None when either side lacks raw passes."""
    def mean_single(doc):
        p = doc.get("probe", {})
        vals = [p.get(k) for k in ("single_start", "single_end")]
        vals = [v for v in vals if isinstance(v, (int, float)) and v > 0]
        return sum(vals) / len(vals) if vals else None
    o, n = mean_single(old_doc), mean_single(new_doc)
    return (n / o) if o and n else None


def probe_adj(doc):
    # Per-side whole-sweep machine-speed ratio vs the committed quiet
    # probe — the fallback when the relative path is unavailable (one
    # side predates the probe). Returns (ratio, source-tag); ratios
    # inside JITTER_BAND normalize to 1.0 (see the band note above).
    # bench_format >= 4 artifacts carry probe.adj_ratio (mean over the
    # bracketing ends of the worst comparable ratio); format-3 artifacts
    # recorded only probe.vs_ref — the MAX ratio the machine_slow
    # verdict hangs on, biased HIGH vs the mean, so a slow old run is if
    # anything over-corrected — still far better than reading its whole
    # machine slowdown as plan drift. (1.0, "") without probe evidence.
    p = doc.get("probe", {})
    for key, tag in (("adj_ratio", "adj_ratio"), ("vs_ref", "vs_ref(max-biased)")):
        r = p.get(key)
        if isinstance(r, (int, float)) and r > 0:
            return (float(r), tag) if r > JITTER_BAND else (1.0, "")
    return 1.0, ""


def main():
    args, threshold, it = [], 1.0, iter(sys.argv[1:])
    for a in it:
        # exact flag match only: --thresholds / --threshold2 must be
        # rejected as unknown options, not silently accepted
        if a == "--threshold" or a.startswith("--threshold="):
            threshold = float(a.split("=", 1)[1] if "=" in a else next(it))
        elif a.startswith("--"):
            raise SystemExit(f"unknown option {a}")
        else:
            args.append(a)
    if len(args) != 2:
        raise SystemExit(__doc__.strip().splitlines()[2])
    old_doc, old = load(args[0])
    new_doc, new = load(args[1])
    rel = rel_probe(old_doc, new_doc)
    if rel is not None:
        (adj_old, adj_old_src) = (1.0, "")
        (adj_new, adj_new_src) = (rel, "relative-probe")
    else:
        (adj_old, adj_old_src), (adj_new, adj_new_src) = \
            probe_adj(old_doc), probe_adj(new_doc)

    buckets = {"plan_changed": [], "contended": [], "inflated": [],
               "drift": [], "noise": []}
    added = sorted(set(new) - set(old))
    removed = sorted(set(old) - set(new))
    same_plan_quiet = []  # (name, to, tn) — the run-level inflation evidence
    for name in sorted(set(old) & set(new)):
        o, n = old[name], new[name]
        to, tn = best_time(o), best_time(n)
        # probe-normalized: all bucketing, totals, and displayed times are
        # in quiet-machine seconds (note printed below when it matters)
        to = to / adj_old if to is not None else None
        tn = tn / adj_new if tn is not None else None
        if to is None or tn is None:  # a crashed side: surface as drift
            buckets["drift"].append((name, to, tn, "crashed on one side"))
            continue
        delta = tn - to
        if o.get("plan") != n.get("plan"):
            buckets["plan_changed"].append((name, to, tn, "fingerprint differs"))
        elif o.get("contended") or n.get("contended"):
            side = "both" if o.get("contended") and n.get("contended") else \
                ("old" if o.get("contended") else "new")
            buckets["contended"].append((name, to, tn, f"foreign load on {side} run"))
        else:
            same_plan_quiet.append((name, to, tn))
            # drift needs the absolute threshold AND a loose 10% relative
            # floor (so ulp-level jitter on a long gate never alerts);
            # requiring 50% relative — the old rule — hid exactly the
            # uniform ~40% same-plan slowdowns this tool exists to catch
            if abs(delta) >= threshold and abs(delta) >= 0.10 * max(to, tn, 1e-9):
                buckets["drift"].append((name, to, tn, "same plan, quiet machine"))
            else:
                buckets["noise"].append((name, to, tn, ""))

    # Run-level inflation check BEFORE the drift bucket is trusted: when
    # the same-plan quiet totals disagree by >= 40% across many gates,
    # one side ran on a loaded machine that the per-gate /proc/stat
    # markers missed (round 9: 185.8 s recorded vs 100.1 s clean, zero
    # contended flags). Deltas in the inflation's direction move to the
    # 'inflated' bucket and are excluded from the attributable verdict.
    sum_to = sum(to for _, to, _ in same_plan_quiet)
    sum_tn = sum(tn for _, _, tn in same_plan_quiet)
    suspect = None
    if len(same_plan_quiet) >= INFLATED_MIN_GATES and min(sum_to, sum_tn) > 0:
        if sum_to >= INFLATED_RATIO * sum_tn:
            suspect = "old"
        elif sum_tn >= INFLATED_RATIO * sum_to:
            suspect = "new"
    if suspect:
        keep = []
        for name, to, tn, _ in buckets["drift"]:
            if to is None or tn is None:
                keep.append((name, to, tn, "crashed on one side"))
            elif (to > tn) == (suspect == "old"):
                buckets["inflated"].append(
                    (name, to, tn,
                     f"{suspect}-run inflated (no contention evidence — "
                     "see run-level ratio)"))
            else:
                keep.append((name, to, tn, "same plan, against the inflation "
                                           "direction — still worth a look"))
        buckets["drift"] = keep

    def total(rows):
        # a gate that crashed on one side has no before/after comparison:
        # it stays visible in its bucket's row listing (with 'null') but
        # must not smuggle its surviving side's full time into the nets
        return sum(tn - to for _, to, tn, _ in rows
                   if to is not None and tn is not None)

    # Quiet-record lead (round 15): when a side is a contended/inflated
    # sweep, the first thing the reader sees must be the committed quiet
    # round record's numbers, not the storm's — round 14's driver sweep
    # published 2.32x while the committed record read 1.21x, and a reader
    # had to know which file to trust. The sweep stays below, demoted to
    # contention forensics.
    import os
    import re as _re

    def committed_record_lead(path, doc, side):
        if not (doc.get("contended") or doc.get("inflated_vs_reference")):
            return
        search_dirs = []
        d = os.path.dirname(os.path.abspath(path))
        search_dirs.append(d)
        if os.path.abspath(os.getcwd()) != d:
            search_dirs.append(os.getcwd())
        records = []
        for sd in search_dirs:
            for f in os.listdir(sd):
                m = _re.fullmatch(r"bench_r(\d+)_gates\.json", f)
                if m:
                    records.append((int(m.group(1)), os.path.join(sd, f)))
        if not records:
            return
        # Walk records highest-round first, skipping any whose OWN doc is
        # a contended/inflated sweep (a storm-hit round record would
        # present inflated numbers as the trustworthy baseline) and the
        # artifact being diffed itself.
        rec, rec_path = None, None
        for rn, cand_path in sorted(records, reverse=True):
            if os.path.abspath(cand_path) == os.path.abspath(path):
                continue
            try:
                with open(cand_path) as f:
                    cand = json.loads(f.read())
            except (OSError, ValueError):
                continue
            if cand.get("contended") or cand.get("inflated_vs_reference"):
                continue
            rec, rec_path = cand, cand_path
            break
        if rec is None:
            return
        flags = [k for k in ("contended", "inflated_vs_reference") if doc.get(k)]
        print(f"QUIET RECORD FIRST: the {side} artifact is a "
              f"{'/'.join(flags)} sweep "
              f"(value={doc.get('value')}, vs_reference={doc.get('vs_reference')}"
              f", steal_sec={doc.get('steal_sec')}) — read the committed round "
              f"record {os.path.basename(rec_path)} as the round's performance: "
              f"value={rec.get('value')}, vs_reference={rec.get('vs_reference')}"
              f", steal_sec={rec.get('steal_sec')}. The sweep numbers below are "
              "contention forensics, not the round's result.")
        print()

    committed_record_lead(args[0], old_doc, "old")
    committed_record_lead(args[1], new_doc, "new")

    old_v, new_v = old_doc.get("value"), new_doc.get("value")
    def probe_note(doc):
        # machine-calibration probe (round 12): CPU/bandwidth ground
        # truth per run. machine_slow localizes CPU-side contention;
        # a FLAT probe on an inflated run localizes the contention to
        # I/O (the probe cannot see shared-disk pressure).
        p = doc.get("probe")
        if not p:
            return ""
        vs = p.get("vs_ref")
        tag = "machine_slow" if p.get("machine_slow") else (
            f"probe_vs_ref={vs}" if vs is not None else "probe(no ref)")
        return f"  {tag}"
    print(f"old: {args[0]}  value={old_v}  contended={old_doc.get('contended', False)}"
          + probe_note(old_doc))
    print(f"new: {args[1]}  value={new_v}  contended={new_doc.get('contended', False)}"
          + probe_note(new_doc))
    if adj_old != 1.0 or adj_new != 1.0:
        def src(tag):
            return f" [{tag}]" if tag else ""
        unit = "old-machine" if adj_new_src == "relative-probe" else "quiet-machine"
        print(f"NOTE: per-gate times probe-normalized to {unit} seconds "
              f"(old /{adj_old:.3f}{src(adj_old_src)}, "
              f"new /{adj_new:.3f}{src(adj_new_src)}) — raw times are in the "
              f"artifacts.")
    if suspect:
        ratio = (sum_to / sum_tn) if suspect == "old" else (sum_tn / sum_to)
        print(f"WARNING: {suspect} run looks inflated — same-plan quiet totals "
              f"{sum_to:.1f} s (old) vs {sum_tn:.1f} s (new), ratio {ratio:.2f}x "
              f"over {len(same_plan_quiet)} gates with zero contention markers. "
              f"Re-run the {suspect} side on a quiet machine before trusting it.")
    elif (len(same_plan_quiet) >= INFLATED_MIN_GATES and min(sum_to, sum_tn) > 0
          and max(sum_to, sum_tn) >= 1.15 * min(sum_to, sum_tn)):
        # below the inflation trigger but a uniform shift can hide entirely
        # under the per-gate absolute threshold — surface the aggregate
        print(f"NOTE: run-level same-plan totals moved "
              f"{sum_to:.1f} s -> {sum_tn:.1f} s "
              f"({(sum_tn / sum_to - 1) * 100:+.0f}%) even though per-gate "
              f"deltas may each sit under the threshold — check the aggregate.")
    print()
    for b in ("plan_changed", "contended", "inflated", "drift", "noise"):
        rows = buckets[b]
        print(f"{b}: {len(rows)} gates, net {total(rows):+.2f} s")
        show = rows if b not in ("noise", "inflated") else sorted(
            rows, key=lambda r: abs((r[2] or 0) - (r[1] or 0)), reverse=True)[:5]
        for name, to, tn, why in show:
            fo = "null" if to is None else f"{to:.2f}"
            fn = "null" if tn is None else f"{tn:.2f}"
            print(f"  {name}: {fo} -> {fn}  {why}")
        if b in ("noise", "inflated") and len(rows) > 5:
            print(f"  ... {len(rows) - 5} more")
    if added:
        print(f"added ({len(added)}): " + ", ".join(added))
    if removed:
        print(f"removed ({len(removed)}): " + ", ".join(removed))
    print()
    attributable = total(buckets["plan_changed"]) + total(buckets["drift"])
    print(f"verdict: {attributable:+.2f} s attributable (plan_changed + drift), "
          f"{total(buckets['contended']):+.2f} s under contention alibi, "
          f"{total(buckets['inflated']):+.2f} s under inflation alibi, "
          f"{total(buckets['noise']):+.2f} s noise")


if __name__ == "__main__":
    main()
