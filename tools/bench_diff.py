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
  noise          — same plan, quiet machine, small delta (< threshold and
                   < 50% relative): steady-state jitter, ignore.
  drift          — same plan, quiet machine, delta >= threshold: no
                   mechanical alibi; worth a look (data change, spill,
                   JIT cliff).
  added/removed  — gate exists on only one side.

Compares STEADY times when both sides carry them (round >= 9 artifacts),
falling back to cold so pre-round-9 files still diff. Exit code is 0
unless a side fails to parse; the tool adjudicates, it does not gate.
"""
import json
import sys


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


def main():
    args, threshold, it = [], 1.0, iter(sys.argv[1:])
    for a in it:
        if a.startswith("--threshold"):
            threshold = float(a.split("=", 1)[1] if "=" in a else next(it))
        elif a.startswith("--"):
            raise SystemExit(f"unknown option {a}")
        else:
            args.append(a)
    if len(args) != 2:
        raise SystemExit(__doc__.strip().splitlines()[2])
    old_doc, old = load(args[0])
    new_doc, new = load(args[1])

    buckets = {"plan_changed": [], "contended": [], "drift": [], "noise": []}
    added = sorted(set(new) - set(old))
    removed = sorted(set(old) - set(new))
    for name in sorted(set(old) & set(new)):
        o, n = old[name], new[name]
        to, tn = best_time(o), best_time(n)
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
        elif abs(delta) >= threshold and abs(delta) >= 0.5 * max(to, tn, 1e-9):
            buckets["drift"].append((name, to, tn, "same plan, quiet machine"))
        else:
            buckets["noise"].append((name, to, tn, ""))

    def total(rows):
        # a gate that crashed on one side has no before/after comparison:
        # it stays visible in its bucket's row listing (with 'null') but
        # must not smuggle its surviving side's full time into the nets
        return sum(tn - to for _, to, tn, _ in rows
                   if to is not None and tn is not None)

    old_v, new_v = old_doc.get("value"), new_doc.get("value")
    print(f"old: {args[0]}  value={old_v}  contended={old_doc.get('contended', False)}")
    print(f"new: {args[1]}  value={new_v}  contended={new_doc.get('contended', False)}")
    print()
    for b in ("plan_changed", "contended", "drift", "noise"):
        rows = buckets[b]
        print(f"{b}: {len(rows)} gates, net {total(rows):+.2f} s")
        show = rows if b != "noise" else sorted(
            rows, key=lambda r: abs((r[2] or 0) - (r[1] or 0)), reverse=True)[:5]
        for name, to, tn, why in show:
            fo = "null" if to is None else f"{to:.2f}"
            fn = "null" if tn is None else f"{tn:.2f}"
            print(f"  {name}: {fo} -> {fn}  {why}")
        if b == "noise" and len(rows) > 5:
            print(f"  ... {len(rows) - 5} more under threshold")
    if added:
        print(f"added ({len(added)}): " + ", ".join(added))
    if removed:
        print(f"removed ({len(removed)}): " + ", ".join(removed))
    print()
    attributable = total(buckets["plan_changed"]) + total(buckets["drift"])
    print(f"verdict: {attributable:+.2f} s attributable (plan_changed + drift), "
          f"{total(buckets['contended']):+.2f} s under contention alibi, "
          f"{total(buckets['noise']):+.2f} s noise")


if __name__ == "__main__":
    main()
