#!/usr/bin/env python3
"""Design-invariant checker for the workload_gate fixture JSONs.

The analyzer-oracle gates rely on every judged pie landing on
quarter-percent-exact doubles so that no float summation order can
perturb the result (see AnalyzerGates.scala). This script re-derives
those invariants straight from the JSON fixtures (independently of both
engines) and fails loudly when an edit breaks the arithmetic design:

  - 8 non-FAILED + 2 FAILED docs
  - scheduled_time: multiples of 21600 s summing to 4 days
  - query input_size: multiples of 0.25 TB summing to 100 TB
  - cpu_time: multiples of 21600 s
  - operator walls: even integer seconds; scans sum 400, total 800
  - operator input bytes: even MB; scans sum 400 MB, total 800 MB
  - operator input rows: multiples of 1000 summing to 400k
  - ScanFilter-per-table wall sums exactly {120,80,60,40,20,10} with
    all-distinct values (top-5 cutoff binds, 6th table excluded)
"""
import json
import sys
from pathlib import Path

MB = 1048576
FIXTURE = Path(__file__).resolve().parent.parent / "src/test/resources/workload_gate"


def parse_time(s):
    if s is None:
        return None
    for suf, f in [("ns", 1e-9), ("ms", 1e-3), ("us", 1e-6), ("s", 1.0),
                   ("m", 60.0), ("h", 3600.0), ("d", 86400.0)]:
        if s.endswith(suf):
            return float(s[:-len(suf)]) * f
    return float(s)


def parse_size(s):
    if s is None:
        return None
    for suf, f in [("TB", 1024 ** 4), ("GB", 1024 ** 3), ("MB", MB),
                   ("kB", 1024), ("B", 1)]:
        if s.endswith(suf):
            return float(s[:-len(suf)]) * f
    return float(s)


def node_type(n):
    t = n["@type"]
    if t.endswith("Node"):
        t = t.rsplit(".", 1)[-1][:-len("Node")]
    return t.lower()


def iter_nodes(node):
    yield node
    t = node_type(node)
    if t == "exchange":
        children = node.get("sources", [])
    elif t == "join":
        children = [node["left"], node["right"]]
    elif t in {"remotesource", "tablescan", "metadatadelete", "values",
               "tabledelete", "refreshmaterializedview"}:
        children = []
    else:
        children = [node["source"]] if node.get("source") else []
    for c in children:
        yield from iter_nodes(c)


def iter_plans(stage):
    if stage.get("plan"):
        yield stage["plan"]["root"]
    for sub in stage.get("subStages", []):
        yield from iter_plans(sub)


def table_name(scan):
    table = scan["table"]
    handle = table["connectorHandle"]
    schema = tbl = None
    if "schemaTableName" in handle:
        schema = handle["schemaTableName"].get("schema")
        tbl = handle["schemaTableName"].get("table")
    else:
        schema = handle.get("schemaName")
        t = handle.get("tableName", handle.get("table"))
        if isinstance(t, dict):
            schema, tbl = t.get("schema"), t.get("table")
        elif t is not None:
            tbl = t
    conn = table.get("connectorId") or table.get("catalogHandle") or table.get("catalogName")
    return ".".join(v for v in [conn, schema, tbl] if v is not None)


def wall(op):
    return sum(parse_time(op.get(k)) or 0.0
               for k in ["addInputWall", "getOutputWall", "finishWall"])


def in_rows(op):
    return op.get("rawInputPositions") or op.get("inputPositions") or 0


def check(cond, msg):
    if not cond:
        print(f"FAIL: {msg}")
        check.failed = True


check.failed = False

docs = [json.loads(p.read_text()) for p in sorted(FIXTURE.glob("*.json"))]
ok_docs = [d for d in docs if d["state"] != "FAILED"]
check(len(ok_docs) == 8, f"non-FAILED docs: {len(ok_docs)} != 8")
check(len(docs) - len(ok_docs) == 2, "FAILED docs != 2")

sched = [parse_time(d["queryStats"]["totalScheduledTime"]) for d in ok_docs]
check(all(s % 21600 == 0 for s in sched), f"scheduled not all quarter-days: {sched}")
check(sum(sched) == 345600, f"scheduled sum {sum(sched)} != 345600 (4 days)")

cpu = [parse_time(d["queryStats"]["totalCpuTime"]) for d in ok_docs]
check(all(c % 21600 == 0 for c in cpu), f"cpu not all quarter-days: {cpu}")

inp = [parse_size(d["queryStats"]["rawInputDataSize"]) for d in ok_docs]
check(all(i % 2.5e11 == 0 for i in inp), f"input not all quarter-TB: {inp}")
check(sum(inp) == 1e14, f"input sum {sum(inp)} != 1e14 (100 TB)")

ops = [(d, op) for d in ok_docs for op in d["queryStats"]["operatorSummaries"]]
walls = [wall(op) for _, op in ops]
check(all(w == int(w) and int(w) % 2 == 0 for w in walls),
      f"op walls not all even ints: {sorted(set(walls))}")
scan_walls = [wall(op) for _, op in ops if "Scan" in op["operatorType"]]
check(sum(scan_walls) == 400, f"scan wall sum {sum(scan_walls)} != 400")
check(sum(walls) == 800, f"total wall sum {sum(walls)} != 800")

sizes = [parse_size(op["inputDataSize"]) for _, op in ops]
check(all(s % (2 * MB) == 0 for s in sizes), "op input bytes not all even MB")
scan_sizes = [parse_size(op["inputDataSize"]) for _, op in ops
              if "Scan" in op["operatorType"]]
check(sum(scan_sizes) == 400 * MB, f"scan bytes {sum(scan_sizes)/MB} MB != 400")
check(sum(sizes) == 800 * MB, f"total bytes {sum(sizes)/MB} MB != 800")

rows = [in_rows(op) for _, op in ops]
check(all(r % 1000 == 0 for r in rows), f"op rows not all k: {sorted(set(rows))}")
check(sum(rows) == 400_000, f"total rows {sum(rows)} != 400000")

# deepest-table resolution per scan op, last-fragment-wins node map
sf_by_table = {}
scan_by_table_wall = {}
scan_by_table_bytes = {}
for d in ok_docs:
    stage = d.get("outputStage")
    if not stage:
        continue
    node_map = {}
    for root in iter_plans(stage):
        for n in iter_nodes(root):
            node_map[n["id"]] = n
    for op in d["queryStats"]["operatorSummaries"]:
        if "Scan" not in op["operatorType"]:
            continue
        node = node_map[op["planNodeId"]]
        deepest = None
        for n in iter_nodes(node):
            if node_type(n) == "tablescan":
                deepest = n
        last = list(iter_nodes(node))[-1]
        tname = table_name(deepest if deepest is not None else last)
        scan_by_table_wall[tname] = scan_by_table_wall.get(tname, 0) + wall(op)
        scan_by_table_bytes[tname] = (scan_by_table_bytes.get(tname, 0)
                                      + parse_size(op["inputDataSize"]))
        if "ScanFilter" in op["operatorType"] and in_rows(op):
            sf_by_table[tname] = sf_by_table.get(tname, 0) + wall(op)

expected_sf = {"hive.web.users": 120, "hive.sales.items": 80,
               "iceberg.raw.events": 60, "iceberg.raw.clicks": 40,
               "hive.sales.orders": 20, "warehouse.dims": 10}
check(sf_by_table == expected_sf,
      f"ScanFilter table walls {sf_by_table} != {expected_sf}")
check(len(set(sf_by_table.values())) == len(sf_by_table),
      "ScanFilter table wall sums not distinct (top-5 cutoff tie)")
check(sum(scan_by_table_wall.values()) == 400,
      f"B18 table walls {scan_by_table_wall} don't sum to 400")
check(sum(scan_by_table_bytes.values()) == 400 * MB, "B24 table bytes != 400 MB")
check(len(set(scan_by_table_wall.values())) == len(scan_by_table_wall),
      f"B18 per-table wall ties: {scan_by_table_wall}")

print(f"tables (all scans, wall): {scan_by_table_wall}")
print(f"tables (scanfilter, wall): {sf_by_table}")
us = {}
for d in ok_docs:
    us.setdefault(d["session"]["user"], []).append(
        parse_time(d["queryStats"]["totalScheduledTime"]) / 86400)
print(f"users: {{u: (len(v), sum(v)) for u, v in us.items()}}:",
      {u: (len(v), sum(v)) for u, v in us.items()})

if check.failed:
    sys.exit(1)
print("OK: all fixture design invariants hold")
