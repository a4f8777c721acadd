#!/usr/bin/env python
"""Which Catalyst rules eat the ~1.3s/sweep planning floor, and do the
public planning-cost knobs cut it?

BENCH/floor_probe.py measured ~280ms analysis + ~950ms optimization
per sweep (32% of steady-state sweep wall at 2M edges / 32c) — above
the 10% adopt threshold, so this probe digs one level deeper before
any plan-reuse machinery is built:

1. per-RULE time via the JVM-global
   `org.apache.spark.sql.catalyst.rules.RuleExecutor.dumpTimeSpent()`
   (reset before the sweep loop, dumped after) — identifies whether a
   few known-expensive rules (constraint propagation is the classic
   iterative-workload offender) dominate, or the cost is spread thin
   (in which case only plan caching helps);
2. an A/B over conf cells, one fresh SparkSession each, same seed-42
   input, mirroring the shuffle-mode sweep loop exactly like
   floor_probe does:
     - baseline          (the engine's defaults)
     - noConstraint      spark.sql.constraintPropagation.enabled=false
     - noConstraintNoCF  + the top offenders from (1) excluded via
                         spark.sql.optimizer.excludedRules (filled in
                         manually after a first run; placeholder cell
                         runs with constraint propagation off only)

Output: one markdown table of steady-state analysis/optimization
ms/sweep + sweep wall per cell, plus the baseline cell's top-12 rules
by cumulative time.  Decision (NOTES.md): adopt a knob only if it
cuts tracker planning ≥20% with the sweep DAG unchanged (Q stays
bit-identical — verified separately by a full engine.slm A/B before
any conf change lands in the engine).

Usage: python BENCH/rule_time_probe.py [--nodes 500000]
       [--edges 2000000] [--sweeps 8] [--cpus 32]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)

WORKER = r"""
import json, os, sys, time
sys.path.insert(0, os.environ["SLMPY_REPO"])
from pyspark.sql import SparkSession, functions as F
cpus = int(sys.argv[1]); n_nodes = int(sys.argv[2]); m_target = int(sys.argv[3])
n_sweeps = int(sys.argv[4]); extra_conf = json.loads(sys.argv[5])
b = (SparkSession.builder.master(f"local[{cpus}]")
    .config("spark.sql.shuffle.partitions", str(max(cpus, 8)))
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4m")
    .config("spark.sql.execution.arrow.pyspark.enabled", "true")
    .config("spark.driver.memory", "24g")
    .config("spark.ui.enabled", "false"))
for k, v in extra_conf.items():
    b = b.config(k, v)
spark = b.getOrCreate()
spark.sparkContext.setLogLevel("ERROR")
import pandas as pd
from tests.genfixtures import g_powerlaw_arrays
from slmpy_spark import engine
from slmpy_spark.graph.slm import _propose_moves, _attach_sigma
from slmpy_spark.util import materialize

s, d, w = g_powerlaw_arrays(n=n_nodes, m_target=m_target, seed=42)
edges = (spark.createDataFrame(pd.DataFrame({"src": s, "dst": d, "weight": w}))
         .repartition(max(cpus, 8)).persist())
edges.count()
sym = engine.symmetrize(edges)
node_w = sym.groupBy(F.col("src").alias("id")).agg(F.sum("weight").alias("node_w"))
owned = sym.repartition("dst").persist()
owned.count()

state = materialize(_attach_sigma(
    node_w.select("id", F.col("id").alias("community"), "node_w"), False))

def phases_ms(df):
    out = {}
    try:
        it = df._jdf.queryExecution().tracker().phases().iterator()
        while it.hasNext():
            kv = it.next()
            ps = kv._2()
            out[str(kv._1())] = float(ps.endTimeMs() - ps.startTimeMs())
    except Exception as e:
        out["error"] = repr(e)
    return out

RE = spark._jvm.org.apache.spark.sql.catalyst.rules.RuleExecutor
rows = []
for sweep in range(n_sweeps):
    nf = _propose_moves(owned, state, 1e-4, seed=42, sweep=sweep,
                        move_frac=0.5 if sweep == 0 else 1.0, bcast=False)
    if sweep == 1:
        # reset AFTER the cold sweep so codegen/warm-up rules don't skew
        RE.resetMetrics()
    t0 = time.time()
    nxt = materialize(nf)
    wall = time.time() - t0
    ph = phases_ms(nf)
    rows.append({"sweep": sweep, "wall_s": round(wall, 3),
                 **{k: round(v, 1) for k, v in ph.items()}})
    old = state
    state = nxt
    old.unpersist()
dump = str(RE.dumpTimeSpent())
print("RESULT " + json.dumps({"rows": rows, "dump": dump}))
spark.stop()
"""


def run_cell(args, conf):
    env = dict(os.environ, SLMPY_REPO=REPO)
    proc = subprocess.run(
        [sys.executable, "-c", WORKER, str(args.cpus), str(args.nodes),
         str(args.edges), str(args.sweeps), json.dumps(conf)],
        capture_output=True, text=True, env=env, cwd=REPO, timeout=3600,
    )
    for line in proc.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(proc.stdout[-2000:] + proc.stderr[-2000:])


def top_rules(dump: str, n=12):
    # dumpTimeSpent lines: "<ruleName> <totalNanos> / <effNanos> ..."
    # format: aggregated metrics table; parse name + first number per line
    out = []
    for line in dump.splitlines():
        parts = line.split()
        if len(parts) >= 2 and parts[0].startswith("org.apache.spark"):
            try:
                out.append((parts[0].rsplit(".", 1)[-1], int(parts[1])))
            except ValueError:
                continue
    out.sort(key=lambda t: -t[1])
    return out[:n]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nodes", type=int, default=500_000)
    ap.add_argument("--edges", type=int, default=2_000_000)
    ap.add_argument("--sweeps", type=int, default=8)
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--exclude", default="",
                    help="comma-sep rule FQNs for the third cell's "
                         "spark.sql.optimizer.excludedRules")
    args = ap.parse_args()

    cells = [("baseline", {}),
             ("noConstraint",
              {"spark.sql.constraintPropagation.enabled": "false"})]
    if args.exclude:
        cells.append(("noConstraintExcl",
                      {"spark.sql.constraintPropagation.enabled": "false",
                       "spark.sql.optimizer.excludedRules": args.exclude}))

    results = {}
    for name, conf in cells:
        results[name] = run_cell(args, conf)
        print(f"cell {name}: done", flush=True)

    print("\n| cell | sweep wall s (ss mean) | analysis ms | optimization ms | planning ms |")
    print("| --- | --- | --- | --- | --- |")
    for name, res in results.items():
        ss = res["rows"][1:] or res["rows"]
        def m(key):
            vals = [r.get(key, 0.0) for r in ss]
            return sum(vals) / len(vals)
        print(f"| {name} | {m('wall_s'):.2f} | {m('analysis'):.0f} "
              f"| {m('optimization'):.0f} | {m('planning'):.0f} |")

    print("\nbaseline top rules by cumulative time (sweeps 1+):\n")
    raw = results["baseline"]["dump"]
    rules = top_rules(raw)
    if rules:
        print("| rule | total ms |")
        print("| --- | --- |")
        for name, nanos in rules:
            print(f"| {name} | {nanos / 1e6:.0f} |")
    else:
        print("(could not parse dumpTimeSpent; raw below)\n")
        print(raw[:4000])


if __name__ == "__main__":
    main()
