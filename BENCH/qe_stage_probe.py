#!/usr/bin/env python
"""Localize the per-sweep 'optimization' second: which lazy
QueryExecution stage actually costs it?

rule_time_probe.py showed Catalyst RULES execute in ~26ms/sweep while
the tracker's optimization phase reports ~1000ms — so the time is in a
non-rule step that runs under the phase: candidates are
CacheManager.useCachedData (canonicalize + sameResult against every
persisted plan — the sweep references the persisted edge cache and a
checkpoint-rebuilt state), logical-plan stats estimation, or physical
planning/codegen prep.  This probe forces each lazy val of one sweep
frame's QueryExecution in dependency order and times the increments
driver-side:

    analyzed -> commandExecuted -> optimizedPlan -> sparkPlan
             -> executedPlan

then materializes the frame (so the loop advances exactly like the
real sweep) and repeats for n sweeps.

Usage: python BENCH/qe_stage_probe.py [--nodes 500000]
       [--edges 2000000] [--sweeps 6] [--cpus 32]
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
n_sweeps = int(sys.argv[4])
spark = (SparkSession.builder.master(f"local[{cpus}]")
    .config("spark.sql.shuffle.partitions", str(max(cpus, 8)))
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4m")
    .config("spark.sql.execution.arrow.pyspark.enabled", "true")
    .config("spark.driver.memory", "24g")
    .config("spark.ui.enabled", "false").getOrCreate())
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

rows = []
for sweep in range(n_sweeps):
    nf = _propose_moves(owned, state, 1e-4, seed=42, sweep=sweep,
                        move_frac=0.5 if sweep == 0 else 1.0, bcast=False)
    qe = nf._jdf.queryExecution()
    t = {}
    t0 = time.time(); qe.analyzed(); t["analyzed"] = time.time() - t0
    t0 = time.time(); qe.commandExecuted(); t["commandExecuted"] = time.time() - t0
    t0 = time.time(); qe.optimizedPlan(); t["optimizedPlan"] = time.time() - t0
    t0 = time.time(); qe.sparkPlan(); t["sparkPlan"] = time.time() - t0
    t0 = time.time(); qe.executedPlan(); t["executedPlan"] = time.time() - t0
    t0 = time.time()
    nxt = materialize(nf)
    t["materialize"] = time.time() - t0
    rows.append({"sweep": sweep, **{k: round(v, 3) for k, v in t.items()}})
    old = state
    state = nxt
    old.unpersist()
print("RESULT " + json.dumps(rows))
spark.stop()
"""


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nodes", type=int, default=500_000)
    ap.add_argument("--edges", type=int, default=2_000_000)
    ap.add_argument("--sweeps", type=int, default=6)
    ap.add_argument("--cpus", type=int, default=32)
    args = ap.parse_args()
    env = dict(os.environ, SLMPY_REPO=REPO)
    proc = subprocess.run(
        [sys.executable, "-c", WORKER, str(args.cpus), str(args.nodes),
         str(args.edges), str(args.sweeps)],
        capture_output=True, text=True, env=env, cwd=REPO, timeout=3600,
    )
    rows = None
    for line in proc.stdout.splitlines():
        if line.startswith("RESULT "):
            rows = json.loads(line[len("RESULT "):])
    if rows is None:
        raise RuntimeError(proc.stdout[-3000:] + proc.stderr[-3000:])
    keys = [k for k in rows[0] if k != "sweep"]
    print("| sweep | " + " | ".join(f"{k} s" for k in keys) + " |")
    print("| --- |" + " --- |" * len(keys))
    for r in rows:
        print(f"| {r['sweep']} | " + " | ".join(str(r[k]) for k in keys) + " |")
    ss = rows[1:] or rows
    print("\nsteady-state means: " + ", ".join(
        f"{k} {sum(r[k] for r in ss) / len(ss):.3f}s" for k in keys))


if __name__ == "__main__":
    main()
