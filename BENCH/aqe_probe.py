#!/usr/bin/env python
"""Is AQE worth its per-stage planning latency in the fixed-shape
iteration loops at sandbox scale?  Runs pagerank (8 iters) and an slm
level-0-heavy run with AQE on vs off, at local[8] and local[32],
matched pairs, one rep each.  Prints a table; does not write files.

At 100 TB AQE earns its keep (skew splits, runtime coalescing); at
sandbox scale every stage's re-plan adds driver latency that is pure
serial floor.  This probe quantifies that so the ladder conf choice is
measured, not guessed.

Usage: python BENCH/aqe_probe.py [--nodes 2000000] [--edges 10000000]
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
from pyspark.sql import SparkSession
cpus = int(sys.argv[1]); n_nodes = int(sys.argv[2]); m_target = int(sys.argv[3])
aqe = sys.argv[4]; op = sys.argv[5]
b = (SparkSession.builder.master(f"local[{cpus}]")
    .config("spark.sql.shuffle.partitions", str(max(cpus, 8)))
    .config("spark.sql.adaptive.enabled", aqe)
    .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4m")
    .config("spark.sql.execution.arrow.pyspark.enabled", "true")
    .config("spark.driver.memory", "24g")
    .config("spark.ui.enabled", "false"))
spark = b.getOrCreate()
spark.sparkContext.setLogLevel("ERROR")
import pandas as pd
from tests.genfixtures import g_powerlaw_arrays
from slmpy_spark import engine
s, d, w = g_powerlaw_arrays(n=n_nodes, m_target=m_target, seed=42)
edges = (spark.createDataFrame(pd.DataFrame({"src": s, "dst": d, "weight": w}))
         .repartition(max(cpus, 8)).persist())
edges.count()
engine.degrees(engine.symmetrize(edges)).count()
t0 = time.time()
if op == "pagerank":
    engine.pagerank(edges, tol=0.0, max_iter=8).count()
    q = None
else:
    from slmpy_spark.graph.slm import LAST_RUN_STATS
    _, q = engine.slm(edges, seed=42, mode="scale", max_sweeps=16,
                      exact_threshold=200_000)
print("RESULT " + json.dumps({"cpus": cpus, "aqe": aqe, "op": op,
                              "secs": time.time() - t0, "q": repr(q)}))
spark.stop()
"""


def run(cpus, nodes, edges, aqe, op):
    env = dict(os.environ, SLMPY_REPO=REPO)
    proc = subprocess.run(
        [sys.executable, "-c", WORKER, str(cpus), str(nodes), str(edges), aqe, op],
        capture_output=True, text=True, env=env, cwd=REPO, timeout=3600,
    )
    for line in proc.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(proc.stdout[-1500:] + proc.stderr[-1500:])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nodes", type=int, default=2_000_000)
    ap.add_argument("--edges", type=int, default=10_000_000)
    ap.add_argument("--ops", default="pagerank,slm")
    args = ap.parse_args()
    rows = []
    for op in args.ops.split(","):
        for aqe in ("true", "false"):
            pair = {}
            for cpus in (8, 32):
                r = run(cpus, args.nodes, args.edges, aqe, op)
                pair[cpus] = r
                print(f"{op} aqe={aqe} local[{cpus}]: {r['secs']:.1f}s "
                      f"q={r['q']}", flush=True)
            eff = (pair[8]["secs"] / pair[32]["secs"]) / 4
            rows.append((op, aqe, pair[8]["secs"], pair[32]["secs"], eff,
                         pair[8]["q"], pair[32]["q"]))
    print("\n| op | aqe | t8 | t32 | efficiency | q8==q32 |")
    print("| --- | --- | --- | --- | --- | --- |")
    for op, aqe, t8, t32, eff, q8, q32 in rows:
        print(f"| {op} | {aqe} | {t8:.1f} | {t32:.1f} | {eff:.2f} | {q8 == q32} |")


if __name__ == "__main__":
    main()
