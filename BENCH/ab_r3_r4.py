#!/usr/bin/env python
"""Same-phase A/B of the r3 vs r4 SLM sweep layout (VERDICT r3 #1).

Cross-round wall-clock comparisons on this host are confounded by
2-3x load-phase drift (adjudicated in VERDICT r3), so the claim
"the r4 union-into-agg sweep restructure is >=10% faster" is evidenced
the only defensible way: running the OLD code (git worktree pinned at
the round-3 commit) and the NEW code back-to-back in the same phase,
interleaved per core count, on the identical seed-42 input.

Usage: python BENCH/ab_r3_r4.py [--nodes 2000000] [--edges 10000000]
       [--reps 1] [--old .worktrees/r3code]
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
from slmpy_spark.graph.slm import LAST_RUN_STATS
s, d, w = g_powerlaw_arrays(n=n_nodes, m_target=m_target, seed=42)
edges = (spark.createDataFrame(pd.DataFrame({"src": s, "dst": d, "weight": w}))
         .repartition(max(cpus, 8)).persist())
edges.count()
engine.degrees(engine.symmetrize(edges)).count()
def loadavg():
    with open("/proc/loadavg") as f:
        return float(f.read().split()[0])
l0 = loadavg()
t0 = time.time()
assign, q = engine.slm(edges, seed=42, mode="scale", max_sweeps=16,
                       exact_threshold=200_000)
print("RESULT " + json.dumps({"cpus": cpus, "secs": time.time() - t0,
                              "q": q, "sweeps": LAST_RUN_STATS["sweeps"],
                              "load_pre": l0, "load_post": loadavg()}))
spark.stop()
"""


def run(code_dir: str, cpus: int, nodes: int, edges: int) -> dict:
    env = dict(os.environ, SLMPY_REPO=code_dir)
    proc = subprocess.run(
        [sys.executable, "-c", WORKER, str(cpus), str(nodes), str(edges)],
        capture_output=True, text=True, env=env, cwd=code_dir, timeout=5400,
    )
    for line in proc.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(proc.stdout[-2000:] + proc.stderr[-2000:])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nodes", type=int, default=2_000_000)
    ap.add_argument("--edges", type=int, default=10_000_000)
    ap.add_argument("--reps", type=int, default=1)
    ap.add_argument("--old", default=os.path.join(REPO, ".worktrees/r3code"))
    args = ap.parse_args()
    codes = {"r3": args.old, "r4": REPO}
    rows = []
    for rep in range(args.reps):
        for cpus in (8, 32):
            for name in ("r3", "r4"):  # back-to-back: same phase
                r = run(codes[name], cpus, args.nodes, args.edges)
                r.update(code=name, rep=rep)
                rows.append(r)
                print(f"{name} local[{cpus}] rep {rep}: {r['secs']:.1f}s "
                      f"q={r['q']!r} sweeps={r['sweeps']} "
                      f"load={r['load_pre']:.1f}->{r['load_post']:.1f}",
                      flush=True)
    print("\n| code | cpus | secs | sweeps | q |")
    print("| --- | --- | --- | --- | --- |")
    for r in rows:
        print(f"| {r['code']} | {r['cpus']} | {r['secs']:.1f} | "
              f"{r['sweeps']} | {r['q']!r} |")
    for cpus in (8, 32):
        t3 = [r["secs"] for r in rows if r["code"] == "r3" and r["cpus"] == cpus]
        t4 = [r["secs"] for r in rows if r["code"] == "r4" and r["cpus"] == cpus]
        if t3 and t4:
            m3, m4 = sum(t3) / len(t3), sum(t4) / len(t4)
            print(f"local[{cpus}]: r3 {m3:.1f}s -> r4 {m4:.1f}s "
                  f"({100 * (m3 - m4) / m3:+.1f}% faster)")


if __name__ == "__main__":
    main()
