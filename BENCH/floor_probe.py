#!/usr/bin/env python
"""Per-sweep Catalyst planning-time probe (VERDICT r3 #6).

The 10M-edge ladder decomposition attributed a ~2.6s/sweep serial
floor to "driver job submission + Catalyst/AQE planning + stage
waves" without splitting those.  Sweeps differ only in literals
(seed/sweep/move_frac), so IF Catalyst planning were a material slice
of the floor, caching/parameterizing the plan skeleton would pay.

This probe measures the slice directly: it mirrors the shuffle-mode
sweep loop (`_propose_moves` + localCheckpoint, exactly the frames
`_distributed_local_moving` materializes) and reads Spark's
QueryPlanningTracker off each sweep frame's QueryExecution — the
driver-side analysis / optimization / physical-planning milliseconds
Catalyst actually spent, per sweep.  The remainder of the sweep wall
is execution + scheduling + AQE runtime replanning (the tracker does
not cover AQE's per-stage re-optimization; that slice is bounded
separately by BENCH/aqe_probe.py's on/off delta).

Decision rule (recorded in NOTES.md): adopt plan-reuse machinery only
if tracker planning > 10% of the per-sweep floor.

Usage: python BENCH/floor_probe.py [--nodes 500000] [--edges 2000000]
       [--sweeps 8] [--cpus 32]
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

rows = []
for sweep in range(n_sweeps):
    nf = _propose_moves(owned, state, 1e-4, seed=42, sweep=sweep,
                        move_frac=0.5 if sweep == 0 else 1.0, bcast=False)
    t0 = time.time()
    nxt = materialize(nf)
    wall = time.time() - t0
    ph = phases_ms(nf)
    rows.append({"sweep": sweep, "wall_s": round(wall, 3),
                 **{k: round(v, 1) for k, v in ph.items()}})
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
    ap.add_argument("--sweeps", type=int, default=8)
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
        raise RuntimeError(proc.stdout[-2000:] + proc.stderr[-2000:])
    keys = sorted({k for r in rows for k in r} - {"sweep", "wall_s"})
    print(f"| sweep | wall_s | {' | '.join(k + ' ms' for k in keys)} |")
    print("| --- | --- |" + " --- |" * len(keys))
    for r in rows:
        cells = " | ".join(str(r.get(k, "")) for k in keys)
        print(f"| {r['sweep']} | {r['wall_s']} | {cells} |")
    # steady-state = skip sweep 0 (cold codegen/caches)
    ss = rows[1:] or rows
    tot_plan = sum(sum(v for k, v in r.items() if k not in ("sweep", "wall_s"))
                   for r in ss) / len(ss)
    wall = sum(r["wall_s"] for r in ss) / len(ss)
    print(f"\nsteady-state mean: wall {wall:.2f}s, tracker planning "
          f"{tot_plan:.0f}ms ({100 * tot_plan / 1000 / wall:.0f}% of sweep wall)")


if __name__ == "__main__":
    main()
