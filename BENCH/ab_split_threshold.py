#!/usr/bin/env python
"""split_kernel straggler A/B (the r5 decomposition's named next
target): the quiet r5 matched pair attributed ~21s of 99%-serial wall
to `split_kernel` at 2M nodes / 10M edges — one just-under-threshold
community (the power-law giant, <1M intra rows at this size) running
its whole chunked-numpy LM inside a single applyInPandas task.

Arms (giant_threshold plumbed through engine.slm → slm_scale →
_split_communities):

  A  giant_threshold=1_000_000  (default: giant stays on the
     per-community Arrow-kernel path — the measured straggler)
  B  giant_threshold=250_000    (giant trips the distributed split:
     LM-from-singletons on the intra-edge graph, JVM-side sweeps)

Qs WILL differ across arms (the distributed split consumes a different
RNG stream by design — seed ^ 0x5BD1E995); this is a wall-time
measurement to decide whether lowering the default is worth forfeiting
cross-round Q bit-identity, per the r5 decomposition reading note.

Interleaved ABAB reps at local[32] only (the straggler is
core-count-invariant, so one parallelism level suffices); per-rep
loadavg recorded.  Appends a table to BENCH/NOTES.md.

Usage: python BENCH/ab_split_threshold.py [--nodes 2000000]
       [--edges 10000000] [--reps 2] [--graph-cache path.parquet]
"""

from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys
from collections import defaultdict

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)

WORKER = r"""
import json, os, sys, time
sys.path.insert(0, os.environ["SLMPY_REPO"])
from pyspark.sql import SparkSession
cpus = int(sys.argv[1]); n_nodes = int(sys.argv[2]); m_target = int(sys.argv[3])
thr = int(sys.argv[4]); cache = sys.argv[5] if len(sys.argv) > 5 else ""
spark = (SparkSession.builder.master(f"local[{cpus}]")
    .config("spark.sql.shuffle.partitions", str(max(cpus, 8)))
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4m")
    .config("spark.sql.execution.arrow.pyspark.enabled", "true")
    .config("spark.driver.memory", os.environ.get("SLMPY_DRIVER_MEM", "24g"))
    .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
import pandas as pd
from slmpy_spark import engine
from slmpy_spark.graph.slm import LAST_RUN_STATS
if cache:
    edges = spark.read.parquet(cache).repartition(max(cpus, 8)).persist()
else:
    from tests.genfixtures import g_powerlaw_arrays
    s, d, w = g_powerlaw_arrays(n=n_nodes, m_target=m_target, seed=42)
    edges = (spark.createDataFrame(pd.DataFrame({"src": s, "dst": d, "weight": w}))
             .repartition(max(cpus, 8)).persist())
edges.count()
engine.degrees(engine.symmetrize(edges)).count()  # warm-up
t0 = time.time()
assign, q = engine.slm(edges, seed=42, mode="scale", max_sweeps=16,
                       exact_threshold=200_000, giant_threshold=thr)
print("TOTAL " + json.dumps({"cpus": cpus, "thr": thr,
                             "secs": time.time() - t0, "q": q,
                             "sweeps": LAST_RUN_STATS["sweeps"]}))
spark.stop()
"""

PHASE_RE = re.compile(r"phase level=(-?\d+) name=(\w+) secs=([\d.]+)")


def loadavg() -> float:
    with open("/proc/loadavg") as f:
        return float(f.read().split()[0])


def run_arm(cpus: int, nodes: int, edges: int, thr: int, cache: str,
            timeout: int):
    env = dict(os.environ, SLMPY_REPO=REPO, SLMPY_DEBUG="1")
    argv = [sys.executable, "-c", WORKER, str(cpus), str(nodes), str(edges),
            str(thr)]
    if cache:
        argv.append(cache)
    proc = subprocess.run(argv, capture_output=True, text=True, env=env,
                          timeout=timeout, cwd=REPO)
    total = None
    for line in proc.stdout.splitlines():
        if line.startswith("TOTAL "):
            total = json.loads(line[len("TOTAL "):])
    if total is None:
        raise RuntimeError(
            f"no TOTAL (thr={thr}):\n{proc.stdout[-2000:]}\n{proc.stderr[-2000:]}")
    phases: dict[str, float] = defaultdict(float)
    for m in PHASE_RE.finditer(proc.stderr):
        phases[m.group(2)] += float(m.group(3))
    total["split_kernel"] = round(phases.get("split_kernel", 0.0), 1)
    total["split_distributed"] = round(phases.get("split_distributed", 0.0), 1)
    total["split_intra"] = round(phases.get("split_intra", 0.0), 1)
    total["split_parent_map"] = round(phases.get("split_parent_map", 0.0), 1)
    return total


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nodes", type=int, default=2_000_000)
    ap.add_argument("--edges", type=int, default=10_000_000)
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--timeout", type=int, default=3600)
    ap.add_argument("--graph-cache", default="")
    args = ap.parse_args()

    arms = [("A", 1_000_000), ("B", 250_000)]
    rows = []
    for rep in range(args.reps):
        for name, thr in arms:  # interleaved ABAB — phase hits both arms
            la = loadavg()
            rec = run_arm(args.cpus, args.nodes, args.edges, thr,
                          args.graph_cache, args.timeout)
            rec.update(arm=name, rep=rep, loadavg_start=la)
            rows.append(rec)
            print(json.dumps(rec), flush=True)

    def med(vals):
        vals = sorted(vals)
        return vals[len(vals) // 2]

    lines = [
        "",
        "## split_kernel straggler A/B (BENCH/ab_split_threshold.py, r5)",
        "",
        f"Input {args.nodes:,} nodes / ~{args.edges:,} edges, seed 42, "
        f"local[{args.cpus}], {args.reps} interleaved reps per arm.  "
        "Arm A giant_threshold=1,000,000 (Arrow-kernel split, the measured "
        "single-task straggler); Arm B giant_threshold=250,000 (giant takes "
        "the distributed split).  Qs differ by design (distributed split "
        "uses its own RNG stream).",
        "",
        "| arm | total secs (median) | split_kernel | split_distributed "
        "| split other | sweeps | Q | loadavg starts |",
        "| --- | --- | --- | --- | --- | --- | --- | --- |",
    ]
    for name, thr in arms:
        sel = [r for r in rows if r["arm"] == name]
        lines.append(
            f"| {name} (thr={thr:,}) "
            f"| {med([r['secs'] for r in sel]):.1f} "
            f"| {med([r['split_kernel'] for r in sel]):.1f} "
            f"| {med([r['split_distributed'] for r in sel]):.1f} "
            f"| {med([r['split_intra'] + r['split_parent_map'] for r in sel]):.1f} "
            f"| {sorted(set(r['sweeps'] for r in sel))} "
            f"| {sel[0]['q']:.6f} "
            "| " + ", ".join(f"{r['loadavg_start']:.1f}" for r in sel) + " |"
        )
    text = "\n".join(lines) + "\n"
    print(text)
    with open(os.path.join(HERE, "NOTES.md"), "a") as f:
        f.write(text)
    print("appended to BENCH/NOTES.md")


if __name__ == "__main__":
    main()
