#!/usr/bin/env python
"""Same-phase A/B: leaf-based iteration caches ON vs OFF at SMALL scale
(sf0.1, ~106k edges) for pagerank_10it and connected_components.

Round-4 leaf-based the iteration caches (checkpoint leaf under the
repartition+persist) to make per-iteration planning constant-time —
a measured win at 10M+ edges (pagerank N→4N eff 0.34→0.43).  But both
r4 sf0.1 records were SLOWER than r3's quiet 15.6 s / 9.1 s on exactly
these two queries while code-identical queries got faster — suspected:
the leaf adds a fixed localCheckpoint job (edge-sized block write)
that 10 iterations over 106k edges cannot amortize.  This script
alternates arms within each rep (matched phases) and reports medians;
the verdict gates `leaf_cache`'s auto rule.

Usage: python BENCH/ab_leaf_small.py [--reps 3] [--sf-dir /root/testdata/sf0.1]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)


def loadavg():
    with open("/proc/loadavg") as f:
        return float(f.read().split()[0])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[32]")
        .appName("ab-leaf-small")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4m")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from slmpy_spark.graph.components import connected_components
    from slmpy_spark.graph.pagerank import pagerank
    from slmpy_spark.sources.docs import documents_to_edges

    edges = documents_to_edges(spark, args.sf_dir).persist()
    m = edges.count()
    # warm-up through the whole stack once per (query, arm) cell —
    # the first pass through each code path pays JIT + codegen +
    # checkpoint-dir setup that would otherwise land entirely on rep 0
    # of one arm and skew its median
    for leaf in (True, False):
        pagerank(edges, tol=0.0, max_iter=3, leaf_cache=leaf).count()
        connected_components(edges, leaf_cache=leaf).count()

    results: dict[tuple[str, bool], list[float]] = {}
    for rep in range(args.reps):
        for leaf in (True, False):
            for name, fn in (
                ("pagerank_10it",
                 lambda: pagerank(edges, tol=0.0, max_iter=10,
                                  leaf_cache=leaf).count()),
                ("connected_components",
                 lambda: connected_components(edges, leaf_cache=leaf).count()),
            ):
                t0 = time.time()
                fn()
                dt = time.time() - t0
                results.setdefault((name, leaf), []).append(dt)
                rec = {"rep": rep, "query": name, "leaf": leaf,
                       "secs": round(dt, 3), "loadavg": loadavg(), "m": m}
                print("ROW " + json.dumps(rec), flush=True)

    print("\n== medians (sf %s, %d edges, %d reps, matched phases) =="
          % (args.sf_dir, m, args.reps))
    for name in ("pagerank_10it", "connected_components"):
        on = statistics.median(results[(name, True)])
        off = statistics.median(results[(name, False)])
        print(f"{name}: leaf ON {on:.2f}s  OFF {off:.2f}s  "
              f"delta {100 * (on - off) / off:+.1f}%")
    spark.stop()


if __name__ == "__main__":
    main()
