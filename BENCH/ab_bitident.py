#!/usr/bin/env python
"""Bit-identity A/B harness: run scale-mode SLM (shuffle path forced via
broadcast_threshold=1) from a given code tree and print Q + a label hash.

Usage: python BENCH/ab_bitident.py <repo_path> [nodes] [edges]

Used to prove a plan-only change left Q and the label assignment
bit-identical (VERDICT r4 item 6's 'Q bit-identical' gate) without a
full ladder run.
"""
import hashlib
import json
import os
import sys

tree = os.path.abspath(sys.argv[1])
nodes = int(sys.argv[2]) if len(sys.argv) > 2 else 60_000
m_target = int(sys.argv[3]) if len(sys.argv) > 3 else 300_000
sys.path.insert(0, tree)

import pandas as pd
from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4m")
    .config("spark.sql.execution.arrow.pyspark.enabled", "true")
    .config("spark.driver.memory", "8g")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

from tests.genfixtures import g_powerlaw_arrays
from slmpy_spark.graph.slm import slm_scale

s, d, w = g_powerlaw_arrays(n=nodes, m_target=m_target, seed=42)
edges = spark.createDataFrame(pd.DataFrame({"src": s, "dst": d, "weight": w}))
# broadcast_threshold=1 forces the shuffle-level machinery (lazy sigma,
# repartition("dst") cache, carried counts) even on a small graph;
# exact_threshold small so the hierarchy actually recurses
assign, q = slm_scale(
    edges, seed=42, max_sweeps=8, exact_threshold=5_000, broadcast_threshold=1
)
pdf = assign.orderBy("id").toPandas()
h = hashlib.sha256(pdf.to_csv(index=False).encode()).hexdigest()
print("ABRESULT " + json.dumps({"tree": tree, "q": q, "labels_sha": h,
                                "n": len(pdf)}))
spark.stop()
