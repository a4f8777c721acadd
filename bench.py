#!/usr/bin/env python
"""Benchmark harness — headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS].  Prints ONE JSON line:

  {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

plus engine-specific extras (slm_edges_per_sec — the BASELINE.md
primary metric: edges-processed/sec per SLM outer sweep).
"""

from __future__ import annotations

import json
import os
import sys
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def get_spark(cpus: int) -> SparkSession:
    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("slmpy_spark-bench")
        .config("spark.sql.shuffle.partitions", str(max(cpus, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4m")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )


def _loadavg_1m() -> float:
    try:
        with open("/proc/loadavg") as f:
            return float(f.read().split()[0])
    except Exception:
        return -1.0


def _sentinel(spark: SparkSession, sf_dir: str) -> float:
    """Code-FROZEN measurement sentinel (do not change across rounds):
    one parquet scan + one shuffle + one aggregation whose plan never
    depends on engine code.  Its wall time calibrates the host — when
    the sentinel drifts between rounds, the drift is environment, not
    code (the r2→r3 official numbers diverged 2.5× on host load alone
    and could not defend themselves)."""
    df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    q = (
        df.select(F.xxhash64("doc_id").alias("h"), F.length("text").alias("l"))
        .groupBy(F.pmod("h", F.lit(256)).alias("b"))
        .agg(F.sum("l").alias("s"))
    )
    q.count()  # warm (JVM/codegen/file listing)
    t0 = time.time()
    q.count()
    return round(time.time() - t0, 3)


def _wait_for_quiet(threshold: float, max_wait: float, poll: float = 15.0) -> float:
    """Refuse-to-measure-under-load guard: the r3/r4 official records
    were taken at loadavg 8-9 on a 32-CPU host and ran 1.5-2.5× slower
    than quiet-phase re-runs of the same code.  Wait (bounded) for the
    1-minute load to drop below `threshold` before starting the
    timed section; if it never does, proceed — the JSON carries
    loadavg_1m_start and load_warning so the record is self-indicting."""
    t0 = time.time()
    load = _loadavg_1m()
    while load > threshold and time.time() - t0 < max_wait:
        print(
            f"[bench] host busy (loadavg {load:.2f} > {threshold:g}); "
            f"waiting up to {int(max_wait - (time.time() - t0))}s for a "
            "quiet phase...",
            file=sys.stderr, flush=True,
        )
        time.sleep(poll)
        load = _loadavg_1m()
    return load


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    load_max = float(os.environ.get("SPARK_GRAFT_LOAD_MAX", "4.0"))
    load_wait = float(os.environ.get("SPARK_GRAFT_LOAD_WAIT", "600"))
    load_start = _wait_for_quiet(load_max, load_wait)

    spark = get_spark(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    sentinel_sec = _sentinel(spark, sf_dir)

    from slmpy_spark import engine
    from slmpy_spark.sources.docs import documents_to_edges

    queries: dict[str, float] = {}
    extras: dict[str, float] = {}

    def timed(name, fn):
        print(f"[bench] {name} ...", file=sys.stderr, flush=True)
        t0 = time.time()
        out = fn()
        dt = time.time() - t0
        queries[name] = round(dt, 3)
        print(f"[bench] {name}: {dt:.2f}s", file=sys.stderr, flush=True)
        return out

    # edge derivation (materialized once, reused by every operator)
    edges = documents_to_edges(spark, sf_dir)
    n_edges = timed("edges", lambda: edges.count())
    edges = edges.persist()
    edges.count()

    timed("degrees", lambda: engine.degrees(engine.symmetrize(edges)).count())

    timed(
        "pagerank_10it",
        lambda: engine.pagerank(edges, tol=0.0, max_iter=10).count(),
    )

    timed("connected_components", lambda: engine.connected_components(edges).count())

    timed(
        "label_propagation_5it",
        lambda: engine.label_propagation(edges, max_iter=5).count(),
    )

    timed("triangle_total", lambda: engine.triangle_count(edges)[0])

    # SLM scale mode — the flagship; primary metric = directed edge
    # entries actually processed per second across all LM sweeps
    # (Σ_level m_level × sweeps_level, reported by the engine — not a
    # max_sweeps assumption)
    t0 = time.time()
    assign, q = engine.slm(
        edges, seed=42, mode="scale", max_sweeps=12, exact_threshold=50_000
    )
    slm_secs = time.time() - t0
    from slmpy_spark.graph.slm import LAST_RUN_STATS

    queries["slm_scale"] = round(slm_secs, 3)
    extras["slm_q"] = round(q, 6)
    extras["slm_sweeps"] = LAST_RUN_STATS["sweeps"]
    if LAST_RUN_STATS["edge_entries_swept"]:
        extras["slm_path"] = "distributed"
        extras["slm_edges_per_sec"] = round(
            LAST_RUN_STATS["edge_entries_swept"] / slm_secs, 1
        )
    else:
        # graph fit under exact_threshold — no distributed sweeps ran;
        # report one-pass-equivalent throughput, flagged as such
        extras["slm_path"] = "exact"
        extras["slm_edges_per_sec"] = round(2 * n_edges / slm_secs, 1)

    total = round(sum(queries.values()), 3)
    print(
        json.dumps(
            {
                "metric": "total_bench_seconds",
                "value": total,
                "unit": "sec",
                "queries": queries,
                "sf": sf,
                "cpus": cpus,
                "n_edges": n_edges,
                "sentinel_sec": sentinel_sec,
                "loadavg_1m_start": load_start,
                "loadavg_1m_end": _loadavg_1m(),
                "load_warning": load_start > load_max,
                **extras,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
