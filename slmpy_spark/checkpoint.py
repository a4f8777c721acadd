"""Checkpointer — per-iteration state persistence, lineage & metrics
(SURVEY.md S6, §5.3).

Interface is Iceberg-shaped (named snapshot tables per (state, step)
plus an append-only metrics table), backed here by a parquet directory
layout so tests stay hermetic (the sandbox ships no Iceberg runtime
jar; swapping the backend for `df.writeTo("cat.ns.t").createOrReplace()`
is a 3-line change, noted inline).

Layout:
    {root}/{run_id}/{state}/step={k}/   parquet (the snapshot)
    {root}/{run_id}/{state}/step={k}/_SUCCESS   (atomicity marker —
        Spark writes it last, so a crash mid-write is detectable)
    {root}/{run_id}/metrics/            append-only parquet rows

`save_state` returns a *re-read* DataFrame: the caller's lineage is
truncated at the checkpoint (the whole point — Catalyst otherwise
replans a k-deep join tree at iteration k).

`resume`/`latest_step` scan for the newest complete snapshot, which is
exactly the "resumable mid-convergence" contract of the north star.
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession


class Checkpointer:
    def __init__(self, spark: SparkSession, root: str, run_id: str | None = None):
        self.spark = spark
        self.root = root.rstrip("/")
        self.run_id = run_id or uuid.uuid4().hex[:12]
        self._metrics_seq = 0
        os.makedirs(self._run_dir, exist_ok=True)

    @property
    def _run_dir(self) -> str:
        return f"{self.root}/{self.run_id}"

    def _state_path(self, state: str, step: int) -> str:
        return f"{self._run_dir}/{state}/step={step}"

    # ------------------------------------------------------------ save

    def save_state(self, state: str, step: int, df: DataFrame) -> DataFrame:
        """Persist a snapshot; returns the re-read frame (fresh lineage).
        Iceberg backend would be:
        df.writeTo(f"{ns}.{state}_s{step}").createOrReplace()."""
        path = self._state_path(state, step)
        df.write.mode("overwrite").parquet(path)
        return self.spark.read.parquet(path)

    def log_metric(self, **row) -> None:
        """Append one metrics row (op/level/iter/partition counts/...).
        Tiny JSON-lines file per run — readable without Spark; the
        Iceberg backend appends to a `metrics` table instead."""
        row = {"run_id": self.run_id, "ts": time.time(), "seq": self._metrics_seq, **row}
        self._metrics_seq += 1
        with open(f"{self._run_dir}/metrics.jsonl", "a") as f:
            f.write(json.dumps(row) + "\n")

    # ---------------------------------------------------------- resume

    def latest_step(self, state: str) -> int | None:
        """Highest step with a complete (_SUCCESS-marked) snapshot."""
        d = f"{self._run_dir}/{state}"
        if not os.path.isdir(d):
            return None
        steps = []
        for name in os.listdir(d):
            if name.startswith("step=") and os.path.exists(f"{d}/{name}/_SUCCESS"):
                steps.append(int(name.split("=", 1)[1]))
        return max(steps) if steps else None

    def load_state(self, state: str, step: int | None = None) -> DataFrame | None:
        if step is None:
            step = self.latest_step(state)
        if step is None:
            return None
        return self.spark.read.parquet(self._state_path(state, step))

    def metrics(self) -> list[dict]:
        p = f"{self._run_dir}/metrics.jsonl"
        if not os.path.exists(p):
            return []
        with open(p) as f:
            return [json.loads(line) for line in f if line.strip()]
