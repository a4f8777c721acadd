"""Checkpointer tests: snapshot/reload, latest-step resume semantics,
metrics, lineage truncation (SURVEY.md S6, §6.2-7)."""

import pytest
from pyspark.sql import functions as F

from slmpy_spark import engine
from slmpy_spark.checkpoint import Checkpointer
from tests import genfixtures as G
from tests.conftest import edges_df


def test_save_load_roundtrip(spark, tmp_path):
    ck = Checkpointer(spark, str(tmp_path), run_id="t1")
    df = spark.createDataFrame([(1, 10), (2, 20)], "id long, community long")
    out = ck.save_state("assign", 0, df)
    assert sorted((r.id, r.community) for r in out.collect()) == [(1, 10), (2, 20)]
    re = ck.load_state("assign", 0)
    assert sorted((r.id, r.community) for r in re.collect()) == [(1, 10), (2, 20)]


def test_latest_step_and_default_load(spark, tmp_path):
    ck = Checkpointer(spark, str(tmp_path), run_id="t2")
    for step in (0, 1, 2):
        df = spark.createDataFrame([(1, step)], "id long, community long")
        ck.save_state("assign", step, df)
    assert ck.latest_step("assign") == 2
    assert ck.load_state("assign").first().community == 2
    assert ck.latest_step("nonexistent") is None
    assert ck.load_state("nonexistent") is None


def test_metrics_roundtrip(spark, tmp_path):
    ck = Checkpointer(spark, str(tmp_path), run_id="t3")
    ck.log_metric(op="slm", level=0, n_moves=5)
    ck.log_metric(op="slm", level=1, n_moves=0)
    m = ck.metrics()
    assert len(m) == 2
    assert m[0]["op"] == "slm" and m[0]["level"] == 0 and m[0]["run_id"] == "t3"
    assert m[1]["seq"] == 1


def test_resume_same_run_id(spark, tmp_path):
    ck1 = Checkpointer(spark, str(tmp_path), run_id="shared")
    df = spark.createDataFrame([(7, 7)], "id long, community long")
    ck1.save_state("assign", 3, df)
    # a new Checkpointer with the same run_id sees prior state (resume)
    ck2 = Checkpointer(spark, str(tmp_path), run_id="shared")
    assert ck2.latest_step("assign") == 3
    assert ck2.load_state("assign").first().id == 7


def test_pagerank_with_checkpointer(spark, tmp_path):
    ck = Checkpointer(spark, str(tmp_path), run_id="pr")
    e = edges_df(spark, G.g_cycle_n(8))
    ranks = engine.pagerank(e, tol=1e-10, max_iter=20, checkpoint_interval=2,
                            checkpointer=ck)
    assert ranks.count() == 8
    # metrics recorded
    assert any(m.get("op") == "pagerank" for m in ck.metrics())


def test_slm_scale_checkpoints_resumable(spark, tmp_path):
    """SURVEY §6.2-7: interrupt-and-resume equals the uninterrupted run.
    A resumed run (same run_id) restarts after the last completed level
    and must produce the identical final assignment."""
    und = G.g_two_cliques()
    e = edges_df(spark, und)
    kw = dict(seed=42, mode="scale", n_parts=2, exact_threshold=0, max_sweeps=4)

    ck = Checkpointer(spark, str(tmp_path), run_id="slm1")
    assign, q = engine.slm(e, checkpointer=ck, **kw)
    final = {r.id: r.community for r in assign.collect()}

    step = ck.latest_step("slm_supergraph")
    assert step is not None  # at least one level completed + snapshotted

    # "crashed" rerun: new Checkpointer on the same run_id, resume=True
    ck2 = Checkpointer(spark, str(tmp_path), run_id="slm1")
    assign2, q2 = engine.slm(e, checkpointer=ck2, resume=True, **kw)
    resumed = {r.id: r.community for r in assign2.collect()}
    assert resumed == final
    assert q2 == pytest.approx(q, abs=1e-9)
