"""Driver-contract test: replicate the verify harness locally —
every queries() entry runs, and each oracle_sql() entry produces the
identical relation via DuckDB on the same parquet (SURVEY.md §6.2-5).

Uses sf0.001 (the driver gate runs sf0.01 with the same code path).
"""

import duckdb
import numpy as np
import pandas as pd
import pytest

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


def compare(spark_df, duck_df, name):
    s, d = normalize(spark_df), normalize(duck_df)
    assert list(s.columns) == list(d.columns), f"{name}: columns {list(s.columns)} vs {list(d.columns)}"
    assert len(s) == len(d), f"{name}: rows {len(s)} vs {len(d)}"
    for c in s.columns:
        sv, dv = s[c].to_numpy(), d[c].to_numpy()
        if np.issubdtype(s[c].dtype, np.floating) or np.issubdtype(d[c].dtype, np.floating):
            assert np.allclose(
                sv.astype(float), dv.astype(float), atol=1e-9, rtol=1e-9
            ), f"{name}.{c}"
        else:
            assert (sv == dv).all(), f"{name}.{c}"


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert {f.name for f in df.schema.fields} == {"id", "rank"}


@pytest.mark.parametrize("name", sorted(entrymod.oracle_sql().keys()))
def test_query_matches_oracle(spark, duck, name):
    q = entrymod.queries()[name]
    sql = entrymod.oracle_sql()[name]
    sdf = q(spark, SF_DIR).toPandas()
    ddf = duck.execute(sql).df()
    compare(sdf, ddf, name)


def test_rows_only_queries_run(spark):
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    for name in set(qs) - set(oracles):
        df = qs[name](spark, SF_DIR)
        assert df.count() > 0, name
