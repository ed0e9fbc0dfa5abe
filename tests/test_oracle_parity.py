"""Mimics the driver's correctness gate: run every __spark_entry__ query in
Spark AND its DuckDB oracle on the same parquet; compare row count, column
names, and (order-insensitively) exact values — the driver hashes values, so
anything but exact equality is a failure here too."""

import math
import os
import sys

import duckdb
import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


@pytest.fixture(scope="module")
def ddb(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{os.path.join(sf_dir, t + '.parquet')}'"
        )
    return con


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
        elif pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), ignore_index=True)


def assert_frames_match(name, got: pd.DataFrame, want: pd.DataFrame):
    assert sorted(got.columns) == sorted(want.columns), f"{name}: columns differ"
    assert len(got) == len(want), f"{name}: row count {len(got)} != {len(want)}"
    g, w = normalize(got), normalize(want)
    for c in g.columns:
        gv, wv = g[c].to_numpy(), w[c].to_numpy()
        if gv.dtype.kind == "f":
            both_nan = pd.isna(gv) & pd.isna(wv)
            eq = (gv == wv) | both_nan
        else:
            eq = (pd.Series(gv).fillna("§") == pd.Series(wv).fillna("§")).to_numpy()
        if not eq.all():
            bad = int(np.argmax(~eq))
            raise AssertionError(
                f"{name}: column {c} differs at row {bad}: "
                f"spark={gv[bad]!r} oracle={wv[bad]!r} "
                f"({(~eq).sum()}/{len(eq)} rows differ)"
            )


ORACLE_NAMES = sorted(entrymod.oracle_sql())
ROWS_ONLY = sorted(set(entrymod.queries()) - set(entrymod.oracle_sql()))


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_query_matches_oracle(spark, sf_dir, ddb, name):
    got = entrymod.queries()[name](spark, sf_dir).toPandas()
    want = ddb.execute(entrymod.oracle_sql()[name]).fetchdf()
    assert_frames_match(name, got, want)


def test_every_declared_query_has_an_oracle():
    """Every queries() entry carries an exact oracle_sql() twin — the
    driver's hard hash-match signal covers the whole declared surface.
    If a genuinely SQL-inexpressible operator is ever added, remove it
    from this assertion WITH a written justification."""
    assert ROWS_ONLY == []


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_queries_run(spark, sf_dir, name):
    df = entrymod.queries()[name](spark, sf_dir)
    assert df.count() >= 0
    assert len(df.columns) > 0


def test_entry_smoke(spark):
    out = entrymod.entry(spark)
    rows = out.collect()
    assert len(rows) >= 1
    assert out.columns == ["term", "estimate", "std_error", "t_value", "p_value"]
