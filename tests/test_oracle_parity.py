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


def _cell(v):
    """One cell -> the string the driver would hash. Dtype-SENSITIVE on
    int-vs-float (int 231 -> "231", float 231.0 -> "231.0") because that is
    exactly how the driver's value hash behaves — r2's events_timeseries
    shipped red when DuckDB HUGEINT came back as float64 and the old
    numpy-``==`` comparison here couldn't see it. Width-INsensitive
    (int32 5 and int64 5 both -> "5"), matching the driver: r2 queries
    returning Spark int32 vs DuckDB BIGINT hashed green."""
    if v is None:
        return "§"
    if isinstance(v, (float, np.floating)):
        return "§nan" if math.isnan(v) else repr(float(v))
    if isinstance(v, (bool, np.bool_)):
        return repr(bool(v))
    if isinstance(v, (int, np.integer)):
        return repr(int(v))
    if isinstance(v, pd.Timestamp):
        return str(v)
    try:
        if pd.isna(v):
            return "§"
    except (TypeError, ValueError):  # arrays: pd.isna is elementwise
        pass
    return str(v)


def serialize(df: pd.DataFrame) -> pd.DataFrame:
    out = pd.DataFrame({c: df[c].map(_cell) for c in sorted(df.columns)})
    return out.sort_values(by=list(out.columns), ignore_index=True)


def assert_frames_match(name, got: pd.DataFrame, want: pd.DataFrame):
    assert sorted(got.columns) == sorted(want.columns), f"{name}: columns differ"
    assert len(got) == len(want), f"{name}: row count {len(got)} != {len(want)}"
    g, w = serialize(got), serialize(want)
    for c in g.columns:
        gv, wv = g[c].to_numpy(), w[c].to_numpy()
        eq = gv == wv
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


def test_no_oracle_declares_pandas_lossy_types(ddb):
    """DuckDB HUGEINT (e.g. SUM over BIGINT) fetches into pandas as float64,
    so the driver hashes "231.0" against Spark's "231" — identical values,
    red row (r2's events_timeseries). Bind (don't execute) every oracle and
    reject lossy declared types up front; the fix is CAST(... AS BIGINT)."""
    lossy = {"HUGEINT", "UHUGEINT"}
    offenders = {}
    for name in ORACLE_NAMES:
        rel = ddb.sql(entrymod.oracle_sql()[name])
        bad = [
            (c, str(t))
            for c, t in zip(rel.columns, rel.types)
            if str(t).upper() in lossy
        ]
        if bad:
            offenders[name] = bad
    assert not offenders, (
        f"oracles declaring pandas-lossy DuckDB types (CAST them): {offenders}"
    )


def test_registry_holds_the_50_query_cap():
    """The driver's CORRECTNESS gate evaluates at most the FIRST 50 registry
    entries — r03 shipped 62 and the last 12 (including two previously
    driver-green queries) silently went unchecked. A 51st entry must fail
    CI loudly: merge new queries into a kin entry (the *_ops union-row-set
    pattern) instead of appending. The assert is EXACT, not ≤ (r5 advice):
    a refactor that silently DROPS a registered query — and its oracle
    coverage — must fail as loudly as a 51st entry. Update the expected
    count only as a deliberate per-round decision."""
    assert len(entrymod.queries()) == 50


def test_every_declared_query_has_an_oracle():
    """Every queries() entry carries an exact oracle_sql() twin — the
    driver's hard hash-match signal covers the whole declared surface.
    If a genuinely SQL-inexpressible operator is ever added, remove it
    from this assertion WITH a written justification."""
    assert ROWS_ONLY == []


def test_entry_smoke(spark):
    out = entrymod.entry(spark)
    rows = out.collect()
    assert len(rows) >= 1
    assert out.columns == ["term", "estimate", "std_error", "t_value", "p_value"]
