"""Plan inspection utilities: audit what a query actually ships across
the wire.

The scale contract of every operator in this engine is a claim about its
EXCHANGES — which columns cross them, and which never do. These helpers
turn that claim into something a user (or a test) can assert mechanically
against `explain("formatted")`, the same way this repo's own
tests/test_plans.py guards its dedup/BM25/as-of plans.
"""

from __future__ import annotations

import contextlib
import io
import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    """`explain("formatted")` as a string."""
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def exchange_schemas(
    df: DataFrame, skip_round_robin: bool = False
) -> list[dict]:
    """One entry per Exchange / BroadcastExchange node in the physical
    plan: {"node": header line, "columns": [col names], "arguments":
    partitioning spec}. With `skip_round_robin`, RoundRobinPartitioning
    exchanges (small-input fan-outs that vanish at real scale) are
    omitted. Column names are stripped of their `#exprId` suffixes."""
    lines = formatted_plan(df).splitlines()
    out: list[dict] = []
    for i, line in enumerate(lines):
        if not re.match(r"^\(\d+\) (Broadcast)?Exchange\b", line.strip()):
            continue
        inp = args = None
        for j in range(i + 1, min(i + 6, len(lines))):
            s = lines[j].strip()
            if s.startswith("Input"):
                inp = s
            elif s.startswith("Arguments"):
                args = s
        if skip_round_robin and args and "RoundRobinPartitioning" in args:
            continue
        cols = (
            re.findall(r"([A-Za-z_][\w.]*)#\d+", inp) if inp is not None else []
        )
        out.append(
            {"node": line.strip(), "columns": cols, "arguments": args or ""}
        )
    return out


def assert_no_columns_in_exchanges(
    df: DataFrame, columns: list[str], skip_round_robin: bool = True
) -> None:
    """Raise AssertionError if any of `columns` crosses an exchange — the
    mechanical form of "this pipeline never shuffles the text/payload".
    Round-robin fan-outs are exempt by default (see exchange_schemas).

    Limitation — the audit is NAME-based: it matches the column names on
    each Exchange's `Input` line, so a guarded column that crosses the
    wire under an alias (`text AS __t`) or packed inside a struct passes
    silently. It does not resolve Project lineage. When asserting over a
    plan of your own, list every alias the guarded data travels under
    (this repo's tests pass e.g. `["text", "__t", "payload"]`); the
    guarantee is "no column by these names", not full taint tracking."""
    bad = []
    for ex in exchange_schemas(df, skip_round_robin=skip_round_robin):
        hit = sorted(set(columns) & set(ex["columns"]))
        if hit:
            bad.append((ex["node"], hit))
    if bad:
        raise AssertionError(
            f"columns cross the wire: {bad}"
        )
