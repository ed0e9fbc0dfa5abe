"""Property-based tests (hypothesis): the Spark expressions must agree with
independent pure-Python mirrors on arbitrary inputs — catching encoding/
hash/tokenization edge cases example-based tests miss."""

import string

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from sparkglm_spark.formula import parse_formula

# ---------------------------------------------------------------------------
# formula parser (pure python — fast hypothesis loop)
# ---------------------------------------------------------------------------

ident = st.text(alphabet=string.ascii_lowercase + "_", min_size=1, max_size=8)


@given(y=ident, xs=st.lists(ident, min_size=1, max_size=5, unique=True))
def test_formula_roundtrip(y, xs):
    parsed = parse_formula(f"{y} ~ {' + '.join(xs)}")
    assert parsed.target == y
    assert list(parsed.predictors) == xs
    assert parsed.intercept is True


@given(y=ident, xs=st.lists(ident, min_size=1, max_size=4, unique=True))
def test_formula_no_intercept(y, xs):
    parsed = parse_formula(f"{y} ~ {' + '.join(xs)} - 1")
    assert parsed.intercept is False
    assert list(parsed.predictors) == xs


@given(bad=st.sampled_from(["a ~ b : c", "a ~ b * c", "a ~~ b", "~ b", "a ~"]))
def test_formula_rejects_unsupported(bad):
    with pytest.raises(ValueError):
        parse_formula(bad)


# ---------------------------------------------------------------------------
# fingerprint: Spark expression vs pure-python rolling hash
# ---------------------------------------------------------------------------

_MOD = 1_000_000_007


def py_fingerprint(text: str) -> int:
    h = 0
    for ch in text:
        h = (h * 31 + ord(ch)) % _MOD
    return h


texts = st.lists(
    st.text(
        alphabet=string.ascii_letters + string.digits + " .,!?'",
        min_size=0,
        max_size=60,
    ),
    min_size=1,
    max_size=8,
)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(batch=texts)
def test_fingerprint_matches_python(spark, batch):
    from sparkglm_spark.operators.text import fingerprint

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(batch)], "doc_id long, text string"
    )
    got = {r["doc_id"]: r["fingerprint"] for r in fingerprint(df).collect()}
    want = {i: py_fingerprint(t) for i, t in enumerate(batch)}
    assert got == want


# ---------------------------------------------------------------------------
# jaccard: Spark inverted-index plan vs pure-python set arithmetic
# ---------------------------------------------------------------------------


def py_jaccard_pairs(docs, n=3, threshold=0.0):
    sets = {
        i: {t.lower()[j : j + n] for j in range(max(len(t) - n + 1, 0))}
        for i, t in docs
    }
    out = {}
    ids = sorted(sets)
    for a in range(len(ids)):
        for b in range(a + 1, len(ids)):
            sa, sb = sets[ids[a]], sets[ids[b]]
            if not sa or not sb:
                continue
            inter = len(sa & sb)
            if inter == 0:
                continue
            j = inter / (len(sa) + len(sb) - inter)
            if j >= threshold:
                out[(ids[a], ids[b])] = round(j, 9)
    return out


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    batch=st.lists(
        st.text(alphabet="abcd ", min_size=3, max_size=30), min_size=2, max_size=6
    )
)
def test_jaccard_matches_python(spark, batch):
    from sparkglm_spark.operators.dedup import jaccard_pairs

    docs = [(i, t) for i, t in enumerate(batch)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r["id_a"], r["id_b"]): round(r["jaccard"], 9)
        for r in jaccard_pairs(df, "doc_id", "text", n=3, threshold=0.0).collect()
    }
    assert got == py_jaccard_pairs(docs)


# ---------------------------------------------------------------------------
# global line dedup vs pure-python first-occurrence twin
# ---------------------------------------------------------------------------


def py_global_line_dedup(rows, min_line_chars=1):
    seen = {}
    lines_by_doc = {}
    for doc_id, text in sorted(rows):
        lines = [s.strip() for s in text.split("\n") if s.strip() != ""]
        lines_by_doc[doc_id] = lines
        for pos, line in enumerate(lines):
            if len(line) >= min_line_chars and line not in seen:
                seen[line] = (doc_id, pos)
    return {
        doc_id: "\n".join(
            line
            for pos, line in enumerate(lines)
            if len(line) < min_line_chars or seen[line] == (doc_id, pos)
        )
        for doc_id, lines in lines_by_doc.items()
    }


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    batch=st.lists(
        st.lists(
            st.text(alphabet="ab ", min_size=0, max_size=6), min_size=0, max_size=5
        ).map(lambda ls: "\n".join(ls)),
        min_size=1,
        max_size=6,
    ),
    min_chars=st.sampled_from([1, 2]),
)
def test_global_line_dedup_matches_python(spark, batch, min_chars):
    from sparkglm_spark.operators.corpus import remove_global_duplicate_lines

    rows = [(i, t) for i, t in enumerate(batch)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r["text"]
        for r in remove_global_duplicate_lines(df, min_line_chars=min_chars).collect()
    }
    assert got == py_global_line_dedup(rows, min_line_chars=min_chars)


# ---------------------------------------------------------------------------
# mixture sampling vs pure-python affine-hash twin
# ---------------------------------------------------------------------------


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    counts=st.lists(st.integers(min_value=1, max_value=30), min_size=2, max_size=4),
    weights=st.lists(
        st.floats(min_value=0.05, max_value=1.0, allow_nan=False),
        min_size=2,
        max_size=4,
    ),
)
def test_mixture_sample_matches_python(spark, counts, weights):
    import math

    from sparkglm_spark.operators.split import (
        _AFFINE_A,
        _AFFINE_B,
        _AFFINE_P,
        _BUCKETS,
        mixture_sample,
    )

    k = min(len(counts), len(weights))
    counts, weights = counts[:k], weights[:k]
    rows, nid = [], 0
    for si, n in enumerate(counts):
        for _ in range(n):
            rows.append((nid, f"s{si}"))
            nid += 1
    df = spark.createDataFrame(rows, "id long, source string")
    w = {f"s{si}": weights[si] for si in range(k)}
    got = sorted(r["id"] for r in mixture_sample(df, "id", "source", w).collect())
    # python twin: fractions + affine-hash filter
    t = min(counts[si] / weights[si] for si in range(k))
    thresh = {
        f"s{si}": int(
            round(
                math.floor(weights[si] * t / counts[si] * float(_BUCKETS))
                / _BUCKETS
                * _BUCKETS
            )
        )
        for si in range(k)
    }
    want = sorted(
        i
        for i, src in rows
        if ((i % (1 << 32)) * _AFFINE_A + _AFFINE_B) % _AFFINE_P % _BUCKETS
        < thresh[src]
    )
    assert got == want


# ---------------------------------------------------------------------------
# normalize_text: python mirror + idempotence on arbitrary unicode
# ---------------------------------------------------------------------------


def py_normalize(t: str) -> str:
    import re

    table = str.maketrans("‘’“”–— ", "''\"\"-- ")
    out = t.translate(table)
    out = re.sub(r"[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]", "", out)
    out = re.sub(r"[ \t]+", " ", out)
    out = re.sub(r" *\n *", "\n", out)
    out = re.sub(r"\n{3,}", "\n\n", out)
    return out.strip(" ")


messy_text = st.text(
    alphabet=st.sampled_from(
        list("ab \t\n\x07\x00") + ["‘", "“", "–", " ", "é"]
    ),
    max_size=40,
)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(batch=st.lists(messy_text, min_size=1, max_size=12))
def test_normalize_text_matches_python_and_is_idempotent(spark, batch):
    from sparkglm_spark.operators.text import normalize_text

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(batch)], "doc_id long, text string"
    )
    got = {r["doc_id"]: r["text"] for r in normalize_text(df).collect()}
    for i, t in enumerate(batch):
        want = py_normalize(t)
        assert got[i] == want, (repr(t), repr(got[i]), repr(want))
        assert py_normalize(want) == want  # mirror itself is idempotent


# ---------------------------------------------------------------------------
# cap_per_group: cap invariants + nesting under arbitrary group shapes
# ---------------------------------------------------------------------------


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    sizes=st.lists(st.integers(min_value=0, max_value=12), min_size=1, max_size=5),
    cap=st.integers(min_value=0, max_value=8),
)
def test_cap_per_group_invariants(spark, sizes, cap):
    from sparkglm_spark.operators.split import cap_per_group

    rows, k = [], 0
    for g, n in enumerate(sizes):
        for _ in range(n):
            rows.append((k, f"g{g}"))
            k += 1
    if not rows:
        rows = [(0, "g0")]
    df = spark.createDataFrame(rows, "id long, grp string")
    kept = cap_per_group(df, "grp", cap, "id").collect()
    from collections import Counter

    counts = Counter(r["grp"] for r in kept)
    # never exceeds the cap; groups at/below the cap keep everything
    assert all(v <= cap for v in counts.values())
    full = Counter(g for _, g in rows)
    for g, n in full.items():
        assert counts.get(g, 0) == min(n, cap)
    # nesting: the kept set at cap is a subset of the kept set at cap+1
    bigger = {
        r["id"] for r in cap_per_group(df, "grp", cap + 1, "id").collect()
    }
    assert {r["id"] for r in kept} <= bigger


# ---------------------------------------------------------------------------
# funnel: counts are monotone and bounded by users with any step event
# ---------------------------------------------------------------------------


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    events=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=5),   # user
            st.integers(min_value=0, max_value=20),  # minute offset
            st.sampled_from(["a", "b", "c"]),        # type
        ),
        min_size=1,
        max_size=30,
    )
)
def test_funnel_monotone_on_random_logs(spark, events):
    import datetime

    from sparkglm_spark.operators.funnel import funnel_counts

    rows = [
        (u, datetime.datetime(2024, 1, 1, 0, m), t) for u, m, t in events
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
    out = {r["step_idx"]: r["n_users"] for r in funnel_counts(df, ["a", "b", "c"]).collect()}
    assert out[1] >= out[2] >= out[3] >= 0
    # python replay, same strict-order semantics
    by_user = {}
    for u, m, t in events:
        by_user.setdefault(u, []).append((m, t))
    expect = {1: 0, 2: 0, 3: 0}
    for evs in by_user.values():
        prev = None
        for i, s in enumerate(["a", "b", "c"]):
            cand = [m for m, ty in evs if ty == s and (prev is None or m > prev)]
            if not cand:
                break
            prev = min(cand)
            expect[i + 1] += 1
    assert out == expect


# ---------------------------------------------------------------------------
# exchange-audit taint walker (pure python — fast hypothesis loop)
# ---------------------------------------------------------------------------


_preserving = st.sampled_from(["cast", "struct", "coalesce", "concat", "array"])
_reducing = st.sampled_from(["sha2", "xxhash64", "length", "min", "aggregate"])


@st.composite
def _wrapped_expr(draw):
    """Build `f1(f2(...(text#2, noise#3)...))` with a known verdict: the
    occurrence taints iff EVERY enclosing head preserves payload."""
    heads = draw(
        st.lists(
            st.tuples(st.booleans(), st.integers(0, 4)), min_size=0, max_size=4
        )
    )
    expr = "text#2"
    preserving_all = True
    for is_preserving, pick in heads:
        name = ["cast", "struct", "coalesce", "concat", "array"][pick] if (
            is_preserving
        ) else ["sha2", "xxhash64", "length", "min", "aggregate"][pick]
        preserving_all = preserving_all and is_preserving
        expr = f"{name}({expr}, other#9)"
    return expr, preserving_all


@given(case=_wrapped_expr())
def test_taint_walker_respects_head_stack(case):
    from sparkglm_spark.plans.inspect import _taints

    expr, expect = case
    assert _taints(expr, set(), {"text"}) == expect


@given(
    alias_chain=st.lists(
        st.integers(10, 99), min_size=1, max_size=5, unique=True
    )
)
def test_taint_fixpoint_follows_alias_chains(alias_chain):
    """text#2 AS a#10 AS a#11 ... — the fixpoint must taint every link of
    an arbitrarily long rename chain, in any binding order."""
    from sparkglm_spark.plans.inspect import tainted_expr_ids

    lines = []
    prev = "text#2"
    for i, eid in enumerate(alias_chain):
        lines.append(f"Output [1]: [{prev} AS c{i}#{eid}]")
        prev = f"c{i}#{eid}"
    # reversed order: propagation must still reach the last link
    plan = "\n".join(reversed(lines))
    tainted = tainted_expr_ids(plan, ["text"])
    assert set(alias_chain) <= tainted


@given(
    eid=st.integers(10, 99),
    reducer=st.sampled_from(["sha2", "xxhash64", "length"]),
)
def test_taint_stops_at_reductions(eid, reducer):
    from sparkglm_spark.plans.inspect import tainted_expr_ids

    plan = f"Output [1]: [{reducer}(cast(text#2 as binary), 256) AS fp#{eid}]"
    assert eid not in tainted_expr_ids(plan, ["text"])
