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
    plan: {"node": header line, "columns": [col names], "ids": [exprIds],
    "arguments": partitioning spec}. With `skip_round_robin`,
    RoundRobinPartitioning exchanges (small-input fan-outs that vanish at
    real scale) are omitted. Column names are stripped of their `#exprId`
    suffixes; `ids` keeps the exprIds for lineage-aware auditing."""
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
        refs = _ATTR_RE.findall(inp) if inp is not None else []
        out.append(
            {
                "node": line.strip(),
                "columns": [n for n, _ in refs],
                "ids": [int(x) for _, x in refs],
                "arguments": args or "",
            }
        )
    return out


_ATTR_RE = re.compile(r"([A-Za-z_][\w.]*)#(\d+)")

# Expression heads that PRESERVE their payload argument: a guarded column
# flowing only through these still carries the full (or normalized) bytes,
# so taint propagates. Anything else — sha2/xxhash64/length/aggregate/
# lambda reductions — is treated as a genuine reduction and stops taint:
# shipping a 32-byte fingerprint of the text is this engine's DESIGN, not
# a leak. Over-matching here would flag every dedup plan; under-matching
# only weakens the audit back toward the name-based check.
_PAYLOAD_PRESERVING = {
    "cast", "struct", "named_struct", "array", "coalesce", "if",
    "concat", "concat_ws", "lower", "upper", "trim", "ltrim", "rtrim",
    "nvl", "nvl2", "nullif", "ifnull", "alias", "knownnotnull",
    "staticinvoke",  # UTF8String wrappers around casts
}
# Deliberately NOT in the set: explode/split/element_at and friends.
# Exploded tokens/lines/windows are a FINER-GRAINED payload whose wire
# behavior is a separate per-operator contract (vocab building shuffles
# (term, count) rows by design; line dedup guards its exploded column by
# name — pass e.g. ["text", "__line"]). Propagating whole-document taint
# through explode would flag every tokenizing aggregation as a leak.


def _split_top_level(s: str) -> list[str]:
    """Split a plan list body on commas not nested in (), [] or {}."""
    parts, depth, start = [], 0, 0
    for i, ch in enumerate(s):
        if ch in "([{":
            depth += 1
        elif ch in ")]}":
            depth -= 1
        elif ch == "," and depth == 0:
            parts.append(s[start:i])
            start = i + 1
    parts.append(s[start:])
    return [p.strip() for p in parts if p.strip()]


def _binding_items(plan: str) -> list[tuple[str, int]]:
    """Every `expr AS name#id` binding in the formatted plan (Project
    Output, HashAggregate Results, Window/Generate/Expand Arguments, …)
    as (defining expr, target exprId)."""
    out: list[tuple[str, int]] = []
    for line in plan.splitlines():
        s = line.strip()
        if " AS " not in s or "#" not in s:
            continue
        body = s[s.index("[") + 1:s.rindex("]")] if "[" in s and "]" in s else s
        for item in _split_top_level(body):
            # rightmost top-level ` AS name#id` wins (nested aliases are
            # rendered inside parens and stay below top level)
            m = None
            for m in re.finditer(r" AS ([A-Za-z_][\w.]*)#(\d+)", item):
                pass
            if m is None:
                continue
            out.append((item[: m.start()], int(m.group(2))))
    return out


def _taints(expr: str, tainted_ids: set[int], guarded: set[str]) -> bool:
    """True if a tainted attribute occurs in `expr` wrapped ONLY by
    payload-preserving heads (walks the enclosing-call stack per
    occurrence by paren matching)."""
    stack: list[str] = []
    i, n = 0, len(expr)
    while i < n:
        ch = expr[i]
        if ch == "(":
            head = re.search(r"([A-Za-z_][\w.]*)\s*$", expr[:i])
            stack.append(head.group(1).lower() if head else "")
            i += 1
        elif ch == ")":
            if stack:
                stack.pop()
            i += 1
        else:
            m = _ATTR_RE.match(expr, i)
            if m:
                name, eid = m.group(1), int(m.group(2))
                if (eid in tainted_ids or name in guarded) and all(
                    h in _PAYLOAD_PRESERVING for h in stack
                ):
                    return True
                i = m.end()
            else:
                i += 1
    return False


def tainted_expr_ids(plan: str, columns: list[str]) -> set[int]:
    """ExprIds carrying the payload of any guarded column: seeded by NAME
    (every `col#id` whose name is guarded), then propagated to fixpoint
    through `AS` bindings whose defining expression keeps the payload
    (direct alias, cast, struct/array packing, concat, case/when — see
    _PAYLOAD_PRESERVING). Reductions (sha2, minhash lambdas, length,
    aggregates) intentionally STOP taint: fingerprints-on-the-wire is the
    engine's contract, not a violation of it."""
    guarded = set(columns)
    tainted: set[int] = {
        int(x) for n, x in _ATTR_RE.findall(plan) if n in guarded
    }
    bindings = _binding_items(plan)
    changed = True
    while changed:
        changed = False
        for expr, target in bindings:
            if target not in tainted and _taints(expr, tainted, guarded):
                tainted.add(target)
                changed = True
    return tainted


def wire_report(
    df: DataFrame, guarded: list[str] | None = None, skip_round_robin: bool = True
) -> str:
    """Human-readable audit of what the plan ships across the wire: one
    block per Exchange with its partitioning and column list, flagging
    any guarded column (or lineage-tainted alias/struct packing of one)
    with `!`. The `explain` companion for the engine's wire discipline —
    run it on a new pipeline before trusting its 100 TB cost profile:

        print(wire_report(my_df, guarded=["text", "payload"]))

    Purely driver-side string formatting over `exchange_schemas` /
    `tainted_expr_ids`; triggers no job."""
    guarded = list(guarded or [])
    tainted = (
        tainted_expr_ids(formatted_plan(df), guarded) if guarded else set()
    )
    exchanges = exchange_schemas(df, skip_round_robin=skip_round_robin)
    if not exchanges:
        return "no exchanges — the plan is shuffle-free"
    gset = set(guarded)
    lines = []
    for ex in exchanges:
        args = ex["arguments"].removeprefix("Arguments: ").strip()
        cols = []
        flagged = False
        for n, i in zip(ex["columns"], ex["ids"]):
            if n in gset or i in tainted:
                cols.append(f"!{n}")
                flagged = True
            else:
                cols.append(n)
        mark = "  <-- guarded payload on the wire" if flagged else ""
        lines.append(f"{ex['node']}{mark}")
        lines.append(f"  partitioning: {args}")
        lines.append(f"  columns: {', '.join(cols)}")
    return "\n".join(lines)


def assert_no_columns_in_exchanges(
    df: DataFrame, columns: list[str], skip_round_robin: bool = True
) -> None:
    """Raise AssertionError if any of `columns` — or an alias/struct
    packing of one — crosses an exchange: the mechanical form of "this
    pipeline never shuffles the text/payload". Round-robin fan-outs are
    exempt by default (see exchange_schemas).

    The audit is lineage-aware (r7): guarded names seed a taint set of
    exprIds, which propagates through every `AS` binding in the plan
    whose defining expression PRESERVES the payload (direct alias
    `text AS __t`, cast, struct/array packing, concat, case/when), so
    renamed or struct-packed payloads are caught without the caller
    enumerating aliases. Genuine reductions — sha2/xxhash fingerprints,
    minhash lambdas, length, aggregates — stop taint on purpose:
    fingerprints-only-on-the-wire is the plan contract being asserted,
    not a violation of it."""
    plan = formatted_plan(df)
    tainted = tainted_expr_ids(plan, columns)
    guarded = set(columns)
    bad = []
    for ex in exchange_schemas(df, skip_round_robin=skip_round_robin):
        hit = sorted(
            {n for n, i in zip(ex["columns"], ex["ids"]) if n in guarded}
            | {
                f"{n}#{i}(lineage)"
                for n, i in zip(ex["columns"], ex["ids"])
                if i in tainted and n not in guarded
            }
        )
        if hit:
            bad.append((ex["node"], hit))
    if bad:
        raise AssertionError(
            f"columns cross the wire: {bad}"
        )
