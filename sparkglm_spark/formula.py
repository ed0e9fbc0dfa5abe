"""R-style formula parsing — the same narrow subset the reference's R
front-end supports (reference: R/pkg/R/utils.R:8-22 `parseFormula`):

    y ~ x1 + x2        target, predictors, intercept
    y ~ x1 + x2 - 1    no intercept
    y ~ . [- 1]        all non-target columns as predictors (convenience ext.)

No interactions (:/*), no transforms, matching the reference's subset.
Unlike the reference (which parses the intercept flag but never consumes it —
SURVEY §2.13.5), our fit honors `intercept` by injecting a lit(1.0) column.
"""

from __future__ import annotations

import re
from dataclasses import dataclass


@dataclass(frozen=True)
class ParsedFormula:
    target: str
    predictors: tuple[str, ...]
    intercept: bool

    def __str__(self) -> str:
        rhs = " + ".join(self.predictors) + ("" if self.intercept else " - 1")
        return f"{self.target} ~ {rhs}"


def parse_formula(formula: str) -> ParsedFormula:
    if "~" not in formula:
        raise ValueError(f"not a formula (missing '~'): {formula!r}")
    lhs, rhs = formula.split("~", 1)
    target = lhs.strip()
    if not target:
        raise ValueError(f"formula has no target: {formula!r}")

    intercept = True
    rhs = rhs.strip()
    if not rhs:
        raise ValueError(f"formula has an empty right-hand side: {formula!r}")
    # '- 1' anywhere on the RHS drops the intercept (reference: utils.R:14-18)
    if re.search(r"-\s*1\b", rhs):
        intercept = False
        rhs = re.sub(r"-\s*1\b", "", rhs)
    if re.search(r"\+\s*1\b", rhs):
        rhs = re.sub(r"\+\s*1\b", "", rhs)

    terms = [t.strip() for t in rhs.split("+")]
    predictors = tuple(t for t in terms if t and t != "1")
    for t in predictors:
        if any(ch in t for ch in ":*()-"):
            raise ValueError(
                f"unsupported formula term {t!r}: interactions/transforms are "
                "not in the supported subset (matches reference parseFormula)"
            )
        if t != "." and not re.fullmatch(r"[A-Za-z_][A-Za-z0-9_.]*", t):
            raise ValueError(f"invalid predictor name {t!r} in formula {formula!r}")
    if not predictors and not intercept:
        raise ValueError(f"formula has no predictors: {formula!r}")
    return ParsedFormula(target=target, predictors=predictors, intercept=intercept)


def expand_dot(parsed: ParsedFormula, all_columns: list[str]) -> ParsedFormula:
    """Expand `y ~ .` against a DataFrame's columns."""
    if parsed.predictors != (".",):
        return parsed
    preds = tuple(c for c in all_columns if c != parsed.target)
    return ParsedFormula(parsed.target, preds, parsed.intercept)
