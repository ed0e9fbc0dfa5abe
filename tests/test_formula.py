import pytest

from sparkglm_spark.formula import ParsedFormula, expand_dot, parse_formula


def test_basic():
    p = parse_formula("y ~ x1 + x2")
    assert p.target == "y"
    assert p.predictors == ("x1", "x2")
    assert p.intercept


def test_no_intercept():
    p = parse_formula("y ~ x1 + x2 - 1")
    assert not p.intercept
    assert p.predictors == ("x1", "x2")


def test_dot_expansion():
    p = expand_dot(parse_formula("y ~ ."), ["y", "a", "b"])
    assert p.predictors == ("a", "b")


def test_rejects_interactions():
    with pytest.raises(ValueError):
        parse_formula("y ~ x1:x2")
    with pytest.raises(ValueError):
        parse_formula("y ~ x1*x2")


def test_rejects_no_tilde():
    with pytest.raises(ValueError):
        parse_formula("y x1")


def test_str_roundtrip():
    assert str(parse_formula("y ~ a + b - 1")) == "y ~ a + b - 1"
    assert str(parse_formula("y ~ a + b")) == "y ~ a + b"
