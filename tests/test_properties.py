"""Property-based tests (hypothesis) for the feed parsers: round-trip
laws that must hold for arbitrary well-formed feed values."""

from __future__ import annotations

import pytest
from hypothesis import given, settings, strategies as st

from pim_etl_spark import functions as pf

pytestmark = pytest.mark.filterwarnings("ignore::pytest.PytestUnraisableExceptionWarning")

# money amounts with exactly 2 decimals, the feeds' universe
amounts = st.integers(min_value=0, max_value=10_000_000).map(lambda c: c / 100)
quantities = st.integers(min_value=0, max_value=10_000_000)


@pytest.fixture(scope="module")
def run_expr(spark):
    def _run(expr, value):
        df = spark.createDataFrame([(value,)], "v string")
        return df.select(expr.alias("out")).collect()[0].out

    return _run


@settings(max_examples=12, deadline=None)
@given(amounts)
def test_eu_decimal_roundtrip(run_expr, x):
    """parse(format_eu(x)) == x for any 2-decimal amount."""
    eu = f"{x:.2f}".replace(".", ",")
    assert run_expr(pf.parse_eu_decimal("v"), eu) == pytest.approx(x)


@settings(max_examples=12, deadline=None)
@given(quantities)
def test_thousands_roundtrip(run_expr, n):
    """parse(format_thousands(n)) == n for any quantity."""
    dotted = f"{n:,}".replace(",", ".")
    assert run_expr(pf.parse_thousands_int("v"), dotted) == n


@settings(max_examples=12, deadline=None)
@given(amounts, st.sampled_from(["£", "$", "€"]))
def test_money_symbol_roundtrip(run_expr, x, sym):
    assert run_expr(pf.parse_money("v"), f"{sym}{x:.2f}") == pytest.approx(x)


@settings(max_examples=10, deadline=None)
@given(
    st.tuples(
        st.integers(1, 999), st.integers(1, 999), st.integers(1, 999)
    ),
    st.sampled_from(["CM", "MM", "cm"]),
)
def test_dims_roundtrip(run_expr, lwh, unit):
    l, w, h = lwh
    got = run_expr(pf.dims_from_string("v"), f"{l}X{w}X{h} {unit}")
    assert (got.length, got.width, got.height) == (float(l), float(w), float(h))
    assert got.unit == unit.lower()


@settings(max_examples=10, deadline=None)
@given(st.lists(st.sampled_from(["alpha", "beta", "gamma", "x1"]), min_size=0, max_size=12))
def test_token_count_matches_python(run_expr, words):
    text = " ".join(words)
    assert run_expr(pf.token_count("v"), text) == len(words)
