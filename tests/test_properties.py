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


# --- algorithmic-entry properties (round 5, session 3) --------------------
#
# Spark-side randomized checks against pure-Python references: the
# oracle gate pins behavior on the fixture corpora; these pin it on
# ADVERSARIAL corpora hypothesis invents (tiny vocabularies, repeated
# docs, all-identical docs) where prefix/position pruning and integer
# k-means tie-breaks are most likely to have edge bugs.

_WORDS = ["aa", "bb", "cc", "dd", "ee", "ff"]


def _shingle_set(text: str) -> frozenset:
    toks = text.split()
    if len(toks) < 3:
        return frozenset([" ".join(toks)])
    return frozenset(
        " ".join(toks[i : i + 3]) for i in range(len(toks) - 2)
    )


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.lists(st.sampled_from(_WORDS), min_size=1, max_size=8).map(" ".join),
        min_size=2,
        max_size=10,
    )
)
def test_prefix_filter_join_equals_bruteforce(spark, texts):
    """prefix_filter_jaccard_join must equal the brute-force all-pairs
    truth set (J >= 0.5 on shingle sets) on ANY corpus — the prefix,
    length, and position prunes are all claimed lossless."""
    import pim_etl_spark.llm_ops.dedup as dd
    from pim_etl_spark.catalog import get_queries  # noqa: F401  (registration)

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    # reuse the entry's internals by monkey-level call: build the same
    # pipeline via the public query fn requires a parquet dir, so call
    # the module pieces directly
    import tempfile, os

    d = tempfile.mkdtemp(prefix="prop-docs-")
    docs.write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
    got = {
        (r["doc_a"], r["doc_b"])
        for r in dd.prefix_filter_jaccard_join(spark, d).collect()
    }
    sets = {i: _shingle_set(" ".join(t.lower().split())) for i, t in enumerate(texts)}
    want = set()
    for a in sets:
        for b in sets:
            if a < b:
                inter = len(sets[a] & sets[b])
                union = len(sets[a] | sets[b])
                if 2 * inter >= union:
                    want.add((a, b))
    assert got == want
    import shutil

    shutil.rmtree(d, ignore_errors=True)


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.lists(st.integers(min_value=-50, max_value=50), min_size=4, max_size=4),
        min_size=5,
        max_size=16,
    )
)
def test_kmeans_int_lloyd_matches_python_reference(spark, vecs):
    """kmeans_int_lloyd assignments must equal a pure-Python Lloyd's
    run with the same integer-exact rules (quantized codes, (sum, n)
    centroids, d = ||n·x - s||²/n², tie -> smallest cluster id)."""
    import os, shutil, tempfile

    import pim_etl_spark.llm_ops.similarity as sim

    d = tempfile.mkdtemp(prefix="prop-emb-")
    spark.createDataFrame(
        [(i, [float(x) for x in v], 0) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>, label int",
    ).write.mode("overwrite").parquet(os.path.join(d, "embeddings.parquet"))

    got = {r["vec_id"]: r["cluster"] for r in sim.kmeans_int_lloyd(spark, d).collect()}

    import math

    def quant(v):
        mn, mx = min(v), max(v)
        if mx <= mn:
            return None
        return [math.floor((x - mn) / (mx - mn) * 255) for x in v]

    codes = {i: quant([float(x) for x in v]) for i, v in enumerate(vecs)}
    codes = {i: c for i, c in codes.items() if c is not None}
    seeds = sorted(codes)[: sim.KM_K]
    cents = {i: (codes[i], 1) for i in seeds}

    def assign(cents):
        out = {}
        for vid, c in codes.items():
            best = None
            for cid in sorted(cents):
                s, n = cents[cid]
                num = sum((n * x - si) * (n * x - si) for x, si in zip(c, s))
                dd_ = num / (n * n)
                if best is None or dd_ < best[0] or (dd_ == best[0] and cid < best[1]):
                    best = (dd_, cid)
            out[vid] = best[1]
        return out

    if not cents:
        assert got == {}
        shutil.rmtree(d, ignore_errors=True)
        return
    a1 = assign(cents)
    cents2 = {}
    for vid, cid in a1.items():
        s, n = cents2.get(cid, ([0] * len(codes[vid]), 0))
        cents2[cid] = ([a + b for a, b in zip(s, codes[vid])], n + 1)
    want = assign(cents2)
    assert got == want
    shutil.rmtree(d, ignore_errors=True)


@given(
    st.lists(
        st.sampled_from(["view", "click", "purchase", "error"]),
        min_size=0,
        max_size=60,
    )
)
@settings(max_examples=300, deadline=None)
def test_greedy_cep_reduction_equals_consuming_automaton(events):
    """cep_overlapping_matches' greedy SKIP PAST LAST ROW policy is
    computed as a window formula ("some view lies strictly after the
    previous purchase"); this pins its equivalence to the actual
    consuming automaton (armed on view, match+reset on purchase) over
    arbitrary event sequences — the proof obligation behind the
    entry's docstring claim."""
    # ground truth: the consuming automaton
    armed = False
    automaton_matches = 0
    for ev in events:
        if ev == "view":
            armed = True
        elif ev == "purchase":
            if armed:
                automaton_matches += 1
                armed = False
    # the window-formula reduction (mirrors the Spark/DuckDB SQL):
    # purchase at i matches iff max(view rn) over [0, i) > max(purchase
    # rn) over [0, i)
    formula_matches = 0
    last_view = 0
    prev_purchase = 0
    for rn, ev in enumerate(events, start=1):
        if ev == "purchase":
            if last_view > prev_purchase:
                formula_matches += 1
            prev_purchase = rn
        elif ev == "view":
            last_view = rn
    assert formula_matches == automaton_matches


# integer grid codes live in 0..255; drifted/negative values are
# included to pin the kernel beyond the generator's current range
code_arrays = st.integers(min_value=2, max_value=24).flatmap(
    lambda d: st.tuples(
        st.lists(st.integers(min_value=-300, max_value=300), min_size=d, max_size=d),
        st.lists(st.integers(min_value=-300, max_value=300), min_size=d, max_size=d),
    )
)


@settings(max_examples=10, deadline=None)
@given(code_arrays)
def test_sq_l2_codes_unrolled_equals_hof_property(spark, ab):
    """Property twin of the fixed-vector kernel pin: for ANY
    equal-length long arrays, the unrolled sq_l2_codes expression and
    its zip_with+aggregate fallback produce the same exact integer —
    and both equal the Python ground truth."""
    from pyspark.sql import functions as F

    from pim_etl_spark.llm_ops.similarity import sq_l2_codes

    a, b = ab
    truth = sum((x - y) * (x - y) for x, y in zip(a, b))
    df = spark.createDataFrame([(a, b)], "a array<long>, b array<long>")
    row = df.select(
        sq_l2_codes(F.col("a"), F.col("b"), len(a)).alias("unrolled"),
        sq_l2_codes(F.col("a"), F.col("b"), None).alias("hof"),
    ).collect()[0]
    assert row.unrolled == row.hof == truth
