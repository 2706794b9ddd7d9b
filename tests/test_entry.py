"""Smoke test of the driver contract."""

from __future__ import annotations

import __spark_entry__ as entrymod


def test_entry_returns_rows(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert {"s_name", "o_orderstatus", "revenue", "n_items"} == set(df.columns)


def test_queries_and_oracles_align(spark):
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert qs, "catalog is empty"
    assert set(oracles).issubset(set(qs))


def test_catalog_entries_clear_cache_on_start(spark, sf_dir):
    """Every catalog callable is wrapped by catalog._entry_scoped:
    invoking an entry clears leftover Spark caches from the previous
    entry, so a 300+-entry driver/bench run cannot accumulate executor
    storage (round-6 ADVICE) and no entry's timing can lean on a
    sibling's caches."""
    from pyspark import StorageLevel

    from pim_etl_spark.catalog import get_queries

    leftover = spark.range(100).cache()
    leftover.count()
    assert leftover.storageLevel != StorageLevel.NONE
    qs = get_queries()
    qs["bench_control"](spark, sf_dir).collect()
    # assert on THIS frame's storage, not a global zero: sibling tests
    # in the shared session may hold localCheckpoint RDD blocks, which
    # clearCache deliberately does not touch
    assert leftover.storageLevel == StorageLevel.NONE


def test_priority_bookkeeping_sets_are_consistent(spark):
    """The hand-maintained priority frozensets must stay consistent
    with the live catalog: a typo'd or stale name in _DRIVER_GREEN
    silently keeps a real entry 'pending' forever (or marks a renamed
    entry proven), and a _PENDING_FIRST/_EARLY name that is not a
    registered query never orders anything. Also pin the structural
    invariants: _PENDING_FIRST entries must actually be pending (a
    changed-code entry accidentally left in _DRIVER_GREEN would fold
    away its re-proof), and the priority order must be a permutation
    of the catalog."""
    from pim_etl_spark import catalog as C

    C.load_catalog()
    names = set(C.QUERIES)
    for label, group in (
        ("_DRIVER_GREEN", C._DRIVER_GREEN),
        ("_EARLY", C._EARLY),
        ("_PENDING_FIRST", C._PENDING_FIRST),
        ("_PENDING_LAST", C._PENDING_LAST),
        ("_LOW_PRIORITY_TWINS", C._LOW_PRIORITY_TWINS),
    ):
        unknown = sorted(set(group) - names)
        assert not unknown, f"{label} names not in the catalog: {unknown}"
    stale = sorted(set(C._PENDING_FIRST) & C._DRIVER_GREEN)
    assert not stale, f"_PENDING_FIRST entries still folded as green: {stale}"
    order = C._priority_order(list(C.QUERIES))
    assert len(order) == len(names) and set(order) == names


def test_priority_order_proven_class_is_stalest_proof_first():
    """Freshness rotation (round-10 VERDICT item 5): with zero reds the
    driver's 50-entry window is surplus, so the proven class orders by
    least-recently-sampled round (parsed from the committed
    CORRECTNESS_r*.json artifacts) — each window then maximally
    refreshes cumulative proof age instead of re-proving whatever
    registered first. Pending entries still order strictly before any
    proven entry, and every _DRIVER_GREEN entry must actually appear in
    some artifact (a fold without a sampled green would be bogus)."""
    from pim_etl_spark import catalog as C

    C.load_catalog()
    last = C._last_sampled_rounds()
    unproven_folds = sorted(n for n in C._DRIVER_GREEN if n not in last)
    assert not unproven_folds, f"folded green but never in an artifact: {unproven_folds}"
    order = C._priority_order(list(C.QUERIES))
    proven_seq = [n for n in order if n in C._DRIVER_GREEN]
    rounds = [last[n] for n in proven_seq]
    assert rounds == sorted(rounds), "proven class not stalest-first"
    first_proven = order.index(proven_seq[0])
    assert all(
        order.index(n) < first_proven for n in order if n not in C._DRIVER_GREEN
    ), "a pending entry ordered after a proven one"
