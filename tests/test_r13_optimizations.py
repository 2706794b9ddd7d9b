"""Focused pins for the round-13 optimization internals.

Each test guards one optimization against semantic drift:
- the numpy XXH64 kernels (xxh64_np) must be bit-identical to the live
  JVM ``xxhash64`` expressions they replace;
- the vectorized MinHash signature / fused banding / SimHash kernels
  must produce exactly the values of the JVM-expression formulations
  they replaced (the r12 explode → 144-min-agg pipeline, the 48-band
  struct explode, and the per-bit vote fold);
- ``fan_out`` must be a row-preserving no-op semantically, only ever
  widening partitioning, and must not fire on already-wide frames.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from pim_etl_spark.llm_ops import xxh64_np as X
from pim_etl_spark.llm_ops.dedup import (
    N_BANDS,
    N_HASHES,
    _shingles,
    band_signatures,
    banded_signatures,
    minhash_signatures,
    simhash,
)
from pim_etl_spark.tuning import fan_out

_EDGE_LONGS = [0, 1, -1, 2**63 - 1, -(2**63), 42, 1234567890123456789, -98765432109876543]


def _docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy cat"),
        (3, "short doc"),
        (4, ""),
        (5, "a a a a a a a a"),
        (6, "unicode caféé naïve déjà vu über straße"),
        (7, "the quick brown fox jumps over the lazy dog"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_xxh64_np_matches_jvm_expressions(spark):
    """hash_long / coordinate_seeds reproduce xxhash64(lit(i), sbase)
    and the multi-long left fold bit-for-bit, including sign-edge
    longs."""
    df = spark.createDataFrame([(v,) for v in _EDGE_LONGS], "v long")
    idxs = (0, 1, 2, 47, 143)
    rows = df.select(
        "v",
        *[F.xxhash64(F.lit(i), F.col("v")).alias(f"c{i}") for i in idxs],
        F.xxhash64(F.col("v"), F.col("v"), F.col("v")).alias("fold3"),
    ).collect()
    seeds = X.coordinate_seeds(N_HASHES)
    for r in rows:
        v = np.uint64(np.int64(r["v"]))
        for i in idxs:
            assert int(np.int64(X.hash_long(v, seeds[i]))) == r[f"c{i}"]
        h = X.hash_long(v, X.SPARK_SEED)
        h = X.hash_long(v, h)
        h = X.hash_long(v, h)
        assert int(np.int64(h)) == r["fold3"]


def _reference_signatures(docs, n_hashes=N_HASHES):
    """The r12 JVM formulation: explode(shingles) → per-coordinate
    min(xxhash64(lit(i), xxhash64(shingle))) aggregate."""
    exploded = docs.select("doc_id", F.explode(_shingles(F.col("text"))).alias("shingle"))
    shingled = exploded.select("doc_id", F.xxhash64(F.col("shingle")).alias("sbase"))
    aggs = [F.min(F.xxhash64(F.lit(i), F.col("sbase"))).alias(f"h{i}") for i in range(n_hashes)]
    return shingled.groupBy("doc_id").agg(*aggs)


def test_minhash_signatures_match_jvm_reference(spark):
    docs = _docs(spark)
    got = {r["doc_id"]: r for r in minhash_signatures(docs).collect()}
    want = {r["doc_id"]: r for r in _reference_signatures(docs).collect()}
    assert set(got) == set(want)
    for d in want:
        for i in range(N_HASHES):
            assert got[d][f"h{i}"] == want[d][f"h{i}"], (d, i)


def test_banded_signatures_match_jvm_banding(spark):
    docs = _docs(spark)
    got = {(r.doc_id, r.band): r.band_hash for r in banded_signatures(docs).collect()}
    want = {
        (r.doc_id, r.band): r.band_hash
        for r in band_signatures(_reference_signatures(docs)).collect()
    }
    assert got == want
    assert len(got) == docs.count() * N_BANDS


def _reference_simhash(docs):
    """The r12 JVM fold: per-bit vote over feature hashes, majority →
    packed long with the MIN_LONG bit-63 weight."""
    from pim_etl_spark.llm_ops.dedup import SIMHASH_BITS

    bit_idx = F.array(*[F.lit(b) for b in range(SIMHASH_BITS)])
    feats = docs.select("doc_id", _shingles(F.col("text")).alias("feat"))
    votes = F.aggregate(
        F.transform(F.col("feat"), lambda t: F.xxhash64(t)),
        F.array_repeat(F.lit(0), SIMHASH_BITS),
        lambda acc, h: F.zip_with(acc, bit_idx, lambda a, b: a + F.getbit(h, b).cast("int")),
    )
    pow2 = F.array(
        *[F.lit(1 << b).cast("long") for b in range(SIMHASH_BITS - 1)],
        F.lit(-(1 << 63)).cast("long"),
    )
    packed = F.aggregate(
        F.zip_with(
            votes,
            pow2,
            lambda v, p: F.when(v * 2 >= F.size(F.col("feat")), p).otherwise(
                F.lit(0).cast("long")
            ),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return feats.select("doc_id", packed.alias("simhash"))


def test_simhash_matches_jvm_reference(spark):
    docs = _docs(spark)
    got = {r.doc_id: r.simhash for r in simhash(docs).collect()}
    want = {r.doc_id: r.simhash for r in _reference_simhash(docs).collect()}
    assert got == want


def test_thresholded_score_equals_unthresholded(spark):
    """The match score built on levenshtein(a, b, 4) must equal the
    r12 score built on the full distance, over every real candidate
    pair at sf0.001 — including pairs where the threshold fires (-1 →
    term 0) and pairs at the exact lev == 4 / 5 boundary."""
    from pim_etl_spark.operators.entity_resolution import scored_pairs

    sf_dir = "/root/testdata/sf0.001"
    scored = scored_pairs(spark, sf_dir)
    # reconstruct the unthresholded lev-term from the projected exact
    # name_lev feature and compare against the shipped score
    fx_cols = scored.select(
        "rec_a",
        "rec_b",
        "score",
        (
            F.col("brand_eq").cast("long") * 30
            + F.col("type_eq").cast("long") * 10
            + F.greatest(F.lit(0).cast("long"), F.lit(20) - 5 * F.col("size_diff"))
            + F.greatest(
                F.least(
                    F.lit(20).cast("long"),
                    (
                        (F.col("tok_jac_e4") * 2 - (F.col("tok_jac_e4") * 2) % 1000) / 1000
                    ).cast("long"),
                ),
                F.greatest(F.lit(0).cast("long"), F.lit(20) - 4 * F.col("name_lev")),
            )
            + F.greatest(
                F.lit(0).cast("long"),
                F.lit(20)
                - ((F.col("cents_diff") - F.col("cents_diff") % 10) / 10).cast("long"),
            )
        ).alias("ref_score"),
    )
    bad = fx_cols.filter(F.col("score") != F.col("ref_score")).count()
    assert bad == 0
    # the threshold path must actually exercise both branches
    dist = scored.select(
        F.sum((F.col("name_lev") > 4).cast("int")).alias("over"),
        F.sum((F.col("name_lev") <= 4).cast("int")).alias("under"),
    ).collect()[0]
    assert dist["over"] > 0 and dist["under"] > 0


def test_merge_branch_columns_no_spurious_empty_commit(spark, tmp_path):
    """ADVICE r12: under strategy='columns', a branch-upserted key that
    the SOURCE deleted drops out of the rebuilt upserts frame (inner
    join with the source head), so the bdelta-based probe alone would
    commit a spurious EMPTY merge version. The probe must detect the
    empty frame and skip the commit."""
    from pim_etl_spark.pipeline import versioned as V

    schema = "product_id long, price double, version long"
    src = str(tmp_path / "src")
    br = str(tmp_path / "br")
    base = spark.createDataFrame([(i, float(i), 1) for i in range(5)], schema).coalesce(1)
    V.commit_snapshot(base, src, op="bootstrap", stats_cols=("product_id",))
    V.shallow_clone(src, br)
    # branch updates key 3's price; source DELETES key 3 → conflict
    V.merge_files(
        spark,
        br,
        spark.createDataFrame([(3, 300.0, 2)], schema),
        keys=["product_id"],
        order_col="version",
    )
    V.delete_matching(
        spark, src, spark.createDataFrame([(3,)], "product_id long"), ["product_id"]
    )
    v_before = V.current_version(src)
    out = V.merge_branch(
        spark, src, br, keys=["product_id"], order_col="version", strategy="columns"
    )
    assert out["merged"]
    assert out["conflicts"] == 1
    # no spurious empty merge version: the branch's only upsert was
    # dropped by the source-side delete, so nothing new commits
    assert V.current_version(src) == v_before
    keys = {r[0] for r in V.read_version(spark, src).select("product_id").collect()}
    assert keys == {0, 1, 2, 4}


def test_footer_stats_reject_long_string_bounds(spark, tmp_path):
    """A stats column whose min/max is a >=60-byte string must NOT be
    served from footers (truncation cannot be ruled out without
    exactness flags) — the commit falls back to the Spark stats job and
    the manifest still carries the exact values."""
    from pim_etl_spark.pipeline import versioned as V

    long_a = "a" * 80
    long_b = "b" * 80
    tbl = str(tmp_path / "t")
    df = spark.createDataFrame([(1, long_a), (2, long_b), (3, "mid")], "k long, s string")
    V.commit_snapshot(df.coalesce(1), tbl, stats_cols=("s",))
    fstats = V.read_manifest(tbl, 1)["file_stats"]
    (per_col,) = fstats.values()
    # exact values regardless of which path produced them
    assert per_col["s"] == [long_a, "mid"]
    # and the footer path itself must refuse to serve this file
    data_dir = f"{tbl}/data"
    import os as _os

    files = [f for f in _os.listdir(data_dir) if f.endswith(".parquet")]
    assert V._stats_from_footers(data_dir, files, ("s",)) is None
    # short strings keep the fast path
    tbl2 = str(tmp_path / "t2")
    V.commit_snapshot(
        spark.createDataFrame([(1, "aa"), (2, "zz")], "k long, s string").coalesce(1),
        tbl2,
        stats_cols=("s",),
    )
    files2 = [f for f in _os.listdir(f"{tbl2}/data") if f.endswith(".parquet")]
    got = V._stats_from_footers(f"{tbl2}/data", files2, ("s",))
    assert got is not None
    (pc2,) = got.values()
    assert pc2["s"] == ["aa", "zz"]


def test_read_parquet_memoized_schema_and_invalidation(spark, tmp_path):
    """The memoized reader must return the same schema and rows as a
    bare read, and a REWRITTEN file (new mtime/size) must miss the
    memo and re-infer — never serve a stale schema."""
    from pim_etl_spark.sources import _SCHEMA_CACHE, read_parquet_memoized

    p = str(tmp_path / "t.parquet")
    spark.createDataFrame([(1, "a")], "k long, s string").coalesce(1).write.mode(
        "overwrite"
    ).parquet(p)
    first = read_parquet_memoized(spark, p)
    assert first.schema == spark.read.parquet(p).schema
    second = read_parquet_memoized(spark, p)  # memo hit
    assert second.schema == first.schema
    assert [tuple(r) for r in second.collect()] == [(1, "a")]
    # rewrite with a DIFFERENT schema: the stat key changes, the memo
    # misses, and the new schema is inferred
    import time as _t

    _t.sleep(0.01)
    spark.createDataFrame([(2.5, 7)], "x double, y long").coalesce(1).write.mode(
        "overwrite"
    ).parquet(p)
    third = read_parquet_memoized(spark, p)
    assert set(third.columns) == {"x", "y"}
    assert any(k[1].endswith("t.parquet") for k in _SCHEMA_CACHE)


def test_fan_out_preserves_rows_and_widens_only(spark):
    df = spark.range(0, 1000, 1, 1).select(F.col("id").alias("doc_id"))
    wide = fan_out(df, "doc_id")
    assert wide.rdd.getNumPartitions() >= df.rdd.getNumPartitions()
    assert sorted(r.doc_id for r in wide.collect()) == list(range(1000))
    # already-wide frames pass through untouched (no extra exchange)
    target = int(spark.conf.get("spark.sql.shuffle.partitions"))
    already = spark.range(0, 1000, 1, max(2, target)).select(F.col("id").alias("doc_id"))
    assert fan_out(already, "doc_id") is already
    # and the fanned marker suppresses a second repartition
    assert fan_out(wide, "doc_id") is wide
