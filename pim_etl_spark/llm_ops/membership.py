"""Bloom-filter membership gate (§2.10): approximate set membership
for incremental-ingest fast paths — "have we already crawled this
URL / ingested this doc id?" answered without joining the corpus.

OSS Spark does not register ``bloom_filter_agg``/``might_contain`` in
SQL, and PySpark does not expose ``df.stat.bloomFilter``, so the
filter is built natively as a **words table**: k positions per key
(``xxhash64(key, seed)`` mod m), packed distributed via
``groupBy(word) → bit_or(1 << bit)``. The result is m/64 rows — a
model-sized artifact (16 K rows for a 2^20-bit filter) that persists
like the IVF/PQ indexes and broadcast-joins against any probe batch.
Everything stays JVM-side whole-stage-codegen: build is one shuffle of
(word, bitmask) pairs, probe is a generator explode + broadcast join +
per-key ``min(hit)``.

Guarantees (and what the catalog entry proves): a key that was added
can NEVER test absent (no false negatives — the gate may only send
extra keys to the expensive verify path, never lose one); false
positives are bounded by the classic (1-e^{-kn/m})^k rate. At 100 TB
size m to the corpus key count or shard the filter by key prefix into
a words table per shard — the probe join key (word) already contains
the shard.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pim_etl_spark.catalog import query
from pim_etl_spark.sources import load_table

NUM_BITS = 1 << 20  # 16 K packed words — broadcast-sized
NUM_HASHES = 7


def _positions(df: DataFrame, key_col: str, num_bits: int, num_hashes: int) -> DataFrame:
    """k (word, bit) coordinates per key: pos_i = xxhash64(key, i) mod m."""
    seed = F.explode(F.array(*[F.lit(i) for i in range(num_hashes)])).alias("seed")
    pos = F.pmod(F.xxhash64(F.col(key_col), F.col("seed")), F.lit(num_bits))
    return (
        df.select(F.col(key_col), seed)
        .select(
            key_col,
            (pos / 64).cast("int").alias("word"),
            (pos % 64).cast("int").alias("bit"),
        )
    )


def build_bloom_words(
    df: DataFrame, key_col: str, num_bits: int = NUM_BITS, num_hashes: int = NUM_HASHES
) -> DataFrame:
    """Distributed Bloom build → (word int, bits long) table. One
    shuffle, keyed by word (cardinality m/64, never data-sized)."""
    return (
        _positions(df, key_col, num_bits, num_hashes)
        .groupBy("word")
        .agg(F.bit_or(F.expr("shiftleft(CAST(1 AS BIGINT), bit)")).alias("bits"))
    )


def bloom_probe(
    probe: DataFrame,
    key_col: str,
    bloom_words: DataFrame,
    num_bits: int = NUM_BITS,
    num_hashes: int = NUM_HASHES,
) -> DataFrame:
    """Adds ``maybe_present``: true iff all k bits are set. Probe cost
    is a generator explode + broadcast join — no corpus scan."""
    coords = _positions(probe.select(key_col).distinct(), key_col, num_bits, num_hashes)
    hit = F.coalesce(
        F.expr("shiftright(bits, bit) & CAST(1 AS BIGINT)"),
        F.lit(0).cast("long"),
    )
    verdict = (
        coords.join(F.broadcast(bloom_words), "word", "left")
        .select(key_col, hit.alias("hit"))
        .groupBy(key_col)
        .agg((F.min("hit") == 1).alias("maybe_present"))
    )
    return probe.join(verdict, key_col)


def bloom_prefilter_new_keys(
    corpus: DataFrame, incoming: DataFrame, key_col: str
) -> tuple[DataFrame, DataFrame]:
    """Incremental-ingest fast path: split ``incoming`` into
    (definitely_new, maybe_known). definitely_new can skip the
    expensive corpus join/verify entirely — the no-false-negative
    guarantee means it provably contains no known key."""
    words = build_bloom_words(corpus, key_col)
    probed = bloom_probe(incoming, key_col, words)
    return (
        probed.filter(~F.col("maybe_present")).drop("maybe_present"),
        probed.filter(F.col("maybe_present")).drop("maybe_present"),
    )


@query(
    "bloom_membership_gate",
    oracle="""
    -- exact twin of the gate's guarantees: corpus = docs with
    -- doc_id % 3 <> 0; held-out third probes as novel. The engine
    -- must flag EVERY corpus key (no false negatives — structural
    -- Bloom guarantee) and stay under a 5% FP rate on the held-out
    -- keys (true rate ~2^-7 at these m/n); the oracle recomputes the
    -- exact populations and asserts both invariants as literals.
    SELECT CAST(sum(CASE WHEN doc_id % 3 <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_corpus,
           CAST(sum(CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
           TRUE AS no_false_negatives,
           TRUE AS fp_rate_ok
    FROM documents
    """,
)
def bloom_membership_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom gate under the hash gate (the approx_distinct_counts
    pattern: the oracle pins exact populations plus invariant flags
    the engine must earn). Corpus keys are two thirds of the document
    ids; the held-out third probes as novel."""
    docs = load_table(spark, sf_dir, "documents").select(
        F.concat(F.lit("url:"), F.col("doc_id").cast("string")).alias("key"),
        (F.col("doc_id") % 3 != 0).alias("in_corpus"),
    )
    words = build_bloom_words(docs.filter("in_corpus"), "key")
    probed = bloom_probe(docs, "key", words)
    return probed.agg(
        F.sum(F.when(F.col("in_corpus"), 1).otherwise(0)).alias("n_corpus"),
        F.sum(F.when(~F.col("in_corpus"), 1).otherwise(0)).alias("n_novel"),
        (
            F.sum(F.when(F.col("in_corpus") & ~F.col("maybe_present"), 1).otherwise(0)) == 0
        ).alias("no_false_negatives"),
        (
            F.sum(F.when(~F.col("in_corpus") & F.col("maybe_present"), 1).otherwise(0))
            <= F.sum(F.when(~F.col("in_corpus"), 1).otherwise(0)) * 0.05
        ).alias("fp_rate_ok"),
    )
