"""Corpus-preparation operators a large-scale training-data pipeline
needs beyond dedup: chunking, repetition-based quality signals
(Gopher-style), corpus-wide boilerplate n-gram detection, and PII
redaction. All are native column expressions — the scan side does the
token work, only small aggregates cross a shuffle.

These extend the reference's text-processing intent (the PIM engine
normalizes/needs-cleaned text fields, e.g. description prettify in
etl/transformers/midocean_transformer.py) to the document-corpus
setting; each query has a DuckDB oracle twin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pim_etl_spark.catalog import query
from pim_etl_spark.llm_ops.dedup import _tokens
from pim_etl_spark.sources import load_table
from pim_etl_spark.tuning import loop_partitions, sorted_output

CHUNK_TOKENS = 64
CHUNK_STRIDE = 48  # 16-token overlap between consecutive chunks

# normalization twin of dedup._norm_text for the oracle SQL
_NORM_SQL = "string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ')"


@query(
    "doc_chunking_overlap",
    oracle=f"""
    -- token-window chunking with overlap: chunk i covers tokens
    -- [i*stride+1, i*stride+chunk]; short docs yield exactly one chunk
    WITH t AS (
      SELECT doc_id, {_NORM_SQL} AS toks
      FROM documents WHERE doc_id < 50
    ), c AS (
      SELECT doc_id, toks,
             1 + (greatest(len(toks) - {CHUNK_TOKENS}, 0) + {CHUNK_STRIDE - 1}) // {CHUNK_STRIDE} AS n_chunks
      FROM t
    ), e AS (
      SELECT doc_id, toks,
             unnest(generate_series(0, n_chunks - 1)) AS chunk_idx
      FROM c
    )
    SELECT doc_id,
           chunk_idx,
           len(toks[chunk_idx * {CHUNK_STRIDE} + 1 : chunk_idx * {CHUNK_STRIDE} + {CHUNK_TOKENS}]) AS n_tokens,
           md5(array_to_string(toks[chunk_idx * {CHUNK_STRIDE} + 1 : chunk_idx * {CHUNK_STRIDE} + {CHUNK_TOKENS}], ' ')) AS chunk_md5
    FROM e
    ORDER BY doc_id, chunk_idx
    """,
)
def doc_chunking_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding token-window chunking (context-window preparation):
    64-token chunks on a 48-token stride, so consecutive chunks share
    16 tokens. One ``slice`` per exploded (doc, chunk_idx) row — the
    chunk-index explode happens FIRST so Catalyst never inlines a
    per-index slice lambda into an array expression (the O(tokens²)
    ProjectCollapse trap, see dedup._shingles).

    At 100 TB: chunking is scan-local (no shuffle at all — the explode
    multiplies rows within the input partition); the md5 column is
    what a downstream exact-dedup would key on.
    """
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    toks = _tokens(F.col("text"))
    base = docs.select("doc_id", toks.alias("toks"), F.size(toks).alias("n"))
    with_counts = base.withColumn(
        "n_chunks",
        (
            F.lit(1)
            + F.floor(
                (F.greatest(F.col("n") - CHUNK_TOKENS, F.lit(0)) + (CHUNK_STRIDE - 1))
                / CHUNK_STRIDE
            )
        ).cast("int"),
    )
    exploded = with_counts.select(
        "doc_id",
        "toks",
        F.explode(F.sequence(F.lit(0), F.col("n_chunks") - 1)).alias("chunk_idx"),
    )
    chunk = F.slice(F.col("toks"), F.col("chunk_idx") * CHUNK_STRIDE + 1, CHUNK_TOKENS)
    return exploded.select(
        "doc_id",
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        F.size(chunk).cast("long").alias("n_tokens"),
        F.md5(F.array_join(chunk, " ")).alias("chunk_md5"),
    ).orderBy("doc_id", "chunk_idx")


def _bigrams(c) -> F.Column:
    """Token bigrams via shifted-array zip (never a per-index slice)."""
    toks = _tokens(c)
    z = F.arrays_zip(toks.alias("t0"), F.slice(toks, 2, F.size(toks)).alias("t1"))
    full = F.filter(z, lambda x: x["t1"].isNotNull())
    return F.transform(full, lambda x: F.concat_ws(" ", x["t0"], x["t1"]))


@query(
    "repetition_topgram_stats",
    oracle="""
    -- Gopher-style repetition signal: the fraction of a doc's bigrams
    -- taken by its single most frequent bigram; docs above 8% flag as
    -- repetitive. Aggregated per language.
    WITH toks AS (
      SELECT doc_id, lang,
             unnest(string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ')) AS tok,
             generate_subscripts(string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' '), 1) AS i
      FROM documents
    ), grams AS (
      SELECT doc_id, lang,
             tok || ' ' || lead(tok) OVER (PARTITION BY doc_id ORDER BY i) AS bigram
      FROM toks
    ), counts AS (
      SELECT doc_id, lang, bigram, count(*) AS cnt
      FROM grams WHERE bigram IS NOT NULL
      GROUP BY 1, 2, 3
    ), per_doc AS (
      SELECT doc_id, lang,
             CAST(max(cnt) AS DOUBLE) / sum(cnt) AS top_frac
      FROM counts GROUP BY 1, 2
    )
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN top_frac > 0.08 THEN 1 ELSE 0 END) AS BIGINT) AS n_repetitive,
           round(avg(top_frac), 4) AS avg_top_bigram_frac
    FROM per_doc GROUP BY lang ORDER BY lang
    """,
)
def repetition_topgram_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition quality signal (the Gopher rules' top-n-gram
    fraction): per doc, the share of bigram mass held by the most
    frequent bigram; docs above 8% are flagged repetitive.

    Scale shape: bigram build is scan-local (shifted zip), the
    (doc_id, bigram) count is one map-side-combined shuffle whose keys
    are doc-local, and the per-language rollup moves one row per doc.
    """
    docs = load_table(spark, sf_dir, "documents")
    grams = docs.select(
        "doc_id", "lang", F.explode(_bigrams(F.col("text"))).alias("bigram")
    )
    counts = grams.groupBy("doc_id", "lang", "bigram").agg(F.count(F.lit(1)).alias("cnt"))
    per_doc = counts.groupBy("doc_id", "lang").agg(
        (F.max("cnt").cast("double") / F.sum("cnt")).alias("top_frac")
    )
    return (
        per_doc.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.when(F.col("top_frac") > 0.08, 1).otherwise(0)).alias("n_repetitive"),
            F.round(F.avg("top_frac"), 4).alias("avg_top_bigram_frac"),
        )
        .orderBy("lang")
    )


@query(
    "corpus_boilerplate_ngrams",
    oracle="""
    -- corpus-wide boilerplate: 5-grams appearing in >= 2 DISTINCT
    -- docs (the dedup-corpora line/ngram-level boilerplate sweep)
    WITH toks AS (
      SELECT doc_id,
             unnest(string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ')) AS tok,
             generate_subscripts(string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' '), 1) AS i
      FROM documents
    ), grams AS (
      SELECT DISTINCT doc_id,
             tok || ' ' || lead(tok, 1) OVER w || ' ' || lead(tok, 2) OVER w
                 || ' ' || lead(tok, 3) OVER w || ' ' || lead(tok, 4) OVER w AS gram
      FROM toks WINDOW w AS (PARTITION BY doc_id ORDER BY i)
    )
    SELECT gram, CAST(count(*) AS BIGINT) AS n_docs
    FROM grams WHERE gram IS NOT NULL
    GROUP BY gram HAVING count(*) >= 2
    ORDER BY n_docs DESC, gram LIMIT 20
    """,
)
def corpus_boilerplate_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document boilerplate detection: 5-gram shingles shared by
    multiple documents — the corpus-level sweep that catches template
    text exact-dedup misses (headers, disclaimers).

    Scale shape: per-doc distinct shingles explode scan-side; the only
    shuffle carries (gram, doc) pairs for the distinct-doc count, and
    the top-20 is TakeOrderedAndProject — no global sort materializes.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = _tokens(F.col("text"))
    n = F.size(toks)
    z = F.arrays_zip(
        toks.alias("t0"),
        F.slice(toks, 2, n).alias("t1"),
        F.slice(toks, 3, n).alias("t2"),
        F.slice(toks, 4, n).alias("t3"),
        F.slice(toks, 5, n).alias("t4"),
    )
    full = F.filter(z, lambda x: x["t4"].isNotNull())
    grams5 = F.array_distinct(
        F.transform(full, lambda x: F.concat_ws(" ", x["t0"], x["t1"], x["t2"], x["t3"], x["t4"]))
    )
    exploded = docs.select("doc_id", F.explode(grams5).alias("gram"))
    return (
        exploded.groupBy("gram")
        .agg(F.count(F.lit(1)).alias("n_docs"))  # per-doc distinct → count == distinct docs
        .filter(F.col("n_docs") >= 2)
        .orderBy(F.desc("n_docs"), "gram")
        .limit(20)
    )


@query(
    "pii_redaction_stats",
    oracle="""
    -- PII redaction over deterministically-injected emails/phones:
    -- regex masking + match counts (the redaction pass every
    -- training-data pipeline runs before publication)
    WITH synth AS (
      SELECT doc_id,
             text || repeat(' u' || CAST(doc_id AS VARCHAR) || '@ex.org', 1 + CAST(doc_id % 3 AS INT))
                  || ' phone 555-' || lpad(CAST((doc_id * 7) % 10000 AS VARCHAR), 4, '0') AS synth_text
      FROM documents WHERE doc_id < 30
    )
    SELECT doc_id,
           CAST(len(regexp_extract_all(synth_text, '[a-z0-9.]+@[a-z.]+[a-z]')) AS BIGINT) AS n_emails,
           CAST(len(regexp_extract_all(synth_text, '555-[0-9]{4}')) AS BIGINT) AS n_phones,
           md5(regexp_replace(regexp_replace(synth_text, '[a-z0-9.]+@[a-z.]+[a-z]', '<EMAIL>', 'g'),
                              '555-[0-9]{4}', '<PHONE>', 'g')) AS redacted_md5
    FROM synth ORDER BY doc_id
    """,
)
def pii_redaction_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub: regex masking of emails/phone patterns with per-doc
    match counts. The corpus has no real PII, so both engines inject
    the same deterministic synthetic addresses first — the point is
    proving the masking machinery (global regexp_replace + match
    count) agrees byte-for-byte.

    Scale shape: pure scan-side expressions, zero shuffles before the
    final (tiny) ordered output.
    """
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 30)
    synth = F.concat(
        F.col("text"),
        F.repeat(
            F.concat(F.lit(" u"), F.col("doc_id").cast("string"), F.lit("@ex.org")),
            (F.lit(1) + (F.col("doc_id") % 3)).cast("int"),
        ),
        F.lit(" phone 555-"),
        F.lpad(((F.col("doc_id") * 7) % 10000).cast("string"), 4, "0"),
    )
    email_re = r"[a-z0-9.]+@[a-z.]+[a-z]"
    phone_re = r"555-[0-9]{4}"
    redacted = F.regexp_replace(
        F.regexp_replace(synth, email_re, "<EMAIL>"), phone_re, "<PHONE>"
    )
    return docs.select(
        "doc_id",
        F.regexp_count(synth, F.lit(email_re)).cast("long").alias("n_emails"),
        F.regexp_count(synth, F.lit(phone_re)).cast("long").alias("n_phones"),
        F.md5(redacted).alias("redacted_md5"),
    ).orderBy("doc_id")


@query(
    "udtf_chunk_spans",
    oracle=f"""
    -- SQL twin of the Python UDTF: same span arithmetic, pure SQL
    WITH t AS (
      SELECT doc_id, len({_NORM_SQL}) AS n
      FROM documents WHERE doc_id < 40
    ), c AS (
      SELECT doc_id, n,
             1 + (greatest(n - {CHUNK_TOKENS}, 0) + {CHUNK_STRIDE - 1}) // {CHUNK_STRIDE} AS n_chunks
      FROM t
    ), e AS (
      SELECT doc_id, n, unnest(generate_series(0, n_chunks - 1)) AS chunk_idx FROM c
    )
    SELECT doc_id,
           CAST(chunk_idx AS INT) AS chunk_idx,
           CAST(chunk_idx * {CHUNK_STRIDE} + 1 AS INT) AS start_tok,
           CAST(least(chunk_idx * {CHUNK_STRIDE} + {CHUNK_TOKENS}, n) AS INT) AS end_tok
    FROM e ORDER BY doc_id, chunk_idx
    """,
)
def udtf_chunk_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF surface (SURVEY §2.9 extensibility): a table
    function yielding one row per chunk span, consumed via SQL LATERAL
    join — the user-defined-operator escape hatch when per-row logic
    must produce a VARIABLE number of rows (Spark 3.5+ API; scalar
    UDFs can't change cardinality, ``explode`` needs the array built
    first).

    The span arithmetic matches ``doc_chunking_overlap`` and the
    DuckDB oracle re-derives it in pure SQL — the UDTF's Python row
    math is hash-checked against a SQL twin. Scale note: a UDTF runs
    row-at-a-time in Python workers; it belongs on SMALL per-row
    payloads (here: one length integer, not the token array). Bulk
    chunking stays in native expressions (doc_chunking_overlap); the
    UDTF exists to prove the extension surface.
    """
    from pyspark.sql.functions import udtf

    @udtf(returnType="chunk_idx int, start_tok int, end_tok int")
    class ChunkSpans:
        def eval(self, n_tokens: int):  # noqa: ANN001 — UDTF contract
            n_chunks = 1 + (max(n_tokens - CHUNK_TOKENS, 0) + CHUNK_STRIDE - 1) // CHUNK_STRIDE
            for i in range(n_chunks):
                yield i, i * CHUNK_STRIDE + 1, min(i * CHUNK_STRIDE + CHUNK_TOKENS, n_tokens)

    spark.udtf.register("chunk_spans", ChunkSpans)
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 40)
    docs.select("doc_id", F.size(_tokens(F.col("text"))).alias("n")).createOrReplaceTempView(
        "_chunk_span_input"
    )
    return spark.sql(
        """
        SELECT i.doc_id, c.chunk_idx, c.start_tok, c.end_tok
        FROM _chunk_span_input i, LATERAL chunk_spans(i.n) c
        ORDER BY i.doc_id, c.chunk_idx
        """
    )


@query(
    "benchmark_contamination_check",
    oracle="""
    -- decontamination sweep: bigram overlap of every corpus doc
    -- against a held-out "benchmark" slice (doc_id % 97 == 0); a doc
    -- is contaminated when >20% of its distinct bigrams appear in the
    -- benchmark (integer-math threshold: shared*5 > total)
    WITH toks AS (
      SELECT doc_id, source,
             unnest(string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ')) AS tok,
             generate_subscripts(string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' '), 1) AS i
      FROM documents
    ), grams AS (
      SELECT DISTINCT doc_id, source,
             tok || ' ' || lead(tok) OVER (PARTITION BY doc_id ORDER BY i) AS gram
      FROM toks
    ), bench AS (
      SELECT DISTINCT gram FROM grams WHERE doc_id % 97 = 0 AND gram IS NOT NULL
    ), per_doc AS (
      SELECT g.doc_id, g.source,
             count(*) AS n_grams,
             CAST(sum(CASE WHEN b.gram IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_shared
      FROM grams g LEFT JOIN bench b ON g.gram = b.gram
      WHERE g.doc_id % 97 <> 0 AND g.gram IS NOT NULL
      GROUP BY 1, 2
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN n_shared * 5 > n_grams THEN 1 ELSE 0 END) AS BIGINT) AS n_contaminated,
           round(avg(CAST(n_shared AS DOUBLE) / n_grams), 4) AS avg_overlap
    FROM per_doc GROUP BY source ORDER BY source
    """,
)
def benchmark_contamination_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination (the n-gram-overlap sweep every
    training corpus runs against eval sets): the benchmark slice's
    distinct bigrams form a small set; every corpus doc's distinct
    bigrams left-join against it and the per-doc overlap ratio flags
    contamination. The >20% threshold is integer math
    (``shared*5 > total``) so the cut is engine-exact, never a float
    boundary.

    At 100 TB the benchmark gram set stays benchmark-sized (eval sets
    are tiny) → broadcast hash join against the corpus gram stream; no
    shuffle carries document text, only (doc, gram-hash) pairs into
    the per-doc count.
    """
    docs = load_table(spark, sf_dir, "documents")
    grams = docs.select(
        "doc_id", "source", F.explode(F.array_distinct(_bigrams(F.col("text")))).alias("gram")
    )
    bench = (
        grams.filter(F.col("doc_id") % 97 == 0)
        .select(F.col("gram").alias("b_gram"))
        .distinct()
    )
    corpus = grams.filter(F.col("doc_id") % 97 != 0)
    per_doc = (
        corpus.join(F.broadcast(bench), corpus.gram == bench.b_gram, "left")
        .groupBy("doc_id", "source")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(F.when(F.col("b_gram").isNotNull(), 1).otherwise(0)).alias("n_shared"),
        )
    )
    return (
        per_doc.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.when(F.col("n_shared") * 5 > F.col("n_grams"), 1).otherwise(0)).alias(
                "n_contaminated"
            ),
            F.round(F.avg(F.col("n_shared").cast("double") / F.col("n_grams")), 4).alias(
                "avg_overlap"
            ),
        )
        .orderBy("source")
    )


@query(
    "mixture_weight_sampler",
    oracle="""
    -- data-mixing downsampler: deterministic hash-gate per source
    -- tier (weights 1.0 / 0.5 / 0.25 / 0.1 by source number band);
    -- salted key so the gate is independent of the train/val/test
    -- split hash
    WITH gated AS (
      SELECT source,
             CASE WHEN CAST(substr(source, 4) AS INT) < 5 THEN 'ff~'
                  WHEN CAST(substr(source, 4) AS INT) < 10 THEN '80'
                  WHEN CAST(substr(source, 4) AS INT) < 15 THEN '40'
                  ELSE '1a' END AS threshold,
             substr(md5('mix:' || CAST(doc_id AS VARCHAR)), 1, 2) AS bucket,
             n_chars
      FROM documents
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_total,
           CAST(sum(CASE WHEN bucket < threshold THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           CAST(sum(CASE WHEN bucket < threshold THEN n_chars ELSE 0 END) AS BIGINT) AS kept_chars
    FROM gated GROUP BY source ORDER BY source
    """,
)
def mixture_weight_sampler(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-mixing weights (the corpus-composition knob of every
    pretraining pipeline): each source tier gets a target sampling
    rate and docs pass a deterministic md5 gate — reproducible across
    runs/partitionings where ``df.sample``'s seeded RNG is not, and
    the salt (``mix:``) decorrelates it from ``hash_split_assignment``
    so sampling doesn't bias the split. ``'ff~'`` sorts above every
    hex pair → the 1.0 tier keeps everything.

    Scale shape: the gate is a scan-local expression on the key; the
    only shuffle is the per-source rollup (one row per source).
    """
    docs = load_table(spark, sf_dir, "documents")
    src_num = F.substring(F.col("source"), 4, 10).cast("int")
    threshold = (
        F.when(src_num < 5, "ff~")
        .when(src_num < 10, "80")
        .when(src_num < 15, "40")
        .otherwise("1a")
    )
    bucket = F.substring(F.md5(F.concat(F.lit("mix:"), F.col("doc_id").cast("string"))), 1, 2)
    kept = bucket < threshold
    return (
        docs.select("source", kept.alias("kept"), "n_chars")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.sum(F.when(F.col("kept"), 1).otherwise(0)).alias("n_kept"),
            F.sum(F.when(F.col("kept"), F.col("n_chars")).otherwise(0)).alias("kept_chars"),
        )
        .orderBy("source")
    )


LINE_TOKENS = 10


@query(
    "line_level_dedup",
    oracle=f"""
    -- CCNet-style cross-document line dedup: docs are cut into
    -- 10-token "lines"; a line appearing in >=2 distinct docs is
    -- boilerplate and is removed from every doc; output is the
    -- cleaned-doc hash. A shared disclaimer line is injected into
    -- every 4th doc on both engines so the sweep has real work.
    WITH synth AS (
      SELECT doc_id,
             CASE WHEN doc_id % 4 = 0
                  THEN 'all rights reserved contact the vendor for terms of use today ' || text
                  ELSE text END AS text
      FROM documents WHERE doc_id < 200
    ), toks AS (
      SELECT doc_id, {_NORM_SQL} AS toks FROM synth
    ), c AS (
      SELECT doc_id, toks, (len(toks) + {LINE_TOKENS - 1}) // {LINE_TOKENS} AS n_lines FROM toks
    ), e AS (
      SELECT doc_id, toks, unnest(generate_series(0, n_lines - 1)) AS line_idx FROM c
    ), lines AS (
      SELECT doc_id, line_idx,
             array_to_string(toks[line_idx * {LINE_TOKENS} + 1 : line_idx * {LINE_TOKENS} + {LINE_TOKENS}], ' ') AS line
      FROM e
    ), line_docs AS (
      SELECT line, count(DISTINCT doc_id) AS n_docs_with FROM lines GROUP BY line
    )
    SELECT l.doc_id,
           CAST(count(*) AS BIGINT) AS n_lines,
           CAST(sum(CASE WHEN d.n_docs_with >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_lines,
           md5(coalesce(string_agg(CASE WHEN d.n_docs_with < 2 THEN l.line END, ' ' ORDER BY l.line_idx), ''))
             AS cleaned_md5
    FROM lines l JOIN line_docs d ON l.line = d.line
    GROUP BY l.doc_id ORDER BY l.doc_id
    """,
)
def line_level_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document line deduplication (CCNet's boilerplate pass):
    fixed 10-token lines, corpus-wide distinct-doc counts per line,
    duplicated lines dropped from every document, and the cleaned doc
    re-assembled IN ORDER (sort_array over (line_idx, line) structs)
    so the output hash is deterministic.

    Scale shape: line cutting is scan-local; the line→doc-count
    aggregate and the join back both key on the line hash (in a real
    run: xxhash64 of the line, so no text crosses the wire twice); the
    re-assembly groups by doc_id — the same partitioning the join just
    produced, so AQE coalesces without an extra exchange.
    """
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    synth = F.when(
        F.col("doc_id") % 4 == 0,
        F.concat(
            F.lit("all rights reserved contact the vendor for terms of use today "),
            F.col("text"),
        ),
    ).otherwise(F.col("text"))
    toks = _tokens(synth)
    base = docs.select("doc_id", toks.alias("toks"))
    with_counts = base.withColumn(
        "n_lines",
        F.floor((F.size("toks") + (LINE_TOKENS - 1)) / LINE_TOKENS).cast("int"),
    )
    lines = with_counts.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.col("n_lines") - 1)).alias("line_idx"),
        F.col("toks"),
    ).select(
        "doc_id",
        "line_idx",
        F.array_join(
            F.slice(F.col("toks"), F.col("line_idx") * LINE_TOKENS + 1, LINE_TOKENS), " "
        ).alias("line"),
    )
    line_docs = lines.groupBy("line").agg(
        F.countDistinct("doc_id").alias("n_docs_with")
    )
    joined = lines.join(line_docs, "line")
    return (
        joined.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(F.when(F.col("n_docs_with") >= 2, 1).otherwise(0)).alias("n_dup_lines"),
            F.md5(
                F.array_join(
                    F.transform(
                        F.sort_array(
                            F.collect_list(
                                F.when(
                                    F.col("n_docs_with") < 2,
                                    F.struct("line_idx", "line"),
                                )
                            )
                        ),
                        lambda x: x["line"],
                    ),
                    " ",
                )
            ).alias("cleaned_md5"),
        )
        .orderBy("doc_id")
    )


@query(
    "hash_split_assignment",
    oracle="""
    -- reproducible train/val/test assignment: md5 bucket on the doc
    -- key, 80/10/10 by hex prefix — engine-portable (no seeded RNG),
    -- stable under re-partitioning and re-runs
    WITH assigned AS (
      SELECT doc_id, n_chars,
             CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'cc' THEN 'train'
                  WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'e6' THEN 'val'
                  ELSE 'test' END AS split
      FROM documents
    )
    SELECT split,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars,
           round(avg(n_chars), 4) AS avg_chars
    FROM assigned GROUP BY split ORDER BY split
    """,
)
def hash_split_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic dataset splitting: train/val/test by md5-bucket of
    the document key (~80/10/10 via hex-prefix ranges). The property
    that matters at 100 TB: assignment is a pure function of the key —
    reproducible across runs, engines, partitionings, and data
    arrivals (``df.sample``'s seeded RNG is none of those: it depends
    on partition layout). Scan-local; the only shuffle is the 3-row
    rollup.
    """
    docs = load_table(spark, sf_dir, "documents")
    h = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
    split = (
        F.when(h < "cc", "train").when(h < "e6", "val").otherwise("test")
    )
    return (
        docs.select(split.alias("split"), "n_chars")
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("long").alias("total_chars"),
            F.round(F.avg("n_chars"), 4).alias("avg_chars"),
        )
        .orderBy("split")
    )


SEQ_LEN = 2048  # training sequence length for concatenation packing


@query(
    "sequence_packing_bins",
    oracle=f"""
    -- GPT-style concatenation packing: per language, documents
    -- concatenate in doc_id order into one token stream cut every
    -- SEQ_LEN tokens; a document overlaps every bin its [start, end)
    -- token span touches. Pure prefix-sum arithmetic on both engines.
    WITH t AS (
      SELECT lang, doc_id,
             CASE WHEN trim(text) = '' THEN 0
                  ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS tc
      FROM documents
    ), o AS (
      SELECT lang, doc_id, tc,
             sum(tc) OVER (PARTITION BY lang ORDER BY doc_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS end_off
      FROM t
    ), s AS (
      SELECT lang, doc_id, tc, end_off, end_off - tc AS start_off
      FROM o WHERE tc > 0
    ), e AS (
      SELECT lang, doc_id, start_off, end_off,
             unnest(generate_series(CAST(floor(start_off / {SEQ_LEN}.0) AS BIGINT),
                                    CAST(floor((end_off - 1) / {SEQ_LEN}.0) AS BIGINT))) AS bin_id
      FROM s
    )
    SELECT lang, bin_id,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(least(end_off, (bin_id + 1) * {SEQ_LEN})
                    - greatest(start_off, bin_id * {SEQ_LEN})) AS BIGINT) AS tokens_in_bin,
           min(doc_id) AS first_doc_id,
           CAST(sum(CASE WHEN start_off < bin_id * {SEQ_LEN} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_straddling
    FROM e GROUP BY lang, bin_id ORDER BY lang, bin_id
    """,
)
def sequence_packing_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing for training-example assembly (the GPT-style
    concatenate-and-cut form): per language, documents concatenate in
    doc_id order and the token stream is cut into SEQ_LEN bins; the
    output maps bins to the documents overlapping them (straddle count
    = docs crossing into the bin from the previous one).

    All arithmetic: one windowed prefix sum + a sequence() explode of
    each doc onto the bins its token span covers — no Python, no UDF.

    Scale note: the window partitions by ``lang``, so parallelism is
    language-cardinality — right for per-language packing. A single
    global stream would serialize into ONE window partition (the
    classic ordered-prefix-sum trap); the 100 TB form is two-phase:
    per-partition local pack + a tiny exchange of per-partition token
    totals to offset the bin ids, same arithmetic.
    """
    from pim_etl_spark import functions as pf
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy("doc_id")
    staged = (
        docs.select("lang", "doc_id", pf.token_count(F.col("text")).alias("tc"))
        .withColumn("end_off", F.sum("tc").over(w))
        .withColumn("start_off", F.col("end_off") - F.col("tc"))
        .filter(F.col("tc") > 0)
    )
    binned = staged.select(
        "lang",
        "doc_id",
        "start_off",
        "end_off",
        F.explode(
            F.sequence(
                F.floor(F.col("start_off") / SEQ_LEN),
                F.floor((F.col("end_off") - 1) / SEQ_LEN),
            )
        ).alias("bin_id"),
    )
    overlap = F.least(F.col("end_off"), (F.col("bin_id") + 1) * SEQ_LEN) - F.greatest(
        F.col("start_off"), F.col("bin_id") * SEQ_LEN
    )
    return (
        binned.groupBy("lang", "bin_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(overlap).alias("tokens_in_bin"),
            F.min("doc_id").alias("first_doc_id"),
            F.sum(
                F.when(F.col("start_off") < F.col("bin_id") * SEQ_LEN, 1).otherwise(0)
            ).alias("n_straddling"),
        )
        .orderBy("lang", "bin_id")
    )


STRATUM_QUOTA = 30


@query(
    "stratified_sample_quota",
    oracle=f"""
    -- exact-quota stratified sampling: per language, the QUOTA docs
    -- with the smallest salted md5 rank — deterministic under any
    -- partitioning/arrival order (the complement of
    -- mixture_weight_sampler's probabilistic gate)
    WITH ranked AS (
      SELECT lang, doc_id,
             row_number() OVER (
               PARTITION BY lang
               ORDER BY md5(CAST(doc_id AS VARCHAR) || '-strat'), doc_id
             ) AS rk
      FROM documents
    )
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_sampled,
           min(doc_id) AS min_doc_id,
           max(doc_id) AS max_doc_id,
           CAST(sum(doc_id) AS BIGINT) AS doc_id_sum
    FROM ranked WHERE rk <= {STRATUM_QUOTA}
    GROUP BY lang ORDER BY lang
    """,
)
def stratified_sample_quota(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified sampling with EXACT per-stratum quotas: each language
    contributes precisely STRATUM_QUOTA documents, chosen by salted
    md5 rank — reproducible across engines, partitionings, and data
    arrival orders, unlike ``df.sample``/``sampleBy`` (seeded RNG over
    partition layout). The checked output identifies the exact sampled
    set per stratum (count + min/max/sum of ids).

    At scale: WindowGroupLimit keeps only quota rows per stratum
    before the shuffle, so the exchange carries O(strata × quota),
    not the corpus.
    """
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    rank_key = F.md5(F.concat(F.col("doc_id").cast("string"), F.lit("-strat")))
    w = Window.partitionBy("lang").orderBy(rank_key, F.col("doc_id"))
    sampled = (
        docs.select("lang", "doc_id")
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= STRATUM_QUOTA)
    )
    return (
        sampled.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            F.min("doc_id").alias("min_doc_id"),
            F.max("doc_id").alias("max_doc_id"),
            F.sum("doc_id").alias("doc_id_sum"),
        )
        .orderBy("lang")
    )


SPAN_K = 8  # n-gram width for exact duplicated-span detection


@query(
    "duplicated_span_removal",
    oracle=f"""
    -- exact duplicated-substring removal (the Lee et al.
    -- "Deduplicating Training Data Makes Language Models Better"
    -- shape, token-level): any {SPAN_K}-gram appearing in MORE THAN
    -- ONE document flags its {SPAN_K}-token span in every document
    -- containing it; per affected doc, the union of flagged positions
    -- gives the post-removal token count.
    WITH t AS (
      SELECT doc_id, {{norm}} AS toks FROM documents
    ), tt AS (
      SELECT doc_id, toks, len(toks) AS n FROM t WHERE len(toks) >= {SPAN_K}
    ), g AS (
      SELECT doc_id, unnest(generate_series(1, n - {SPAN_K - 1})) AS i, toks FROM tt
    ), gr AS (
      SELECT doc_id, i, array_to_string(toks[i:i+{SPAN_K - 1}], ' ') AS gram FROM g
    ), dup AS (
      SELECT gram FROM gr GROUP BY gram HAVING count(DISTINCT doc_id) > 1
    ), fl AS (
      SELECT gr.doc_id, gr.i FROM gr JOIN dup USING (gram)
    ), pos AS (
      SELECT doc_id, unnest(generate_series(i, i + {SPAN_K - 1})) AS p FROM fl
    ), pf AS (
      SELECT doc_id, CAST(count(DISTINCT p) AS BIGINT) AS n_flagged_tokens
      FROM pos GROUP BY doc_id
    ), sp AS (
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_dup_spans FROM fl GROUP BY doc_id
    )
    SELECT tt.doc_id, CAST(tt.n AS INT) AS n_tokens, sp.n_dup_spans,
           pf.n_flagged_tokens,
           CAST(tt.n - pf.n_flagged_tokens AS BIGINT) AS tokens_after
    FROM tt JOIN sp ON sp.doc_id = tt.doc_id JOIN pf ON pf.doc_id = tt.doc_id
    ORDER BY tt.doc_id
    """.replace("{{norm}}", "{norm}").format(norm=_NORM_SQL),
)
def duplicated_span_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact duplicated-span detection/removal accounting — the
    token-level form of suffix-array exact-substring dedup (Lee et
    al. 2022): cross-document duplicated {K}-grams flag their spans,
    overlapping spans union per document, and the output accounts
    tokens before/after removal for every affected document.

    Plan: explode each doc's {K}-gram starts (one slice per exploded
    row — NOT per-index lambdas in one projection, which ProjectCollapse
    turns quadratic; NOTES.md trap), aggregate gram → distinct-doc
    count, join the duplicated-gram set back (broadcast here — at
    100 TB this is a shuffle join keyed by gram hash, and the gram
    table is the frequency-truncated sketch a suffix-array pass
    produces), then union flagged positions per doc. Only (doc_id,
    gram, position) triples ever shuffle — text stays in the scan.
    """
    K = SPAN_K
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select("doc_id", _tokens(F.col("text")).alias("toks")).filter(
        F.size("toks") >= K
    )
    g = t.select(
        "doc_id",
        F.explode(F.sequence(F.lit(1), F.size("toks") - (K - 1))).alias("i"),
        "toks",
    ).select(
        "doc_id", "i", F.array_join(F.slice("toks", F.col("i"), K), " ").alias("gram")
    )
    dup = (
        g.groupBy("gram")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .filter(F.col("nd") > 1)
        .select("gram")
    )
    flagged = g.join(F.broadcast(dup), "gram")
    per_doc_flag = (
        flagged.select(
            "doc_id", F.explode(F.sequence(F.col("i"), F.col("i") + (K - 1))).alias("p")
        )
        .groupBy("doc_id")
        .agg(F.countDistinct("p").alias("n_flagged_tokens"))
    )
    spans = flagged.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_dup_spans"))
    base = t.select("doc_id", F.size("toks").alias("n_tokens"))
    return (
        base.join(spans, "doc_id")
        .join(per_doc_flag, "doc_id")
        .select(
            "doc_id",
            "n_tokens",
            "n_dup_spans",
            "n_flagged_tokens",
            (F.col("n_tokens") - F.col("n_flagged_tokens")).alias("tokens_after"),
        )
        .transform(sorted_output, "doc_id")
    )


@query(
    "temperature_resample_copies",
    oracle="""
    -- temperature-style UPSAMPLING (the complement of
    -- mixture_weight_sampler's downsampling gate): each source tier
    -- gets a fractional epoch count; every doc is emitted
    -- floor(epochs) times plus one extra copy behind a deterministic
    -- md5 gate on the fractional part. Row-level exploded output so
    -- the hash proves the fan-out itself, not just the arithmetic.
    WITH gated AS (
      SELECT doc_id, source,
             CASE WHEN CAST(substr(source, 4) AS INT) < 5 THEN 1
                  WHEN CAST(substr(source, 4) AS INT) < 10 THEN 1
                  WHEN CAST(substr(source, 4) AS INT) < 15 THEN 2
                  ELSE 3 END AS base_copies,
             CASE WHEN CAST(substr(source, 4) AS INT) < 5 THEN '00'
                  WHEN CAST(substr(source, 4) AS INT) < 10 THEN '80'
                  WHEN CAST(substr(source, 4) AS INT) < 15 THEN '80'
                  ELSE '40' END AS frac_threshold,
             substr(md5('temp:' || CAST(doc_id AS VARCHAR)), 1, 2) AS bucket
      FROM documents
    ),
    counted AS (
      SELECT doc_id, source,
             base_copies + CASE WHEN bucket < frac_threshold THEN 1 ELSE 0 END AS n_copies
      FROM gated
    )
    SELECT doc_id, source, CAST(n_copies AS BIGINT) AS n_copies,
           CAST(u.copy_id AS BIGINT) AS copy_id
    FROM counted, unnest(generate_series(1, n_copies)) AS u(copy_id)
    ORDER BY doc_id, copy_id
    """,
)
def temperature_resample_copies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based mixture UPSAMPLING: low-resource source tiers
    are repeated fractional-epoch counts (1.0 / 1.5 / 2.5 / 3.25 here)
    — the standard way a pretraining mix over-represents small
    high-quality sources. Integer part via row fan-out, fractional
    part via a salted md5 gate so the extra copy is deterministic
    under any partitioning (``df.sample`` is not).

    Scale shape: the copy count is a scan-local expression and the
    fan-out is a generator (explode of a ``sequence``) — no shuffle at
    all; output partitions simply carry more rows. The salt
    (``temp:``) is decorrelated from the split (``split:``) and
    downsampling (``mix:``) hashes so repeated epochs never bias
    either. Reference analogue: none (the reference syncs a PIM
    catalog); this is the §2.10 training-data surface.
    """
    docs = load_table(spark, sf_dir, "documents")
    src_num = F.substring(F.col("source"), 4, 10).cast("int")
    base = F.when(src_num < 10, 1).when(src_num < 15, 2).otherwise(3)
    frac_threshold = (
        F.when(src_num < 5, "00").when(src_num < 15, "80").otherwise("40")
    )
    bucket = F.substring(F.md5(F.concat(F.lit("temp:"), F.col("doc_id").cast("string"))), 1, 2)
    n_copies = (base + F.when(bucket < frac_threshold, 1).otherwise(0)).cast("bigint")
    return (
        docs.select("doc_id", "source", n_copies.alias("n_copies"))
        .select(
            "doc_id",
            "source",
            "n_copies",
            F.explode(F.sequence(F.lit(1).cast("bigint"), F.col("n_copies"))).alias("copy_id"),
        )
        .orderBy("doc_id", "copy_id")
    )


N_SHUFFLE_SHARDS = 16


@query(
    "global_shuffle_shards",
    oracle=f"""
    -- deterministic global corpus shuffle + sharding: order is the
    -- salted md5 of the doc id; the shard is the first hex nibble
    -- (16-way), the within-shard position is the rank of the full
    -- hash inside the shard. Reading shards in (shard, pos) order
    -- yields a reproducible global permutation of the corpus.
    WITH keyed AS (
      SELECT doc_id,
             md5('shuffle:' || CAST(doc_id AS VARCHAR)) AS sort_key
      FROM documents
    )
    SELECT doc_id,
           CAST(strpos('0123456789abcdef', substr(sort_key, 1, 1)) - 1 AS INT) AS shard,
           CAST(row_number() OVER (
                 PARTITION BY substr(sort_key, 1, 1)
                 ORDER BY sort_key, doc_id) AS BIGINT) AS pos_in_shard
    FROM keyed
    ORDER BY shard, pos_in_shard
    """,
)
def global_shuffle_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global training-order shuffle: every epoch loader
    wants the corpus in a reproducible pseudo-random order, sharded
    into N files. The sort key is a salted md5 of the doc id; the
    shard is the key's first nibble, so shard assignment is
    scan-local (no global sort, no driver state) and the within-shard
    order is the key itself.

    Scale shape: this IS how a distributed shuffle materializes a
    100 TB permutation — hash-range shards written independently, each
    internally sorted (``repartitionByRange`` on the key +
    ``sortWithinPartitions``); a global ``row_number`` would serialize
    on one partition. The explicit ``pos_in_shard`` window here is
    per-shard for the hash gate; at scale you skip it (the sort key is
    the position) or recover global offsets with the two-phase
    count-prefix scheme documented for ``sequence_packing_bins``.
    """
    docs = load_table(spark, sf_dir, "documents")
    keyed = docs.select(
        "doc_id",
        F.md5(F.concat(F.lit("shuffle:"), F.col("doc_id").cast("string"))).alias("sort_key"),
    )
    nibble = F.substring(F.col("sort_key"), 1, 1)
    from pyspark.sql import Window

    w = Window.partitionBy(nibble).orderBy("sort_key", "doc_id")
    return (
        keyed.select(
            "doc_id",
            (F.instr(F.lit("0123456789abcdef"), nibble) - 1).cast("int").alias("shard"),
            F.row_number().over(w).cast("bigint").alias("pos_in_shard"),
        )
        .orderBy("shard", "pos_in_shard")
    )


@query(
    "url_canonicalize_dedup",
    oracle="""
    -- closed-form twin of URL canonicalization: the messy URL is a
    -- pure function of doc_id (case noise, :443 port, utm/ref
    -- tracking params, #fragment, trailing slash), so the CANONICAL
    -- form is derived directly from the id arithmetic — the oracle
    -- never parses. id collisions (doc_id % 100) make real dup
    -- groups for the crawl-dedup rollup.
    WITH canon AS (
      SELECT doc_id,
             'https://source' || CAST(doc_id % 5 AS VARCHAR)
               || '.example.com/docs/' || CAST(doc_id % 17 AS VARCHAR)
               || '/page?id=' || CAST(doc_id % 100 AS VARCHAR) AS canonical_url
      FROM documents
    )
    SELECT canonical_url,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(min(doc_id) AS BIGINT) AS keeper_doc_id
    FROM canon
    GROUP BY canonical_url
    ORDER BY canonical_url
    """,
)
def url_canonicalize_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl URL canonicalization + dedup (the first dedup pass of any
    web pipeline, upstream of content hashing): lowercase scheme/host,
    strip ``www.`` and the default port, drop tracking params
    (``utm_*``, ``ref``) and fragments, strip trailing slashes, then
    keep the lowest doc id per canonical URL.

    The messy URL is synthesized deterministically from ``doc_id`` so
    the oracle can derive the expected canonical form closed-form; the
    engine side must earn it by actually PARSING (``parse_url`` —
    JVM-side, codegen) and filtering the query string with native
    array ops. Everything before the final rollup is scan-local."""
    docs = load_table(spark, sf_dir, "documents")
    d = F.col("doc_id")
    messy = F.concat(
        F.lit("HTTPS://WWW.Source"), (d % 5).cast("string"), F.lit(".Example.COM"),
        F.when(d % 2 == 0, ":443").otherwise(""),
        F.lit("/docs/"), (d % 17).cast("string"), F.lit("/page"),
        F.when(d % 4 == 0, "/").otherwise(""),
        F.lit("?"),
        F.when(d % 2 == 0, F.concat(F.lit("id="), (d % 100).cast("string"), F.lit("&utm_source=feed")))
        .otherwise(F.concat(F.lit("utm_source=feed&id="), (d % 100).cast("string"))),
        F.when(d % 3 == 0, "&ref=tw").otherwise(""),
        F.when(d % 7 == 0, "#frag").otherwise(""),
    )
    u = docs.select("doc_id", messy.alias("url"))
    host = F.regexp_replace(F.lower(F.parse_url(F.col("url"), F.lit("HOST"))), r"^www\.", "")
    path = F.regexp_replace(F.parse_url(F.col("url"), F.lit("PATH")), r"/$", "")
    kept_params = F.array_join(
        F.array_sort(
            F.filter(
                F.split(F.parse_url(F.col("url"), F.lit("QUERY")), "&"),
                lambda p: ~p.startswith("utm_") & ~p.startswith("ref="),
            )
        ),
        "&",
    )
    canonical = F.concat(F.lit("https://"), host, path, F.lit("?"), kept_params)
    return (
        u.select("doc_id", canonical.alias("canonical_url"))
        .groupBy("canonical_url")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").alias("keeper_doc_id"),
        )
        .orderBy("canonical_url")
    )


@query(
    "llm_corpus_pipeline",
    oracle=r"""
    -- end-to-end corpus build, every stage re-derived independently:
    -- quality floor → exact dedup (min-id keeper) → per-tier mixture
    -- gate → train/val/test split → per (split, lang) stats. The
    -- stage rules are the catalog's own (doc_quality/exact_dedup/
    -- mixture_weight_sampler/hash_split_assignment), so this is the
    -- §2.10 flagship twin of pim_full_pipeline.
    WITH toks AS (
      SELECT doc_id, text, lang, source, n_chars,
             len(regexp_split_to_array(trim(lower(text)), '\s+')) AS n_tokens
      FROM documents
    ),
    quality AS (
      SELECT * FROM toks WHERE n_chars >= 150 AND n_tokens >= 25
    ),
    dedup AS (
      SELECT * FROM (
        SELECT *, row_number() OVER (
          PARTITION BY md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g')))
          ORDER BY doc_id) AS rn
        FROM quality
      ) WHERE rn = 1
    ),
    mixed AS (
      SELECT * FROM dedup
      WHERE substr(md5('mix:' || CAST(doc_id AS VARCHAR)), 1, 2) <
            CASE WHEN CAST(substr(source, 4) AS INT) < 5 THEN 'ff~'
                 WHEN CAST(substr(source, 4) AS INT) < 10 THEN '80'
                 WHEN CAST(substr(source, 4) AS INT) < 15 THEN '40'
                 ELSE '1a' END
    ),
    assigned AS (
      SELECT lang, n_tokens,
             CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'cc' THEN 'train'
                  WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'e6' THEN 'val'
                  ELSE 'test' END AS split
      FROM mixed
    )
    SELECT split, lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens
    FROM assigned
    GROUP BY split, lang
    ORDER BY split, lang
    """,
)
def llm_corpus_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The LLM-side flagship: the full corpus-build dataflow in one
    plan — quality floor → exact near-duplicate removal (min-id
    keeper) → per-source-tier mixture downsampling → deterministic
    train/val/test split → per (split, lang) accounting. Each stage is
    the catalog's proven operator composed end-to-end, exactly how the
    production pipeline chains them.

    Scale shape: quality + both md5 gates + split are scan-local
    projections fused into ONE pass; the only data-sized shuffle is
    the dedup window on the text hash (and the hash, not the text, is
    the key); the final rollup is (splits × langs)-sized. The whole
    pipeline is a single Catalyst plan, so column pruning reaches the
    scan and the gates short-circuit before the shuffle."""
    docs = load_table(spark, sf_dir, "documents")
    from pyspark.sql import Window

    n_tokens = F.size(F.split(F.trim(F.lower(F.col("text"))), r"\s+"))
    staged = docs.select(
        "doc_id", "text", "lang", "source", "n_chars", n_tokens.alias("n_tokens")
    ).filter((F.col("n_chars") >= 150) & (F.col("n_tokens") >= 25))

    text_hash = F.md5(
        F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " "))
    )
    w = Window.partitionBy(text_hash).orderBy("doc_id")
    deduped = staged.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)

    src_num = F.substring(F.col("source"), 4, 10).cast("int")
    threshold = (
        F.when(src_num < 5, "ff~")
        .when(src_num < 10, "80")
        .when(src_num < 15, "40")
        .otherwise("1a")
    )
    mix_bucket = F.substring(
        F.md5(F.concat(F.lit("mix:"), F.col("doc_id").cast("string"))), 1, 2
    )
    mixed = deduped.filter(mix_bucket < threshold)

    split_bucket = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
    split = (
        F.when(split_bucket < "cc", "train")
        .when(split_bucket < "e6", "val")
        .otherwise("test")
    )
    return (
        mixed.select(split.alias("split"), "lang", "n_tokens")
        .groupBy("split", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
        )
        .orderBy("split", "lang")
    )


@query(
    "corpus_drift_l1",
    oracle=r"""
    -- distribution drift between two corpus slices (old = even doc
    -- ids, new = odd): per-token frequency vectors compared by L1
    -- distance in EXACT integer cross-multiplied arithmetic
    -- (|c_a*N_b - c_b*N_a| summed, reported against the N_a*N_b
    -- denominator) — no floating point anywhere, so the drift score
    -- is engine-exact. Top movers give the actionable signal.
    WITH toks AS (
      SELECT doc_id % 2 AS side,
             unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS token
      FROM documents
    ),
    counts AS (
      SELECT token,
             sum(CASE WHEN side = 0 THEN 1 ELSE 0 END) AS c_a,
             sum(CASE WHEN side = 1 THEN 1 ELSE 0 END) AS c_b
      FROM toks GROUP BY token
    ),
    totals AS (
      SELECT sum(c_a) AS n_a, sum(c_b) AS n_b FROM counts
    )
    SELECT c.token,
           CAST(c.c_a AS BIGINT) AS count_old,
           CAST(c.c_b AS BIGINT) AS count_new,
           CAST(abs(c.c_a * t.n_b - c.c_b * t.n_a) AS BIGINT) AS drift_cross
    FROM counts c, totals t
    ORDER BY drift_cross DESC, c.token ASC
    LIMIT 25
    """,
)
def corpus_drift_l1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset drift detection (the refresh-time guard of a training
    pipeline): compare two corpus slices' unigram distributions and
    surface the top-drifting tokens. Frequencies are compared in
    cross-multiplied integer space (|c_a·N_b − c_b·N_a|), so the
    score is exact — the integer-arithmetic discipline the catalog
    uses wherever transcendentals would diverge across engines.

    Scale shape: one token-keyed aggregate (conditional sums fold both
    sides in a single shuffle), a 1-row totals broadcast, TakeOrdered
    top-k. Drop-in over any pair of snapshot reads — compose with
    ``versioned.read_version`` to diff corpus VERSIONS instead of the
    id-parity slices used for the deterministic gate here."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        (F.col("doc_id") % 2).alias("side"),
        F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("token"),
    )
    counts = toks.groupBy("token").agg(
        F.sum(F.when(F.col("side") == 0, 1).otherwise(0)).alias("c_a"),
        F.sum(F.when(F.col("side") == 1, 1).otherwise(0)).alias("c_b"),
    )
    totals = counts.agg(
        F.sum("c_a").alias("n_a"), F.sum("c_b").alias("n_b")
    )
    return (
        counts.crossJoin(F.broadcast(totals))
        .select(
            "token",
            F.col("c_a").alias("count_old"),
            F.col("c_b").alias("count_new"),
            F.abs(F.col("c_a") * F.col("n_b") - F.col("c_b") * F.col("n_a")).alias(
                "drift_cross"
            ),
        )
        .orderBy(F.desc("drift_cross"), F.asc("token"))
        .limit(25)
    )


N_QNORM_KNOTS = 32  # power of two: p*32 is an EXACT fp scaling


@query(
    "quantile_normalized_lengths",
    oracle=f"""
    -- quantile normalization: map each doc's within-language rank
    -- onto the GLOBAL length distribution (the cross-group
    -- calibration step — per-language quality scores become
    -- comparable). The reference distribution is {N_QNORM_KNOTS + 1}
    -- exact percentile knots; per-row work is pure interpolation
    -- arithmetic. All values are dyadic-exact or identical IEEE ops
    -- on both engines, so floor-scaling is tie-free.
    WITH knots AS (
      SELECT quantile_cont(CAST(n_chars AS DOUBLE),
               [{", ".join(str(k / 32) for k in range(33))}]) AS ks
      FROM documents
    ), ranked AS (
      SELECT doc_id, lang, n_chars,
             row_number() OVER (PARTITION BY lang
                                ORDER BY n_chars, doc_id) AS rn,
             count(*) OVER (PARTITION BY lang) AS n
      FROM documents
    ), p AS (
      SELECT doc_id, lang, n_chars,
             CASE WHEN n = 1 THEN 0.0
                  ELSE CAST(rn - 1 AS DOUBLE) / (n - 1) END AS pr
      FROM ranked
    ), seg AS (
      SELECT doc_id, lang, n_chars, pr,
             least(CAST(floor(pr * {N_QNORM_KNOTS}) AS BIGINT),
                   {N_QNORM_KNOTS - 1}) AS j
      FROM p
    )
    SELECT s.doc_id, s.lang, s.n_chars,
           CAST(floor(
             (k.ks[s.j + 1]
              + (s.pr * {N_QNORM_KNOTS} - s.j)
                * (k.ks[s.j + 2] - k.ks[s.j + 1])) * 100
           ) AS BIGINT) AS qnorm_e2
    FROM seg s, knots k
    ORDER BY s.doc_id
    """,
)
def quantile_normalized_lengths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile normalization of doc length across languages: each
    doc's within-language percent rank maps onto the global length
    distribution via linear interpolation between exact percentile
    knots. This is the scale form of the bioinformatics order-statistic
    method: the reference distribution is a KNOT VECTOR (33 exact
    percentiles — one tiny aggregate, broadcast), never a global sort;
    per-row cost is one window rank + arithmetic.

    Numeric safety: knot count is a power of two so ``pr * 32`` is an
    exact fp scaling; exact-fraction ranks are dyadic where the floor
    boundary matters, and the interpolation runs the same IEEE ops on
    both engines (NOTES.md floor-not-round rule).
    """
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    fracs = [k / N_QNORM_KNOTS for k in range(N_QNORM_KNOTS + 1)]
    knots = docs.agg(
        F.percentile(F.col("n_chars").cast("double"), F.lit(fracs)).alias("ks")
    )
    w = Window.partitionBy("lang").orderBy("n_chars", "doc_id")
    ranked = docs.select(
        "doc_id",
        "lang",
        "n_chars",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("lang")).alias("n"),
    )
    pr = F.when(F.col("n") == 1, F.lit(0.0)).otherwise(
        (F.col("rn") - 1).cast("double") / (F.col("n") - 1)
    )
    seg = ranked.select(
        "doc_id",
        "lang",
        "n_chars",
        pr.alias("pr"),
        F.least(
            F.floor(pr * N_QNORM_KNOTS).cast("bigint"), F.lit(N_QNORM_KNOTS - 1)
        ).alias("j"),
    )
    lo = F.element_at(F.col("ks"), (F.col("j") + 1).cast("int"))
    hi = F.element_at(F.col("ks"), (F.col("j") + 2).cast("int"))
    interp = lo + (F.col("pr") * N_QNORM_KNOTS - F.col("j")) * (hi - lo)
    return (
        seg.crossJoin(F.broadcast(knots))
        .select(
            "doc_id",
            "lang",
            "n_chars",
            F.floor(interp * 100).cast("bigint").alias("qnorm_e2"),
        )
        .orderBy("doc_id")
    )


@query(
    "dataset_card_summary",
    oracle="""
    -- the dataset-card ("datasheet") rollup a corpus release ships
    -- with: per source, volume, token totals, language diversity as
    -- the Gini-Simpson index (1 - sum p_i^2 — rational, so it stays
    -- in exact integer arithmetic; entropy would drag in log()), and
    -- the exact-duplicate rate from normalized-text hashes.
    WITH t AS (
      SELECT source, lang,
             md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS h,
             CASE WHEN trim(text) = '' THEN 0
                  ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS tc,
             n_chars
      FROM documents
    ), lc AS (
      SELECT source, lang, CAST(count(*) AS BIGINT) AS c
      FROM t GROUP BY source, lang
    ), lang_div AS (
      SELECT source,
             CAST((sum(c) * sum(c) - sum(c * c)) * 1000000
                  // (sum(c) * sum(c)) AS BIGINT) AS lang_gini_simpson_e6,
             CAST(count(*) AS BIGINT) AS n_langs
      FROM lc GROUP BY source
    ), base AS (
      SELECT source,
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(tc) AS BIGINT) AS total_tokens,
             CAST(sum(n_chars) AS BIGINT) AS total_chars,
             CAST(count(DISTINCT h) AS BIGINT) AS n_unique
      FROM t GROUP BY source
    )
    SELECT b.source, b.n_docs, b.total_tokens, b.total_chars,
           d.n_langs, d.lang_gini_simpson_e6,
           CAST((b.n_docs - b.n_unique) * 1000000 // b.n_docs AS BIGINT)
             AS dup_rate_e6
    FROM base b JOIN lang_div d USING (source)
    ORDER BY b.source
    """,
)
def dataset_card_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset-card rollup per source — the datasheet a corpus release
    ships with: volume, token/char totals, language count and
    diversity (Gini-Simpson, exact integer arithmetic — entropy would
    need log(), which is not cross-engine exact), and the exact-dup
    rate. Two grouped aggregates over (source) and (source, lang);
    the only data-sized work is one scan + the hash distinct."""
    from pim_etl_spark import functions as pf
    from pim_etl_spark.llm_ops.dedup import _norm_text

    t = load_table(spark, sf_dir, "documents").select(
        "source",
        "lang",
        F.md5(_norm_text(F.col("text"))).alias("h"),
        pf.token_count(F.col("text")).alias("tc"),
        "n_chars",
    )
    lc = t.groupBy("source", "lang").agg(F.count(F.lit(1)).alias("c"))
    lang_div = lc.groupBy("source").agg(
        F.expr(
            "(sum(c) * sum(c) - sum(c * c)) * 1000000 div (sum(c) * sum(c))"
        ).alias("lang_gini_simpson_e6"),
        F.count(F.lit(1)).alias("n_langs"),
    )
    base = t.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("tc").alias("total_tokens"),
        F.sum("n_chars").alias("total_chars"),
        F.count_distinct("h").alias("n_unique"),
    )
    return (
        base.join(lang_div, "source")
        .select(
            "source",
            "n_docs",
            "total_tokens",
            "total_chars",
            "n_langs",
            "lang_gini_simpson_e6",
            F.expr("(n_docs - n_unique) * 1000000 div n_docs").alias("dup_rate_e6"),
        )
        .orderBy("source")
    )


@query(
    "group_leakage_safe_split",
    oracle="""
    -- leakage-safe train/val/test: the md5 bucket keys on the GROUP
    -- (source), not the row, so every doc of a source lands in ONE
    -- split — near-duplicate documents inside a source can never
    -- straddle train and eval (the contamination vector row-level
    -- hashing leaves open). The audit proves it: per source, exactly
    -- one distinct split.
    WITH assigned AS (
      SELECT source, n_chars,
             CASE WHEN substr(md5('grp:' || source), 1, 2) < 'cc' THEN 'train'
                  WHEN substr(md5('grp:' || source), 1, 2) < 'e6' THEN 'val'
                  ELSE 'test' END AS split
      FROM documents
    )
    SELECT split,
           CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS n_chars,
           CAST(max(splits_per_source) AS BIGINT) AS max_splits_per_source
    FROM assigned
    JOIN (
      SELECT source AS s2, count(DISTINCT split) AS splits_per_source
      FROM assigned GROUP BY 1
    ) ON source = s2
    GROUP BY split
    ORDER BY split
    """,
)
def group_leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-aware train/val/test assignment — the leakage-safe
    counterpart of ``hash_split_assignment``: the deterministic md5
    bucket keys on the SOURCE, so all documents of one provenance
    (which share templates, boilerplate, and near-duplicates) fall in
    the same split; row-level hashing would scatter near-identical
    docs across train and eval. The output carries its own audit
    column: max distinct splits touched by any source must be 1.

    Scale shape: the split expression is scan-local (a hash of an
    existing column — no join against a group table, no shuffle to
    assign); only the audit rollup shuffles, keyed first by source
    (group-cardinality-sized) then by split (3 rows). The salt
    (``grp:``) decorrelates the bucket from every other md5 gate in
    the catalog.
    """
    docs = load_table(spark, sf_dir, "documents")
    bucket = F.substring(F.md5(F.concat(F.lit("grp:"), F.col("source"))), 1, 2)
    split = (
        F.when(bucket < "cc", "train").when(bucket < "e6", "val").otherwise("test")
    )
    assigned = docs.select("source", "n_chars", split.alias("split"))
    per_source = assigned.groupBy(F.col("source").alias("s2")).agg(
        F.count_distinct("split").alias("splits_per_source")
    )
    return (
        assigned.join(per_source, F.col("source") == F.col("s2"))
        .groupBy("split")
        .agg(
            F.count_distinct("source").alias("n_sources"),
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("n_chars"),
            F.max("splits_per_source").cast("bigint").alias("max_splits_per_source"),
        )
        .orderBy("split")
    )


@query(
    "stratified_kfold_assignment",
    oracle="""
    -- twin of stratified 5-fold assignment: within each language
    -- stratum docs are md5-rank-ordered and dealt round-robin, so
    -- every stratum's docs spread across folds within ±1 and the
    -- assignment is a pure function of (lang, doc_id) — reproducible
    -- on any engine, stable under repartitioning. The gate pins per
    -- (fold, lang) counts AND a membership checksum (sum of doc_ids),
    -- so two folds swapping members cannot cancel out.
    WITH ranked AS (
      SELECT lang, doc_id,
             row_number() OVER (
               PARTITION BY lang
               ORDER BY md5('fold:' || CAST(doc_id AS VARCHAR)), doc_id
             ) - 1 AS rk
      FROM documents
    )
    SELECT CAST(rk % 5 AS INT) AS fold, lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(doc_id) AS BIGINT) AS member_checksum
    FROM ranked
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
)
def stratified_kfold_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified k-fold cross-validation splits (the eval-protocol
    verb `hash_split_assignment`'s fixed-ratio buckets don't cover):
    docs are dealt round-robin within each language stratum in
    md5-rank order, guaranteeing per-stratum fold balance within ±1 —
    the property a plain hash split only achieves in expectation.
    Deterministic: the fold is a pure function of (lang, doc_id), so
    folds are reproducible across runs, engines, and partitionings.

    Plan: one rank window per stratum (hash exchange on lang) + one
    partial-agg — no global window, no shuffle of document text."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.concat(F.lit("fold:"), F.col("doc_id").cast("string"))), "doc_id"
    )
    ranked = docs.withColumn("fold", ((F.row_number().over(w) - 1) % 5).cast("int"))
    return (
        ranked.groupBy("fold", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("doc_id").cast("long").alias("member_checksum"),
        )
        .orderBy("fold", "lang")
    )


@query(
    "target_encoding_loo",
    oracle="""
    -- exact twin of leave-one-out target encoding: each order's
    -- encoding is the mean target of its priority EXCLUDING ITSELF —
    -- floor((S − x)·10^4 / (n − 1)), all BIGINT cents, so the gate
    -- pins every per-row encoded value through the per-group sums
    -- (min/max/sum of encodings). Plain group-mean encoding leaks the
    -- row's own target into its feature; LOO is the leakage-safe
    -- variant, and the difference is exactly what these checksums
    -- detect.
    WITH t AS (
      SELECT o_orderpriority AS priority,
             CAST(round(o_totalprice * 100) AS BIGINT) AS x
      FROM orders
    ),
    g AS (
      SELECT priority, x,
             sum(x) OVER (PARTITION BY priority) AS s,
             count(*) OVER (PARTITION BY priority) AS n
      FROM t
    )
    SELECT priority,
           CAST(any_value(n) AS BIGINT) AS n_rows,
           CAST(sum((s - x) * 10000 // (n - 1)) AS BIGINT) AS enc_sum,
           CAST(min((s - x) * 10000 // (n - 1)) AS BIGINT) AS enc_min,
           CAST(max((s - x) * 10000 // (n - 1)) AS BIGINT) AS enc_max
    FROM g
    GROUP BY priority
    ORDER BY priority
    """,
)
def target_encoding_loo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-out target encoding (leakage-safe categorical
    feature): a category's encoding for row i excludes row i's own
    target — floor((S−x_i)·10⁴/(n−1)) in exact integer cents. The
    group statistics (5 rows) broadcast back onto the fact scan, so
    the encode pass is map-side; the per-group encoding checksums pin
    every row's value.

    Scale shape: one partial-agg exchange for (S, n); the encode and
    final rollup pipeline into the same stage — no window over raw
    rows, no second shuffle of fact bytes."""
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("priority"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("x"),
    )
    stats = orders.groupBy("priority").agg(
        F.sum("x").cast("long").alias("s"), F.count(F.lit(1)).alias("n")
    )
    enc = orders.join(F.broadcast(stats), "priority").withColumn(
        "enc", F.expr("(s - x) * 10000 DIV (n - 1)")
    )
    return (
        enc.groupBy("priority")
        .agg(
            F.max("n").cast("long").alias("n_rows"),
            F.sum("enc").cast("long").alias("enc_sum"),
            F.min("enc").cast("long").alias("enc_min"),
            F.max("enc").cast("long").alias("enc_max"),
        )
        .orderBy("priority")
    )


COVERAGE_ROUNDS = 5


def _coverage_oracle() -> str:
    cte = r"""
    WITH dt AS (
      SELECT doc_id, t
      FROM (SELECT doc_id,
                   string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS t
            FROM documents)
    ),
    dbg AS (
      SELECT DISTINCT doc_id, bg FROM (
        SELECT doc_id, unnest(list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])) AS bg
        FROM dt
      )
    ),
    c0 AS (SELECT CAST(NULL AS VARCHAR) AS bg WHERE false)"""
    for r in range(1, COVERAGE_ROUNDS + 1):
        cte += f""",
    g{r} AS (
      SELECT doc_id, CAST(count(*) AS BIGINT) AS gain
      FROM dbg WHERE bg NOT IN (SELECT bg FROM c{r - 1})
      GROUP BY 1
    ),
    p{r} AS (SELECT doc_id, gain FROM g{r} ORDER BY gain DESC, doc_id ASC LIMIT 1),
    c{r} AS (
      SELECT bg FROM c{r - 1}
      UNION
      SELECT bg FROM dbg WHERE doc_id = (SELECT doc_id FROM p{r})
    )"""
    rows = "\nUNION ALL\n".join(
        f"SELECT {r} AS round, doc_id, gain,"
        f" (SELECT CAST(count(*) AS BIGINT) FROM c{r}) AS covered_total FROM p{r}"
        for r in range(1, COVERAGE_ROUNDS + 1)
    )
    return cte + "\n" + rows + "\nORDER BY round"


@query("greedy_coverage_selection", oracle=_coverage_oracle())
def greedy_coverage_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Submodular data selection — greedy max-coverage over bigram
    "facts": each of 5 rounds picks the document adding the most
    not-yet-covered bigrams (ties to the smaller doc_id) and folds its
    bigrams into the covered set. The greedy algorithm carries the
    classic (1 − 1/e) guarantee for coverage objectives, and this is
    the shape dataset-selection pipelines use to pick maximally
    diverse fine-tuning subsets. The marginal-gain curve (gain per
    round + cumulative coverage) is the gated output.

    Scale shape per round: one anti-join of the doc-bigram table
    against the covered set (broadcast — it grows by one document's
    bigrams per round), one partial aggregate, one TakeOrdered(1).
    Rounds are inherently sequential (greedy is adaptive); what stays
    distributed is everything inside a round. At a larger k, batch
    variants (stochastic greedy / sieve-streaming) replace the exact
    argmax — same per-round plan, sampled candidate set."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.regexp_replace(F.lower("text"), r"\s+", " ")), " ")
    dbg = (
        docs.select("doc_id", toks.alias("t"))
        .select(
            "doc_id",
            # size(t) == 1 would make sequence(1, 0) DESCENDING ([1,0]
            # — Spark steps -1 when start > stop) and emit a NULL
            # bigram where the DuckDB range(1, len(t)) oracle emits
            # nothing; gate on size >= 2 so both sides skip such docs.
            F.explode(
                F.expr(
                    "CASE WHEN size(t) >= 2 THEN "
                    "transform(sequence(1, size(t) - 1), i -> concat(t[i-1], ' ', t[i])) "
                    "ELSE array() END"
                )
            ).alias("bg"),
        )
        .distinct()
        # conf-derived width (floor = the measured 8): the bigram
        # frame is data-sized, so the per-round gains aggregation
        # must keep cluster-proportional parallelism; locally this
        # still coalesces the 32-partition distinct down to 8
        .coalesce(loop_partitions(docs))
        .cache()
    )
    # seed: materialized empty covered set
    covered = dbg.select("bg").filter(F.lit(False)).cache()
    out = []
    for r in range(1, COVERAGE_ROUNDS + 1):
        gains = (
            dbg.join(F.broadcast(covered), "bg", "left_anti")
            .groupBy("doc_id")
            .agg(F.count(F.lit(1)).cast("long").alias("gain"))
        )
        pick = gains.orderBy(F.desc("gain"), F.asc("doc_id")).limit(1).cache()
        # the covered set is one document's bigrams per round — pin a
        # tiny partitioning so the per-round distinct doesn't compound
        # default-width exchanges (naive session: 200/round)
        covered = (
            covered.unionByName(
                dbg.join(F.broadcast(pick.select("doc_id")), "doc_id", "left_semi").select("bg")
            )
            .repartition(loop_partitions(dbg, floor=4, divisor=8), "bg")
            .dropDuplicates()
            .localCheckpoint(eager=False)
        )
        total = covered.agg(F.count(F.lit(1)).cast("long").alias("covered_total"))
        out.append(
            pick.crossJoin(F.broadcast(total)).select(
                F.lit(r).cast("int").alias("round"), "doc_id", "gain", "covered_total"
            )
        )
    res = out[0]
    for o in out[1:]:
        res = res.unionByName(o)
    return res.transform(sorted_output, "round")
