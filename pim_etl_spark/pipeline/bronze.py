"""Bronze layer: feed ingestion (SURVEY §2.1 S1–S10).

The reference line-scans pretty-printed JSONC sample files with string
markers (etl/extractors/midocean_extractor.py:95-138) — an approach
that silently yields nothing on reformatted files (SURVEY §7.1 step 4
note). Here the intent is rebuilt properly: whole-document parse with
a declared schema, JSONC-tolerant (full-line ``//`` comments and
trailing commas stripped — the reference's trailing-comma fixup,
midocean_extractor.py:105-106, generalized), distributed via
``spark.read.text(wholetext)`` so each feed file is one task.

HTTP extraction (S6–S8) is out of oracle scope (SURVEY §7.3): feeds
are landed files; a fetcher would simply write the payload beside
these readers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StructType


def read_jsonc(spark: SparkSession, path: str, schema: StructType, element_array: bool = True) -> DataFrame:
    """Parse a JSONC feed document into rows of ``schema``.

    - strips full-line ``//`` comments (inline ``//`` is never stripped:
      URLs contain it — the reference's files only use full-line comments)
    - strips trailing commas before ``]``/``}``
    - ``element_array=True``: document is a JSON array → one row per element
    """
    raw = spark.read.text(path, wholetext=True)
    cleaned = F.regexp_replace(F.col("value"), r"(?m)^\s*//.*$", "")
    cleaned = F.regexp_replace(cleaned, r",(\s*[\}\]])", r"$1")
    if element_array:
        parsed = F.from_json(cleaned, ArrayType(schema))
        return raw.select(F.explode(parsed).alias("row")).select("row.*")
    parsed = F.from_json(cleaned, schema)
    return raw.select(parsed.alias("row")).select("row.*")


def read_feed(spark: SparkSession, path: str, schema: StructType) -> DataFrame:
    """Read a landed feed: parquet (preferred at scale) or JSON/JSONC."""
    if path.endswith((".json", ".jsonc")):
        return read_jsonc(spark, path, schema)
    return spark.read.schema(schema).parquet(path)


def with_corrupt_quarantine(
    df: DataFrame, required: tuple[str, ...]
) -> tuple[DataFrame, DataFrame]:
    """Per-record error isolation (SURVEY N5, etl/base.py:121-133):
    split rows failing required-field checks into a quarantine side
    output instead of aborting the batch. Returns (good, quarantined).
    """
    valid = F.lit(True)
    for c in required:
        valid = valid & F.col(c).isNotNull() & (F.col(c) != "")
    flagged = df.withColumn("__valid", valid)
    good = flagged.filter(F.col("__valid")).drop("__valid")
    bad = flagged.filter(~F.col("__valid")).drop("__valid")
    return good, bad
