"""Custom pim_feed DataSource tests: JSONC parsing, multi-file
partitioning, schema enforcement through the Spark read path."""

from __future__ import annotations

import pytest

from pim_etl_spark.pipeline.schemas import MO_PRICELIST
from pim_etl_spark.sources_custom import FeedDataSource, parse_jsonc_document

FEED_A = """\
// pricelist feed for supplier A
[
  {"sku": "A-1", "variant_id": "1", "price": "3,63", "valid_until": "2026-01-31", "currency": "GBP",},
  {"sku": "A-2", "variant_id": "2", "price": "9,10", "valid_until": "2026-01-31", "currency": "GBP"},
]
"""

FEED_B = """\
[{"sku": "B-9", "variant_id": "9", "price": "1,00", "valid_until": "2026-06-30", "currency": "GBP"}]
"""


def test_parse_jsonc_document_tolerates_comments_and_commas():
    rows = parse_jsonc_document(FEED_A)
    assert [r["sku"] for r in rows] == ["A-1", "A-2"]


def test_pim_feed_format_reads_multiple_files_as_partitions(spark, tmp_path):
    a = tmp_path / "a.jsonc"
    b = tmp_path / "b.jsonc"
    a.write_text(FEED_A)
    b.write_text(FEED_B)
    spark.dataSource.register(FeedDataSource)
    df = (
        spark.read.format("pim_feed")
        .schema(MO_PRICELIST)
        .option("paths", f"{a},{b}")
        .load()
    )
    assert df.rdd.getNumPartitions() == 2  # one partition per feed doc
    rows = {r.sku: r.price for r in df.collect()}
    assert rows == {"A-1": "3,63", "A-2": "9,10", "B-9": "1,00"}


def test_pim_feed_requires_path(spark, tmp_path):
    spark.dataSource.register(FeedDataSource)
    with pytest.raises(Exception, match="path"):
        spark.read.format("pim_feed").schema(MO_PRICELIST).load().collect()
