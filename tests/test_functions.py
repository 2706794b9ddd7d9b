"""Unit tests for the expression helpers against literal feed values
(SURVEY §5: the sample-data-shaped parse cases, e.g. "3,63" → 3.63)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from pim_etl_spark import functions as pf


def _one(spark, expr, value: str | None):
    df = spark.createDataFrame([(value,)], "v string")
    return df.select(expr.alias("out")).collect()[0].out


@pytest.mark.parametrize(
    "raw,expected",
    [("3,63", 3.63), ("16,00", 16.0), ("1,79", 1.79), ("0", 0.0), (None, None)],
)
def test_parse_eu_decimal(spark, raw, expected):
    got = _one(spark, pf.parse_eu_decimal("v"), raw)
    assert got == (pytest.approx(expected) if expected is not None else None)


@pytest.mark.parametrize(
    "raw,expected",
    [("1.000", 1000), ("20.000", 20000), ("1", 1), ("999.999", 999999), (None, None)],
)
def test_parse_thousands_int(spark, raw, expected):
    assert _one(spark, pf.parse_thousands_int("v"), raw) == expected


@pytest.mark.parametrize(
    "raw,expected",
    [("£23.50", 23.5), ("£1.54", 1.54), ("$9.99", 9.99), ("€5.00", 5.0)],
)
def test_parse_money(spark, raw, expected):
    assert _one(spark, pf.parse_money("v"), raw) == pytest.approx(expected)


@pytest.mark.parametrize(
    "raw,expected",
    [("yes", True), ("YES", True), ("Yes", True), ("no", False), ("", False), (None, False)],
)
def test_yes_no_bool(spark, raw, expected):
    assert _one(spark, pf.yes_no_bool("v"), raw) is expected


@pytest.mark.parametrize(
    "disc,plc,expected",
    [
        ("2099-12-31", "COLLECTION", "active"),
        ("2024-06-30", "COLLECTION", "discontinued"),
        ("2099-12-31", "END OF LIFE - DISCONTINUED", "discontinued"),
        (None, None, "active"),
    ],
)
def test_derive_status(spark, disc, plc, expected):
    df = spark.createDataFrame([(disc, plc)], "d string, p string")
    got = df.select(pf.derive_status("d", "p").alias("s")).collect()[0].s
    assert got == expected


@pytest.mark.parametrize(
    "raw,expected",
    [
        ("item_picture_front", "Item Picture Front"),
        ("back", "Back"),
        ("detail_image_2", "Detail Image 2"),
    ],
)
def test_prettify_subtype(spark, raw, expected):
    assert _one(spark, pf.prettify_subtype("v"), raw) == expected


@pytest.mark.parametrize(
    "raw,expected",
    [
        ("10,5X8X2 CM", (10.5, 8.0, 2.0, "cm")),
        ("185X70MM", (185.0, 70.0, None, "mm")),
        ("7 X 3 X 1 CM", (7.0, 3.0, 1.0, "cm")),
        ("garbage", (None, None, None, None)),
    ],
)
def test_dims_from_string(spark, raw, expected):
    got = _one(spark, pf.dims_from_string("v"), raw)
    assert (got.length, got.width, got.height, got.unit) == (
        pytest.approx(expected[0]) if expected[0] is not None else None,
        pytest.approx(expected[1]) if expected[1] is not None else None,
        pytest.approx(expected[2]) if expected[2] is not None else None,
        expected[3],
    )


@pytest.mark.parametrize(
    "raw,expected",
    [("one two  three", 3), ("  lead trail  ", 2), ("", 0), (None, 0), ("single", 1)],
)
def test_token_count(spark, raw, expected):
    assert _one(spark, pf.token_count("v"), raw) == expected


def test_synth_product_id(spark):
    df = spark.createDataFrame([("AR1249",)], "v string")
    got = df.select(pf.synth_product_id("midocean", "v").alias("out")).collect()[0].out
    assert got == "midocean_AR1249"
