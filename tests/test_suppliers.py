"""Cross-supplier transform tests (Laltex / XD / Keramikos dialects)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from pim_etl_spark.pipeline import fixtures, suppliers
from pim_etl_spark.pipeline.registry import get_supplier, list_suppliers


@pytest.fixture(scope="module")
def laltex_feeds(spark):
    products = spark.createDataFrame(
        [
            ("LT100", "Mug", "A mug", "BrandL", "GB", "£2.30", "48", "0.35 kg"),
            ("LT200", "Pen", "A pen", "BrandL", "CN", "£0.45", "1.000", "0.01 kg"),
        ],
        suppliers.LALTEX_PRODUCTS,
    )
    bands = spark.createDataFrame(
        [
            ("LT100", "1", "49", "£2.30"),
            ("LT100", "50", "249", "£1.98"),
            ("LT100", "250", "N/A", "£1.54"),
            ("LT200", "1", "N/A", "£0.45"),
        ],
        suppliers.LALTEX_PRICEBANDS,
    )
    return {"laltex_products": products, "laltex_pricebands": bands}


def test_laltex_money_and_bands(spark, laltex_feeds):
    out = suppliers.transform_laltex(laltex_feeds, spark)
    rows = {r.supplier_product_code: r for r in out.collect()}
    assert rows["LT100"].base_price == pytest.approx(2.30)
    assert rows["LT200"].carton_quantity == 1000  # thousands-dotted
    tiers = rows["LT100"].price_tiers
    assert [t.min_quantity for t in tiers] == [1, 50, 250]
    assert tiers[-1].max_quantity is None  # "N/A" open band
    assert tiers[1].amount == pytest.approx(1.98)
    assert rows["LT100"].weight_value == pytest.approx(0.35)
    assert rows["LT100"].weight_unit == "kg"


def test_laltex_tier_resolution(spark, laltex_feeds):
    out = suppliers.transform_laltex(laltex_feeds, spark)
    at_100 = {r.product_id: r.unit_price for r in suppliers.resolve_tier_price(out, 100).collect()}
    assert at_100["laltex_LT100"] == pytest.approx(1.98)
    at_1000 = {r.product_id: r.unit_price for r in suppliers.resolve_tier_price(out, 1000).collect()}
    assert at_1000["laltex_LT100"] == pytest.approx(1.54)  # open top band


def test_xd_unpivot(spark):
    row = {
        "ItemCode": "XD1", "ItemName": "Bottle", "LongDescription": "desc",
        "BrandName": "XDB", "AllImages": "https://a/1.jpg, https://a/2.jpg,https://a/3.jpg",
        "ItemDataLastModifiedDateTime": "2025-02-03 10:00:00",
        "Qty1": "50", "ItemPriceNet_Qty1": "4,90",
        "Qty2": "100", "ItemPriceNet_Qty2": "4,40",
        "Qty3": "250", "ItemPriceNet_Qty3": "3,90",
        "Qty4": None, "ItemPriceNet_Qty4": None,
        "Qty5": None, "ItemPriceNet_Qty5": None,
        "Qty6": None, "ItemPriceNet_Qty6": None,
    }
    feeds = {"xd_products": spark.createDataFrame([row], suppliers.XD_PRODUCTS)}
    out = suppliers.transform_xd(feeds, spark).collect()[0]
    assert [t.min_quantity for t in out.price_tiers] == [50, 100, 250]  # empty cols dropped
    assert out.base_price == pytest.approx(4.90)
    assert out.image_urls == ["https://a/1.jpg", "https://a/2.jpg", "https://a/3.jpg"]
    assert str(out.modified_at).startswith("2025-02-03 10:00")


def test_keramikos_spec_map_and_dims(spark):
    products = spark.createDataFrame(
        [
            (
                "KM9",
                "Ceramic mug",
                "Ceramic",
                "185 x 70mm",
                [("Capacity", "300ml"), ("Dishwasher safe", "Yes")],
            )
        ],
        suppliers.KERAMIKOS_PRODUCTS,
    )
    grid = spark.createDataFrame(
        [("KM9", "100", "1", "0,80"), ("KM9", "100", "2", "1,10"), ("KM9", "500", "1", "0,60")],
        suppliers.KERAMIKOS_PRINTGRID,
    )
    out = suppliers.transform_keramikos(
        {"keramikos_products": products, "keramikos_printgrid": grid}, spark
    ).collect()[0]
    assert out.extra_data == {"Capacity": "300ml", "Dishwasher safe": "Yes"}
    assert out.dimensions.length == pytest.approx(185.0)
    assert out.dimensions.width == pytest.approx(70.0)
    assert out.dimensions.height is None  # 2-component dimension string
    assert out.dimensions.unit == "mm"
    assert [(c.min_quantity, c.n_colours) for c in out.print_grid] == [(100, 1), (100, 2), (500, 1)]


def test_all_suppliers_registered():
    assert set(list_suppliers()) >= {"midocean", "laltex", "xd", "keramikos"}
    assert get_supplier("xd").display_name == "XD Connects"


def test_watermark_fields_declared():
    """Dialects with row-level change tracking declare their raw field
    (surfaced as the unified modified_at); feed-level-only dialects
    declare None and fall back to feed_timestamp in --since."""
    assert get_supplier("xd").watermark_field == "ItemDataLastModifiedDateTime"
    assert get_supplier("sanmar").watermark_field == "lastChangeDate"
    # MidOcean's products feed carries only a feed-level `timestamp`
    # (normalized to feed_timestamp); stock rows have their own
    # modified_at handled by the stock stream
    assert get_supplier("midocean").watermark_field is None


def test_incremental_filter_semantics(spark):
    """--since keeps: row-level-fresh, feed-level-fresh (no row-level),
    and untracked rows; drops stale rows — and the row-level watermark
    takes precedence over a fresher feed-level one."""
    from pim_etl_spark.pipeline.registry import incremental_filter

    df = spark.createDataFrame(
        [
            ("a", "2025-05-01 00:00:00", "2025-01-01 00:00:00"),  # row fresh -> kept
            ("b", "2025-01-02 00:00:00", "2025-06-01 00:00:00"),  # row stale beats fresh feed -> dropped
            ("c", None, "2025-06-01 00:00:00"),  # feed fresh -> kept
            ("d", None, "2025-01-01 00:00:00"),  # feed stale -> dropped
            ("e", None, None),  # untracked -> kept (can't prove unchanged)
        ],
        "k string, modified_at string, feed_timestamp string",
    )
    kept = {r.k for r in incremental_filter(df, "2025-03-01 00:00:00").collect()}
    assert kept == {"a", "c", "e"}


def test_xd_watermark_since_filter(spark):
    """XD's ItemDataLastModifiedDateTime flows through transform_xd as
    modified_at and drives the incremental cutoff per row."""
    from pim_etl_spark.pipeline import fixtures
    from pim_etl_spark.pipeline.registry import incremental_filter

    feeds = fixtures.all_supplier_feeds(spark, n_masters=4)
    out = suppliers.transform_xd(feeds["xd"], spark)
    # fixture dates are 2025-02-01 .. 2025-02-06 (one per item)
    kept = incremental_filter(out, "2025-02-04 00:00:00")
    codes = sorted(r.supplier_product_code for r in kept.collect())
    assert codes == ["XD203", "XD204", "XD205"]


def test_sanmar_watermark_since_filter(spark):
    from pim_etl_spark.pipeline.registry import incremental_filter

    rows = [
        ("ST100", "Heavy Tee", "BrandS", "Black", "M", "ST100-BK-M", "4.59", "72", "2023-10-19 16:25:48"),
        ("ST100", "Heavy Tee", "BrandS", "Black", "S", "ST100-BK-S", "4.59", "72", "2023-11-02 09:00:00"),
        ("ST200", "Polo", "BrandS", "Navy", "L", "ST200-NV-L", "9.99", "36", "2024-01-05 12:00:00"),
    ]
    feeds = {"sanmar_skus": spark.createDataFrame(rows, suppliers.SANMAR_SKUS)}
    out = suppliers.transform_sanmar(feeds, spark)
    kept = [r.supplier_product_code for r in incremental_filter(out, "2023-12-01 00:00:00").collect()]
    assert kept == ["ST200"]


def test_pfconcept_column_name_unpivot(spark):
    row = {
        "ItemNumber": "PF1", "ItemName": "Tote", "CategoryName": "Bags",
        "NetWeight": "0,138",
        "PrintPriceNet_25": "1,20", "PrintPriceNet_50": "1,00",
        "PrintPriceNet_100": "0,80", "PrintPriceNet_250": None,
        "PrintPriceNet_1000": "0,40", "PrintPriceNet_10000": "0,25",
    }
    feeds = {"pfc_products": spark.createDataFrame([row], suppliers.PFC_PRODUCTS)}
    out = suppliers.transform_pfconcept(feeds, spark).collect()[0]
    tiers = [(t.min_quantity, t.amount) for t in out.print_price_tiers]
    assert tiers == [(25, 1.20), (50, 1.00), (100, 0.80), (1000, 0.40), (10000, 0.25)]
    assert out.weight_value == pytest.approx(0.138)
    assert out.categories[0].name == "Bags"


def test_sanmar_flat_to_nested_rollup(spark):
    rows = [
        ("ST100", "Heavy Tee", "BrandS", "Black", "M", "ST100-BK-M", "4.59", "72", "2023-10-19 16:25:48"),
        ("ST100", "Heavy Tee", "BrandS", "Black", "S", "ST100-BK-S", "4.59", "72", "2023-11-02 09:00:00"),
        ("ST100", "Heavy Tee", "BrandS", "White", "M", "ST100-WH-M", "4.39", "72", "2023-09-01 08:00:00"),
        ("ST200", "Polo", "BrandS", "Navy", "L", "ST200-NV-L", "9.99", "36", "2024-01-05 12:00:00"),
    ]
    feeds = {"sanmar_skus": spark.createDataFrame(rows, suppliers.SANMAR_SKUS)}
    out = {r.supplier_product_code: r for r in suppliers.transform_sanmar(feeds, spark).collect()}
    assert set(out) == {"ST100", "ST200"}
    t = out["ST100"]
    assert t.base_price == pytest.approx(4.39)
    # product watermark = newest SKU lastChangeDate (Sanmar Sample
    # Data.jsonc:236) so --since resyncs a style when ANY SKU moved
    assert str(t.modified_at) == "2023-11-02 09:00:00"
    # variants sorted by (color, garment size order XS<S<M<...):
    # Black/S, Black/M, then White/M
    got = [(v.color_name, v.size) for v in t.variants_flat]
    assert got == [("Black", "S"), ("Black", "M"), ("White", "M")]
    assert t.colors_available == ["Black", "White"]
    assert t.sizes_available == ["M", "S"]
    assert out["ST200"].variants_flat[0].case_qty == 36


def test_ralawise_per_location_stock(spark):
    products = spark.createDataFrame(
        [("RW1", "Hoodie", "BrandR", "Navy", "L"), ("RW2", "Cap", "BrandR", "Black", "OS")],
        suppliers.RALAWISE_PRODUCTS,
    )
    stock = spark.createDataFrame(
        [
            ("RW1", "MAN", "Manchester", "1.200"),
            ("RW1", "LON", "London", "300"),
            ("RW2", "MAN", "Manchester", "0"),
        ],
        suppliers.RALAWISE_STOCK,
    )
    out = {
        r.supplier_product_code: r
        for r in suppliers.transform_ralawise(
            {"ralawise_products": products, "ralawise_stock": stock}, spark
        ).collect()
    }
    assert out["RW1"].stock_by_location == {"MAN": 1200, "LON": 300}
    assert out["RW1"].total_stock == 1500
    assert out["RW1"].availability == "in_stock"
    assert out["RW2"].total_stock == 0
    assert out["RW2"].availability == "out_of_stock"
    # unified locations array (unified.jsonc:244-256): typed id/name/qty
    locs = {loc.id: loc for loc in out["RW1"].stock_locations}
    assert locs["MAN"].name == "Manchester" and locs["MAN"].qty == 1200
    assert locs["LON"].name == "London" and locs["LON"].qty == 300
    assert [loc.qty for loc in out["RW2"].stock_locations] == [0]


def test_ss_price_types(spark):
    rows = [
        ("S100", "Tee", "BrandX", "3.50", "40.20", "150.00", "72"),
        ("S200", "Hat", "BrandX", "5.00", None, None, "48"),
    ]
    feeds = {"ss_products": spark.createDataFrame(rows, suppliers.SS_PRODUCTS)}
    out = {r.supplier_product_code: r for r in suppliers.transform_ss(feeds, spark).collect()}
    p100 = {(p.price_type, p.min_quantity): p.amount for p in out["S100"].prices}
    assert p100 == {("piece", 1): 3.50, ("dozen", 12): 40.20, ("case", 72): 150.00}
    assert [p.price_type for p in out["S200"].prices] == ["piece"]  # nulls dropped
    assert out["S200"].carton_quantity == 48


def test_preseli_multi_currency(spark):
    rows = [
        ("P1", "Badge", "Badges", "1,20", "1,40", None, "5"),
        ("P2", "Lanyard", "Lanyards", None, "0,90", "1,05", "10"),
    ]
    feeds = {"preseli_products": spark.createDataFrame(rows, suppliers.PRESELI_PRODUCTS)}
    out = {r.supplier_product_code: r for r in suppliers.transform_preseli(feeds, spark).collect()}
    assert {p.currency: p.amount for p in out["P1"].prices} == {"GBP": 1.20, "EUR": 1.40}
    assert out["P1"].base_price == pytest.approx(1.20)
    # GBP missing → EUR fallback for base price (F13 coalesce chain)
    assert out["P2"].base_price == pytest.approx(0.90)
    assert {p.currency for p in out["P2"].prices} == {"EUR", "USD"}


def test_full_roster_registered():
    assert set(list_suppliers()) == {
        "midocean", "laltex", "xd", "keramikos", "pfconcept",
        "sanmar", "ralawise", "ss", "preseli",
    }


def test_laltex_shipping_details_and_resolution(spark):
    feeds_rows = fixtures.build_other_supplier_rows()["laltex"]
    feeds = {
        "laltex_products": spark.createDataFrame(
            feeds_rows["laltex_products"], suppliers.LALTEX_PRODUCTS
        ),
        "laltex_pricebands": spark.createDataFrame(
            feeds_rows["laltex_pricebands"], suppliers.LALTEX_PRICEBANDS
        ),
        "laltex_shipping": spark.createDataFrame(
            feeds_rows["laltex_shipping"], suppliers.LALTEX_SHIPPING
        ),
    }
    out = suppliers.transform_laltex(feeds, spark)
    row = out.first()
    services = {s.service_type: s for s in row.shipping_details}
    assert set(services) == {"ukstandard", "ukprenoon"}
    std = services["ukstandard"]
    assert std.service_name == "UK STANDARD" and std.currency == "GBP"
    assert [(c.carton_from, c.carton_to) for c in std.charges] == [(1, 2), (3, 10), (11, None)]
    assert std.charges[0].shipping_charge == 18.85 and std.charges[0].per_carton_charge is None
    assert std.charges[2].shipping_charge is None and std.charges[2].per_carton_charge == 4.10

    # band resolution: flat charge in band 1, per-carton in the open band
    flat = suppliers.resolve_shipping_charge(out, "ukstandard", 2).first()
    assert flat.charge == 18.85
    open_band = suppliers.resolve_shipping_charge(out, "ukstandard", 20).first()
    assert open_band.charge == pytest.approx(4.10 * 20)

    # without the optional feed the column is an empty array, not a crash
    solo = suppliers.transform_laltex(
        {k: feeds[k] for k in ("laltex_products", "laltex_pricebands")}, spark
    )
    assert solo.first().shipping_details == []
