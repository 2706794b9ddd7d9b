"""Declared schemas for the PIM feed endpoints and the unified product.

Feed shapes follow the reference's five MidOcean endpoints
(sample data/MidOcean Sample Data.jsonc: products :2, pricelist :807,
printdata :858, printpricelist :5572, stock :13194) flattened per
FIXTURES.md §B; the unified product mirrors the pydantic model
(schemas/unified_product_schema.py:145-207) as one wide StructType.
Everything is declared (never inferred) so feed drift fails loudly and
the parquet scans prune to exactly the referenced columns.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DoubleType,
    IntegerType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
)


def _s(name: str) -> StructField:
    return StructField(name, StringType(), True)


DIGITAL_ASSET = StructType([_s("url"), _s("url_highress"), _s("type"), _s("subtype")])

VARIANT_FEED = StructType(
    [
        _s("variant_id"),
        _s("sku"),
        _s("release_date"),
        _s("discontinued_date"),
        _s("category_level1"),
        _s("category_level2"),
        _s("category_level3"),
        _s("color_code"),
        _s("color_description"),
        _s("color_group"),
        _s("pms_color"),
        _s("plc_status_description"),
        _s("gtin"),
        StructField("digital_assets", ArrayType(DIGITAL_ASSET), True),
    ]
)

# B1: one row per master product; numerics arrive as strings (feed fidelity)
MO_PRODUCTS = StructType(
    [
        _s("master_code"),
        _s("master_id"),
        _s("type_of_products"),
        _s("product_name"),
        _s("short_description"),
        _s("long_description"),
        _s("brand"),
        _s("product_class"),
        _s("material"),
        _s("commodity_code"),
        _s("country_of_origin"),
        _s("dimensions"),
        _s("length"),
        _s("width"),
        _s("height"),
        _s("length_unit"),
        _s("width_unit"),
        _s("height_unit"),
        _s("gross_weight"),
        _s("net_weight"),
        _s("gross_weight_unit"),
        _s("net_weight_unit"),
        _s("inner_carton_quantity"),
        _s("outer_carton_quantity"),
        # outer-carton logistics block (sample data :31-40): EU-string
        # numerics + units, feeding the unified packaging struct
        _s("carton_length"),
        _s("carton_length_unit"),
        _s("carton_width"),
        _s("carton_width_unit"),
        _s("carton_height"),
        _s("carton_height_unit"),
        _s("carton_volume"),
        _s("carton_volume_unit"),
        _s("carton_gross_weight"),
        _s("carton_gross_weight_unit"),
        _s("printable"),
        _s("number_of_print_positions"),
        _s("timestamp"),
        StructField("variants", ArrayType(VARIANT_FEED), True),
    ]
)

# B3: one row per SKU price; "3,63" EU decimal strings
MO_PRICELIST = StructType([_s("sku"), _s("variant_id"), _s("price"), _s("valid_until"), _s("currency")])

# B4: one row per (master_code, position, technique)
MO_PRINTDATA = StructType(
    [
        _s("master_code"),
        _s("print_manipulation"),
        _s("print_template"),
        _s("position_id"),
        _s("print_size_unit"),
        StructField("max_print_size_width", DoubleType(), True),
        StructField("max_print_size_height", DoubleType(), True),
        _s("print_position_type"),
        _s("technique_id"),
        StructField("technique_default", BooleanType(), True),
        _s("max_colours"),
        _s("image_blank"),
        _s("image_with_area"),
        _s("variant_color"),
    ]
)

# B5: one row per (technique, area_range, qty_scale); EU decimals and
# thousands-dotted quantity strings
MO_PRINTPRICES = StructType(
    [
        _s("technique_id"),
        _s("description"),
        _s("pricing_type"),
        _s("setup"),
        _s("setup_repeat"),
        _s("next_colour_cost_indicator"),
        _s("range_id"),
        _s("area_from"),
        _s("area_to"),
        _s("minimum_quantity"),
        _s("price"),
        _s("next_price"),
    ]
)

# Localized text feed: the MidOcean product API is language-
# parameterized (etl/extractors/midocean_extractor.py:144-148 passes
# ?language=); each extra-language fetch re-lands the textual fields
# as one row per (master_code, language).
MO_PRODUCTS_I18N = StructType(
    [
        _s("master_code"),
        _s("language"),
        _s("product_name"),
        _s("short_description"),
        _s("long_description"),
    ]
)

# Sustainability feed (unified.jsonc:196-227): per-master eco flags,
# recycled content, LCA CO2 total + stage breakdown (EU-string
# numerics), social-audit codes as a comma list.
MO_SUSTAINABILITY = StructType(
    [
        _s("master_code"),
        _s("eco"),  # "yes"/"no" stringly boolean
        _s("recycled_content_pct"),
        _s("co2_total"),  # "0,43" EU decimal, kg
        _s("co2_material"),
        _s("co2_packaging"),
        _s("co2_transport"),
        _s("co2_eol"),
        _s("social_audits"),  # "BSCI,SMETA"
        _s("green_points"),
    ]
)

# B6: one row per SKU
MO_STOCK = StructType(
    [
        _s("sku"),
        StructField("qty", LongType(), True),
        _s("first_arrival_date"),
        StructField("first_arrival_qty", LongType(), True),
        _s("next_arrival_date"),
        StructField("next_arrival_qty", LongType(), True),
        _s("modified_at"),
    ]
)

# ---------------------------------------------------------------------------
# Unified product (silver/gold) — nested, one row per product
# ---------------------------------------------------------------------------

PRICE = StructType(
    [
        StructField("amount", DoubleType(), True),
        _s("currency"),
        _s("price_type"),
        StructField("min_quantity", IntegerType(), True),
        StructField("max_quantity", IntegerType(), True),
        _s("valid_until"),
    ]
)

IMAGE = StructType([_s("url"), _s("url_high_res"), _s("subtype"), _s("description")])

CATEGORY = StructType([_s("name"), StructField("level", IntegerType(), True)])

VARIANT = StructType(
    [
        _s("variant_id"),
        _s("sku"),
        _s("status"),
        _s("color_code"),
        _s("color_name"),
        _s("color_group"),
        _s("gtin"),
        StructField("prices", ArrayType(PRICE), True),
        StructField("images", ArrayType(IMAGE), True),
    ]
)

PRINT_POSITION = StructType(
    [
        _s("position_id"),
        _s("position_type"),
        StructField("max_width", DoubleType(), True),
        StructField("max_height", DoubleType(), True),
        _s("size_unit"),
        StructField("techniques", ArrayType(StringType()), True),
        StructField("images", ArrayType(StringType()), True),
    ]
)

PRINT_OPTION = StructType(
    [
        _s("technique"),
        _s("technique_id"),
        _s("position"),
        StructField("setup_cost", DoubleType(), True),
        StructField("prices", ArrayType(PRICE), True),
    ]
)

UNIFIED_PRODUCT = StructType(
    [
        _s("product_id"),
        _s("supplier_id"),
        _s("supplier_name"),
        _s("supplier_product_code"),
        _s("name"),
        _s("short_description"),
        _s("long_description"),
        _s("brand"),
        _s("material"),
        _s("country_of_origin"),
        _s("tariff_code"),
        _s("status"),
        StructField("is_printable", BooleanType(), True),
        StructField("n_print_positions", IntegerType(), True),
        StructField(
            "dimensions",
            StructType(
                [
                    StructField("length", DoubleType(), True),
                    StructField("width", DoubleType(), True),
                    StructField("height", DoubleType(), True),
                    _s("unit"),
                ]
            ),
            True,
        ),
        StructField(
            "weight",
            StructType([StructField("value", DoubleType(), True), _s("unit")]),
            True,
        ),
        StructField("carton_quantity", IntegerType(), True),
        StructField("base_price", DoubleType(), True),
        StructField("categories", ArrayType(CATEGORY), True),
        StructField("variants", ArrayType(VARIANT), True),
        StructField("main_images", ArrayType(IMAGE), True),
        StructField("print_positions", ArrayType(PRINT_POSITION), True),
        StructField("print_options", ArrayType(PRINT_OPTION), True),
        StructField("extra_data", MapType(StringType(), StringType()), True),
        _s("feed_timestamp"),
    ]
)
