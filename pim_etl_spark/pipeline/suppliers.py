"""Additional supplier transforms (SURVEY §2.9 registry breadth).

The reference implements one supplier (MidOcean) and documents eight
more as annotated feed shapes (sample data/ + flat-structure/ +
unified.jsonc field mappings). Three representative dialects are built
here, each exercising a distinct operator family the MidOcean path
doesn't:

- **Laltex**: "£1.54" money strings (F18) and MinQuantity/MaxQuantity
  string bands with "N/A" open ends → typed tier ranges (J5 shape).
  Shapes: flat-structure/laltex.json:12-73.
- **XD**: wide Qty1..Qty6 / ItemPriceNet_Qty1..6 price columns →
  unpivoted tier rows (N6 stack), comma-separated image list (F16).
  Shapes: sample data/XD Sample Data.jsonc:68,104-124.
- **Keramikos**: ProductSpecifications key/value rows → attribute map
  (N7 map_from_entries); (QuantityFrom, NumberOfColours, UnitPrice)
  long-form print grid. Shapes: flat-structure/keramikos.json:7-55.

Each produces the same unified-product column family as the MidOcean
silver transform, so gold-layer ops compose across suppliers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType, StructField, StructType

from pim_etl_spark import functions as pf
from pim_etl_spark.pipeline.registry import SupplierSpec, register_supplier


def _s(name: str) -> StructField:
    return StructField(name, StringType(), True)


# ---------------------------------------------------------------------------
# Laltex
# ---------------------------------------------------------------------------

LALTEX_PRODUCTS = StructType(
    [
        _s("ProductCode"),
        _s("ProductName"),
        _s("Description"),
        _s("Brand"),
        _s("CountryOfOrigin"),
        _s("Price"),  # "£1.54"
        _s("CartonQty"),
        _s("Weight"),  # "0.12 kg"
    ]
)

LALTEX_PRICEBANDS = StructType(
    [_s("ProductCode"), _s("MinQuantity"), _s("MaxQuantity"), _s("UnitPrice")]
)

# Shipping-charge tiers (unified.jsonc:377-406 shippingDetails): per
# service, carton-count bands with "£18.85"-style charges; "N/A" marks
# open bands / not-offered charges — the same banded-tier shape as the
# price bands.
LALTEX_SHIPPING = StructType(
    [
        _s("ServiceType"),
        _s("ServiceName"),
        _s("CartonFrom"),
        _s("CartonTo"),
        _s("ShippingCharge"),
        _s("PerCartonCharge"),
    ]
)


def build_shipping_details(shipping_raw: DataFrame) -> DataFrame:
    """Fold shipping-charge band rows into ONE row holding the unified
    ``shipping_details`` array (service → sorted charge bands) —
    catalog-level data attached product-agnostically by broadcast
    cross join, exactly like the technique print-option pricelist."""
    na_null = lambda c: F.when(F.upper(F.col(c)) == "N/A", None)  # noqa: E731
    bands = shipping_raw.select(
        "ServiceType",
        "ServiceName",
        pf.parse_thousands_int("CartonFrom").cast("int").alias("carton_from"),
        na_null("CartonTo").otherwise(pf.parse_thousands_int("CartonTo").cast("int")).alias("carton_to"),
        na_null("ShippingCharge").otherwise(pf.parse_money("ShippingCharge")).alias("shipping_charge"),
        na_null("PerCartonCharge").otherwise(pf.parse_money("PerCartonCharge")).alias("per_carton_charge"),
    )
    charge = F.struct(
        F.col("carton_from"), F.col("carton_to"), F.col("shipping_charge"), F.col("per_carton_charge")
    )
    cmp = lambda l, r: F.when(l["carton_from"] < r["carton_from"], -1).when(  # noqa: E731
        l["carton_from"] > r["carton_from"], 1
    ).otherwise(0)
    per_service = bands.groupBy("ServiceType", "ServiceName").agg(
        F.array_sort(F.collect_list(charge), cmp).alias("charges")
    )
    service = F.struct(
        F.col("ServiceType").alias("service_type"),
        F.col("ServiceName").alias("service_name"),
        F.lit("GBP").alias("currency"),
        F.col("charges"),
    )
    return per_service.select(service.alias("svc")).groupBy().agg(
        F.array_sort(F.collect_list("svc")).alias("shipping_details")
    )


def resolve_shipping_charge(
    unified_laltex: DataFrame, service_type: str, n_cartons: int
) -> DataFrame:
    """Shipping cost at a carton count: pick the service, pick the band
    containing n (open-ended top band included), flat charge with
    per-carton fallback — array filters only, no join or explode."""
    n = F.lit(n_cartons)
    svc = F.try_element_at(
        F.filter(F.col("shipping_details"), lambda s: s["service_type"] == service_type), F.lit(1)
    )
    band = F.try_element_at(
        F.filter(
            svc["charges"],
            lambda c: (c["carton_from"] <= n) & (c["carton_to"].isNull() | (n <= c["carton_to"])),
        ),
        F.lit(-1),
    )
    return unified_laltex.select(
        "product_id",
        F.lit(service_type).alias("service_type"),
        F.lit(n_cartons).alias("n_cartons"),
        F.coalesce(band["shipping_charge"], band["per_carton_charge"] * n).alias("charge"),
    )


def transform_laltex(feeds: dict[str, DataFrame], spark: SparkSession) -> DataFrame:
    """£-money parse + N/A-banded quantity tiers → unified products."""
    products = feeds["laltex_products"]
    bands = feeds["laltex_pricebands"].select(
        "ProductCode",
        pf.parse_thousands_int("MinQuantity").cast("int").alias("min_quantity"),
        # "N/A" marks the open top band → null max (J5 open range)
        F.when(F.upper(F.col("MaxQuantity")) == "N/A", None)
        .otherwise(pf.parse_thousands_int("MaxQuantity").cast("int"))
        .alias("max_quantity"),
        pf.parse_money("UnitPrice").alias("amount"),
    )
    tier = F.struct(
        F.col("amount"),
        F.lit("GBP").alias("currency"),
        F.lit("volume").alias("price_type"),
        F.col("min_quantity"),
        F.col("max_quantity"),
        F.lit(None).cast("string").alias("valid_until"),
    )
    cmp = lambda l, r: F.when(l["min_quantity"] < r["min_quantity"], -1).when(  # noqa: E731
        l["min_quantity"] > r["min_quantity"], 1
    ).otherwise(0)
    tiers = bands.groupBy("ProductCode").agg(
        F.array_sort(F.collect_list(tier), cmp).alias("prices")
    )
    enriched = products.join(tiers, "ProductCode", "left")
    if "laltex_shipping" in feeds:
        enriched = enriched.crossJoin(F.broadcast(build_shipping_details(feeds["laltex_shipping"])))
    else:
        empty_details = F.array().cast(
            "array<struct<service_type:string,service_name:string,currency:string,"
            "charges:array<struct<carton_from:int,carton_to:int,"
            "shipping_charge:double,per_carton_charge:double>>>>"
        )
        enriched = enriched.withColumn("shipping_details", empty_details)
    return (
        enriched
        .select(
            pf.synth_product_id("laltex", F.col("ProductCode")).alias("product_id"),
            F.lit("laltex").alias("supplier_id"),
            F.lit("Laltex").alias("supplier_name"),
            F.col("ProductCode").alias("supplier_product_code"),
            F.col("ProductName").alias("name"),
            F.col("Description").alias("short_description"),
            F.col("Brand").alias("brand"),
            F.col("CountryOfOrigin").alias("country_of_origin"),
            F.lit("active").alias("status"),
            pf.parse_money("Price").alias("base_price"),
            F.coalesce(F.col("prices"), F.array().cast(tiers.schema["prices"].dataType)).alias(
                "price_tiers"
            ),
            pf.parse_thousands_int("CartonQty").cast("int").alias("carton_quantity"),
            F.regexp_extract(F.col("Weight"), r"([\d.]+)", 1).cast("double").alias("weight_value"),
            F.regexp_extract(F.col("Weight"), r"[\d.]+\s*(\w+)", 1).alias("weight_unit"),
            F.col("shipping_details"),
        )
    )


def resolve_tier_price(unified_laltex: DataFrame, quantity: int) -> DataFrame:
    """Price-at-quantity resolution over banded tiers (SURVEY J5):
    pick the tier whose [min, max] contains q — array filter, no join."""
    q = F.lit(quantity)
    applicable = F.filter(
        F.col("price_tiers"),
        lambda t: (t["min_quantity"] <= q)
        & (t["max_quantity"].isNull() | (q <= t["max_quantity"])),
    )
    return unified_laltex.select(
        "product_id",
        F.lit(quantity).alias("quantity"),
        F.try_element_at(applicable, F.lit(-1))["amount"].alias("unit_price"),
    )


# ---------------------------------------------------------------------------
# XD Connects
# ---------------------------------------------------------------------------

XD_PRODUCTS = StructType(
    [
        _s("ItemCode"),
        _s("ItemName"),
        _s("LongDescription"),
        _s("BrandName"),
        _s("AllImages"),  # comma-separated URL list
        _s("ItemDataLastModifiedDateTime"),
        *[_s(f"Qty{i}") for i in range(1, 7)],
        *[_s(f"ItemPriceNet_Qty{i}") for i in range(1, 7)],
    ]
)


def transform_xd(feeds: dict[str, DataFrame], spark: SparkSession) -> DataFrame:
    """Wide Qty1..6 price columns → long tier rows (N6 unpivot) and a
    comma-split image array (F16)."""
    xd = feeds["xd_products"]
    stack_expr = "stack(6, " + ", ".join(
        f"Qty{i}, ItemPriceNet_Qty{i}" for i in range(1, 7)
    ) + ") AS (qty_str, price_str)"
    tiers_long = (
        xd.select("ItemCode", F.expr(stack_expr))
        .filter(F.col("qty_str").isNotNull() & (F.col("qty_str") != ""))
        .select(
            "ItemCode",
            pf.parse_thousands_int("qty_str").cast("int").alias("min_quantity"),
            pf.parse_eu_decimal("price_str").alias("amount"),
        )
    )
    tier = F.struct(
        F.col("amount"),
        F.lit("EUR").alias("currency"),
        F.lit("volume").alias("price_type"),
        F.col("min_quantity"),
        F.lit(None).cast("int").alias("max_quantity"),
        F.lit(None).cast("string").alias("valid_until"),
    )
    cmp = lambda l, r: F.when(l["min_quantity"] < r["min_quantity"], -1).when(  # noqa: E731
        l["min_quantity"] > r["min_quantity"], 1
    ).otherwise(0)
    tiers = tiers_long.groupBy("ItemCode").agg(F.array_sort(F.collect_list(tier), cmp).alias("price_tiers"))
    return (
        xd.join(tiers, "ItemCode", "left")
        .select(
            pf.synth_product_id("xd", F.col("ItemCode")).alias("product_id"),
            F.lit("xd").alias("supplier_id"),
            F.lit("XD Connects").alias("supplier_name"),
            F.col("ItemCode").alias("supplier_product_code"),
            F.col("ItemName").alias("name"),
            F.col("LongDescription").alias("long_description"),
            F.col("BrandName").alias("brand"),
            F.lit("active").alias("status"),
            F.split(F.col("AllImages"), r",\s*").alias("image_urls"),
            F.col("price_tiers"),
            F.try_element_at(F.col("price_tiers"), F.lit(1))["amount"].alias("base_price"),
            F.to_timestamp(F.col("ItemDataLastModifiedDateTime")).alias("modified_at"),
        )
    )


# ---------------------------------------------------------------------------
# Keramikos
# ---------------------------------------------------------------------------

SPEC_ROW = StructType([_s("SpecificationText"), _s("SpecificationValue")])

KERAMIKOS_PRODUCTS = StructType(
    [
        _s("Code"),
        _s("Name"),
        _s("Material"),
        _s("DimensionsText"),  # "185 x 70mm"
        StructField("ProductSpecifications", ArrayType(SPEC_ROW), True),
    ]
)

KERAMIKOS_PRINTGRID = StructType(
    [_s("Code"), _s("QuantityFrom"), _s("NumberOfColours"), _s("UnitPrice")]
)


def transform_keramikos(feeds: dict[str, DataFrame], spark: SparkSession) -> DataFrame:
    """Spec rows → attribute map (N7), dimension-string parse (F17),
    (qty, colours) print grid → nested tiers."""
    km = feeds["keramikos_products"]
    grid = feeds["keramikos_printgrid"].select(
        "Code",
        pf.parse_thousands_int("QuantityFrom").cast("int").alias("min_quantity"),
        F.col("NumberOfColours").cast("int").alias("n_colours"),
        pf.parse_eu_decimal("UnitPrice").alias("amount"),
    )
    cell = F.struct(F.col("min_quantity"), F.col("n_colours"), F.col("amount"))
    cmp = lambda l, r: (  # noqa: E731 — (qty, colours) lexicographic
        F.when(l["min_quantity"] < r["min_quantity"], -1)
        .when(l["min_quantity"] > r["min_quantity"], 1)
        .when(l["n_colours"] < r["n_colours"], -1)
        .when(l["n_colours"] > r["n_colours"], 1)
        .otherwise(0)
    )
    grids = grid.groupBy("Code").agg(F.array_sort(F.collect_list(cell), cmp).alias("print_grid"))
    spec_map = F.map_from_entries(
        F.transform(
            F.col("ProductSpecifications"),
            lambda s: F.struct(s["SpecificationText"], s["SpecificationValue"]),
        )
    )
    dims = pf.dims_from_string(
        F.regexp_replace(F.col("DimensionsText"), r"(?i)\s*x\s*", "X")
    )
    return (
        km.join(grids, "Code", "left")
        .select(
            pf.synth_product_id("keramikos", F.col("Code")).alias("product_id"),
            F.lit("keramikos").alias("supplier_id"),
            F.lit("Keramikos").alias("supplier_name"),
            F.col("Code").alias("supplier_product_code"),
            F.col("Name").alias("name"),
            F.col("Material").alias("material"),
            F.lit("active").alias("status"),
            spec_map.alias("extra_data"),
            dims.alias("dimensions"),
            F.col("print_grid"),
        )
    )


# ---------------------------------------------------------------------------
# PFConcept — print prices in column NAMES (PrintPriceNet_<qty>)
# ---------------------------------------------------------------------------

PFC_QTY_COLUMNS = (25, 50, 100, 250, 1000, 10000)

PFC_PRODUCTS = StructType(
    [
        _s("ItemNumber"),
        _s("ItemName"),
        _s("CategoryName"),
        _s("NetWeight"),  # "0,138" EU decimal
        *[_s(f"PrintPriceNet_{q}") for q in PFC_QTY_COLUMNS],
    ]
)


def transform_pfconcept(feeds: dict[str, DataFrame], spark: SparkSession) -> DataFrame:
    """Qty-in-column-name unpivot (SURVEY N6 second flavor — the PFC
    PrintPriceNet_1..10000 shape): the tier quantity lives in the
    COLUMN NAME, so the stack literal carries it as a constant."""
    pfc = feeds["pfc_products"]
    stack_expr = (
        f"stack({len(PFC_QTY_COLUMNS)}, "
        + ", ".join(f"{q}, PrintPriceNet_{q}" for q in PFC_QTY_COLUMNS)
        + ") AS (min_quantity, price_str)"
    )
    tiers_long = (
        pfc.select("ItemNumber", F.expr(stack_expr))
        .filter(F.col("price_str").isNotNull() & (F.col("price_str") != ""))
        .select(
            "ItemNumber",
            F.col("min_quantity").cast("int").alias("min_quantity"),
            pf.parse_eu_decimal("price_str").alias("amount"),
        )
    )
    tier = F.struct(
        F.col("amount"),
        F.lit("EUR").alias("currency"),
        F.lit("print").alias("price_type"),
        F.col("min_quantity"),
        F.lit(None).cast("int").alias("max_quantity"),
        F.lit(None).cast("string").alias("valid_until"),
    )
    cmp = lambda l, r: F.when(l["min_quantity"] < r["min_quantity"], -1).when(  # noqa: E731
        l["min_quantity"] > r["min_quantity"], 1
    ).otherwise(0)
    tiers = tiers_long.groupBy("ItemNumber").agg(
        F.array_sort(F.collect_list(tier), cmp).alias("print_price_tiers")
    )
    return pfc.join(tiers, "ItemNumber", "left").select(
        pf.synth_product_id("pfconcept", F.col("ItemNumber")).alias("product_id"),
        F.lit("pfconcept").alias("supplier_id"),
        F.lit("PF Concept").alias("supplier_name"),
        F.col("ItemNumber").alias("supplier_product_code"),
        F.col("ItemName").alias("name"),
        F.lit("active").alias("status"),
        F.array(F.struct(F.col("CategoryName").alias("name"), F.lit(1).alias("level"))).alias(
            "categories"
        ),
        pf.parse_eu_decimal("NetWeight").alias("weight_value"),
        F.lit("kg").alias("weight_unit"),
        F.col("print_price_tiers"),
    )


# ---------------------------------------------------------------------------
# Sanmar — flat SKU rows rolled UP into nested products
# ---------------------------------------------------------------------------

SANMAR_SKUS = StructType(
    [
        _s("StyleNumber"),
        _s("StyleName"),
        _s("Brand"),
        _s("ColorName"),
        _s("SizeName"),
        _s("SkuID"),
        _s("PiecePrice"),  # "4.59" plain decimal
        _s("CaseQty"),
        # per-SKU change tracking (`sample data/Sanmar Sample Data.jsonc:236`)
        _s("lastChangeDate"),
    ]
)

SIZE_ORDER = ["XS", "S", "M", "L", "XL", "2XL", "3XL"]


def transform_sanmar(feeds: dict[str, DataFrame], spark: SparkSession) -> DataFrame:
    """Flat→nested rollup (the inverse of the MidOcean explode): the
    apparel feed is one row per (style, color, size) SKU; products are
    reconstructed by grouping — variants ordered by (color, size rank)
    via a comparator sort, sizes deduped into a product-level array."""
    skus = feeds["sanmar_skus"]
    size_rank = F.array_position(F.array(*[F.lit(s) for s in SIZE_ORDER]), F.col("SizeName"))
    variant = F.struct(
        F.col("ColorName").alias("color_name"),
        F.col("SizeName").alias("size"),
        size_rank.cast("int").alias("size_rank"),
        F.col("SkuID").alias("sku"),
        F.col("PiecePrice").cast("double").alias("price"),
        pf.parse_thousands_int("CaseQty").cast("int").alias("case_qty"),
    )
    cmp = lambda l, r: (  # noqa: E731 — (color, size order) sort
        F.when(l["color_name"] < r["color_name"], -1)
        .when(l["color_name"] > r["color_name"], 1)
        .when(l["size_rank"] < r["size_rank"], -1)
        .when(l["size_rank"] > r["size_rank"], 1)
        .otherwise(0)
    )
    return (
        skus.groupBy("StyleNumber")
        .agg(
            F.first("StyleName").alias("name"),
            F.first("Brand").alias("brand"),
            F.array_sort(F.collect_list(variant), cmp).alias("variants_flat"),
            F.round(F.min(F.col("PiecePrice").cast("double")), 2).alias("base_price"),
            F.array_sort(F.collect_set("ColorName")).alias("colors_available"),
            F.array_sort(F.collect_set("SizeName")).alias("sizes_available"),
            # product watermark = newest SKU change: a product must
            # resync when ANY of its SKUs moved (incremental --since)
            F.max(F.to_timestamp(F.col("lastChangeDate"))).alias("modified_at"),
        )
        .select(
            pf.synth_product_id("sanmar", F.col("StyleNumber")).alias("product_id"),
            F.lit("sanmar").alias("supplier_id"),
            F.lit("SanMar").alias("supplier_name"),
            F.col("StyleNumber").alias("supplier_product_code"),
            "name",
            "brand",
            F.lit("active").alias("status"),
            "base_price",
            "variants_flat",
            "colors_available",
            "sizes_available",
            "modified_at",
        )
    )


# ---------------------------------------------------------------------------
# S&S Activewear — multiple price TYPES per SKU (piece / dozen / case)
# ---------------------------------------------------------------------------

SS_PRODUCTS = StructType(
    [
        _s("StyleID"),
        _s("StyleName"),
        _s("BrandName"),
        _s("PiecePrice"),
        _s("DozenPrice"),
        _s("CasePrice"),
        _s("CaseSize"),
    ]
)


def transform_ss(feeds: dict[str, DataFrame], spark: SparkSession) -> DataFrame:
    """Price-TYPE variety (piece/dozen/case — the PriceType enum of the
    unified schema, schemas/unified_product_schema.py:11-20): three
    price columns become an array of typed Price structs with their
    implied minimum quantities; nulls drop out via array filter."""
    ss = feeds["ss_products"]
    case_size = pf.parse_thousands_int("CaseSize").cast("int")

    def price(col: str, ptype: str, min_qty) -> F.Column:
        return F.struct(
            F.col(col).cast("double").alias("amount"),
            F.lit("USD").alias("currency"),
            F.lit(ptype).alias("price_type"),
            (min_qty if isinstance(min_qty, F.Column) else F.lit(min_qty)).cast("int").alias(
                "min_quantity"
            ),
            F.lit(None).cast("int").alias("max_quantity"),
            F.lit(None).cast("string").alias("valid_until"),
        )

    prices = F.filter(
        F.array(
            price("PiecePrice", "piece", 1),
            price("DozenPrice", "dozen", 12),
            price("CasePrice", "case", case_size),
        ),
        lambda p: p["amount"].isNotNull(),
    )
    return ss.select(
        pf.synth_product_id("ss", F.col("StyleID")).alias("product_id"),
        F.lit("ss").alias("supplier_id"),
        F.lit("S&S Activewear").alias("supplier_name"),
        F.col("StyleID").alias("supplier_product_code"),
        F.col("StyleName").alias("name"),
        F.col("BrandName").alias("brand"),
        F.lit("active").alias("status"),
        prices.alias("prices"),
        F.col("PiecePrice").cast("double").alias("base_price"),
        case_size.alias("carton_quantity"),
    )


# ---------------------------------------------------------------------------
# Preseli — multi-currency price columns
# ---------------------------------------------------------------------------

PRESELI_PRODUCTS = StructType(
    [
        _s("Ref"),
        _s("Name"),
        _s("Category"),
        _s("PriceGBP"),
        _s("PriceEUR"),
        _s("PriceUSD"),
        _s("LeadTimeDays"),
    ]
)


def transform_preseli(feeds: dict[str, DataFrame], spark: SparkSession) -> DataFrame:
    """Multi-currency price columns → currency-keyed Price array (the
    unified schema's Currency enum surface): one struct per non-null
    currency column, GBP preferred for base_price with EUR fallback
    (coalesce chain — the F13 null-handling idiom)."""
    ps = feeds["preseli_products"]

    def cprice(col: str, cur: str) -> F.Column:
        return F.struct(
            pf.parse_eu_decimal(col).alias("amount"),
            F.lit(cur).alias("currency"),
            F.lit("list").alias("price_type"),
            F.lit(1).cast("int").alias("min_quantity"),
            F.lit(None).cast("int").alias("max_quantity"),
            F.lit(None).cast("string").alias("valid_until"),
        )

    prices = F.filter(
        F.array(cprice("PriceGBP", "GBP"), cprice("PriceEUR", "EUR"), cprice("PriceUSD", "USD")),
        lambda p: p["amount"].isNotNull(),
    )
    return ps.select(
        pf.synth_product_id("preseli", F.col("Ref")).alias("product_id"),
        F.lit("preseli").alias("supplier_id"),
        F.lit("Preseli").alias("supplier_name"),
        F.col("Ref").alias("supplier_product_code"),
        F.col("Name").alias("name"),
        F.array(F.struct(F.col("Category").alias("name"), F.lit(1).alias("level"))).alias("categories"),
        F.lit("active").alias("status"),
        prices.alias("prices"),
        F.coalesce(
            pf.parse_eu_decimal("PriceGBP"), pf.parse_eu_decimal("PriceEUR"), pf.parse_eu_decimal("PriceUSD")
        ).alias("base_price"),
        F.col("LeadTimeDays").cast("int").alias("lead_time_days"),
    )


# ---------------------------------------------------------------------------
# Ralawise — per-location stock (the unified schema's per-warehouse model)
# ---------------------------------------------------------------------------

RALAWISE_PRODUCTS = StructType(
    [_s("ProductCode"), _s("ProductTitle"), _s("Brand"), _s("Colour"), _s("Size")]
)

RALAWISE_STOCK = StructType(
    [_s("ProductCode"), _s("LocationCode"), _s("LocationName"), _s("FreeStock")]
)


def transform_ralawise(feeds: dict[str, DataFrame], spark: SparkSession) -> DataFrame:
    """Per-location stock rollup (unified.jsonc per-location stock
    model, :244-256 — a shape no other dialect exercises): warehouse
    rows fold into the unified ``locations`` array-of-structs
    (id/name/qty) plus a location→qty map and a total, so stock
    queries prune to the nested column without exploding rows."""
    products = feeds["ralawise_products"]
    stock = feeds["ralawise_stock"].select(
        "ProductCode",
        "LocationCode",
        "LocationName",
        pf.parse_thousands_int("FreeStock").alias("free_stock"),
    )
    loc = F.struct(
        F.col("LocationCode").alias("id"),
        F.col("LocationName").alias("name"),
        F.col("free_stock").alias("qty"),
    )
    per_product = stock.groupBy("ProductCode").agg(
        F.array_sort(F.collect_list(loc)).alias("stock_locations"),
        F.map_from_entries(
            F.array_sort(F.collect_list(F.struct("LocationCode", "free_stock")))
        ).alias("stock_by_location"),
        F.sum("free_stock").alias("total_stock"),
    )
    return products.join(per_product, "ProductCode", "left").select(
        pf.synth_product_id("ralawise", F.col("ProductCode")).alias("product_id"),
        F.lit("ralawise").alias("supplier_id"),
        F.lit("Ralawise").alias("supplier_name"),
        F.col("ProductCode").alias("supplier_product_code"),
        F.col("ProductTitle").alias("name"),
        F.col("Brand").alias("brand"),
        F.lit("active").alias("status"),
        F.col("Colour").alias("color_name"),
        F.col("Size").alias("size"),
        F.col("stock_locations"),
        F.col("stock_by_location"),
        F.coalesce(F.col("total_stock"), F.lit(0)).alias("total_stock"),
        # derived status the reference models as out_of_stock
        F.when(F.coalesce(F.col("total_stock"), F.lit(0)) == 0, "out_of_stock")
        .otherwise("in_stock")
        .alias("availability"),
    )


def _register_all() -> None:
    register_supplier(
        SupplierSpec(
            supplier_id="laltex",
            display_name="Laltex",
            primary_feed="laltex_products",
            required_fields=("ProductCode", "ProductName"),
            feed_schemas={
                "laltex_products": LALTEX_PRODUCTS,
                "laltex_pricebands": LALTEX_PRICEBANDS,
                "laltex_shipping": LALTEX_SHIPPING,
            },
            optional_feeds=("laltex_shipping",),
            transform=transform_laltex,
        )
    )
    register_supplier(
        SupplierSpec(
            supplier_id="xd",
            display_name="XD Connects",
            primary_feed="xd_products",
            required_fields=("ItemCode", "ItemName"),
            feed_schemas={"xd_products": XD_PRODUCTS},
            transform=transform_xd,
            watermark_field="ItemDataLastModifiedDateTime",
        )
    )
    register_supplier(
        SupplierSpec(
            supplier_id="keramikos",
            display_name="Keramikos",
            feed_schemas={"keramikos_products": KERAMIKOS_PRODUCTS, "keramikos_printgrid": KERAMIKOS_PRINTGRID},
            transform=transform_keramikos,
        )
    )
    register_supplier(
        SupplierSpec(
            supplier_id="pfconcept",
            display_name="PF Concept",
            feed_schemas={"pfc_products": PFC_PRODUCTS},
            transform=transform_pfconcept,
        )
    )
    register_supplier(
        SupplierSpec(
            supplier_id="sanmar",
            display_name="SanMar",
            feed_schemas={"sanmar_skus": SANMAR_SKUS},
            transform=transform_sanmar,
            watermark_field="lastChangeDate",
        )
    )
    register_supplier(
        SupplierSpec(
            supplier_id="ralawise",
            display_name="Ralawise",
            feed_schemas={"ralawise_products": RALAWISE_PRODUCTS, "ralawise_stock": RALAWISE_STOCK},
            transform=transform_ralawise,
        )
    )
    register_supplier(
        SupplierSpec(
            supplier_id="ss",
            display_name="S&S Activewear",
            feed_schemas={"ss_products": SS_PRODUCTS},
            transform=transform_ss,
        )
    )
    register_supplier(
        SupplierSpec(
            supplier_id="preseli",
            display_name="Preseli",
            feed_schemas={"preseli_products": PRESELI_PRODUCTS},
            transform=transform_preseli,
        )
    )


_register_all()
