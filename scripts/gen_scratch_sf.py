#!/usr/bin/env python
"""Generate a scratch synthetic dataset with the SAME schema and
statistical shape as /root/testdata/sf* at an arbitrary scale factor
(round-11 VERDICT item 2: extend the scale curves a third decade to
sf≈1, where the fixed per-job floors stop dominating and the
floor-adjusted exponents resolve toward their true slopes).

/root/testdata is read-only, so this writes NEW synthetic data under
the repo (default .scratch/sf<sf>, gitignored). Generation is
KEY-DETERMINISTIC — every cell is a hash of (seed, table, key,
field), computed executor-side with xxhash64 over spark.range — so
the dataset is reproducible without RNG state, generation scales like
any other Spark job (no driver loops), and re-runs are idempotent.

Distribution fidelity (measured from /root/testdata/sf0.1, see
SCALE.md): same column domains (Brand#1..25, 6 p_types, 5 priorities,
30-word document vocabulary, 5 langs at the en-heavy mix, 20
sources), same ranges (p_size 1..50, discount 0..0.10, tax 0..0.08,
doc length 10..100 words), same FK fan-outs (10 orders/customer, ~4
lineitems/order, lineitem→part/supplier uniform), and the same
planted near-dup structure in documents: 5% of docs are a copy of an
earlier NON-DUP doc with one token dropped and a 'dup' token appended
(shingle-Jaccard ≈0.9+, occasional chains when two copies pick the
same base — exactly what dedup_cluster_resolution clusters).

Row counts scale the testdata rule: ×1000·sf for the TPC-H-ish
tables, documents = 500·(sf/0.01) capped below at 500, embeddings
follows the testdata's ×4-per-decade curve (500@0.01, 2000@0.1,
8000@1).

Usage:
    python scripts/gen_scratch_sf.py [--sf 1.0] [--out .scratch/sf1]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SEED = 42

REGIONS = ("AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST")
SEGMENTS = ("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY")
ADJ = ("blue", "cold", "hot", "large", "new", "old", "red", "small")
NOUN = ("anvil", "bolt", "gear", "gizmo", "plate", "ring", "rod", "widget")
PTYPES = ("ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD")
PRIORITIES = ("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")
ETYPES = ("click", "error", "purchase", "signup", "view")
LANGS = ("en", "en", "en", "en", "de", "es", "fr", "zh")  # ~41% en, like testdata
VOCAB = (
    "spark window merge table column vector stream value data small join "
    "filter big group hash customer sort order slow line part fast the row "
    "agg key query a scan batch"
).split()
EMB_DIM = 64
EMB_HALF_WIDTH = 0.5774  # testdata components are uniform in ±1/sqrt(3)


def _h(*cols):
    """Deterministic 64-bit draw: xxhash64 over (seed, *cols)."""
    from pyspark.sql import functions as F

    return F.abs(F.xxhash64(F.lit(SEED), *cols))


def _pick(values, *cols):
    from pyspark.sql import functions as F

    arr = F.array(*[F.lit(v) for v in values])
    return F.element_at(arr, (_h(*cols) % len(values) + 1).cast("int"))


def _doc_words(id_col, tag: str):
    """Deterministic word list for a BASE document id: 10..100 words
    from the 30-word vocabulary. Must stay a pure function of the id —
    dup docs re-derive their base's words from this same formula."""
    from pyspark.sql import functions as F

    n = (_h(id_col, F.lit(f"{tag}:n")) % 91 + 10).cast("int")
    return F.transform(
        F.sequence(F.lit(1), n),
        lambda i: _pick(VOCAB, id_col, F.lit(f"{tag}:w"), i),
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", type=float, default=1.0)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    sf = args.sf
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = args.out or os.path.join(repo, ".scratch", f"sf{sf:g}")
    os.makedirs(out, exist_ok=True)

    from pyspark.sql import functions as F

    from pim_etl_spark.session import get_spark

    spark = get_spark(app_name="pim-etl-spark-gen-scratch")
    spark.sparkContext.setLogLevel("ERROR")

    n_cust = int(150_000 * sf)
    n_supp = int(10_000 * sf)
    n_part = int(200_000 * sf)
    n_orders = int(1_500_000 * sf)
    n_events = int(1_000_000 * sf)
    n_docs = max(500, int(500 * sf / 0.01))
    n_emb = max(500, int(500 * (sf / 0.01) ** 0.6))  # 500@0.01, 2k@0.1, 8k@1

    def write(df, name):
        """Write distributed, then repack to ONE parquet file so the
        layout matches /root/testdata (DuckDB oracles register views
        as read_parquet('<dir>/<t>.parquet') — a Spark part-file
        directory would not resolve)."""
        import shutil

        import duckdb

        tmp = os.path.join(out, f"_tmp_{name}")
        df.write.mode("overwrite").parquet(tmp)
        dest = os.path.join(out, f"{name}.parquet")
        duckdb.connect().execute(
            f"COPY (SELECT * FROM read_parquet('{tmp}/*.parquet')) TO '{dest}' (FORMAT PARQUET)"
        )
        shutil.rmtree(tmp, ignore_errors=True)
        print(f"  {name}: done", file=sys.stderr)

    write(
        spark.createDataFrame(
            [(i, r) for i, r in enumerate(REGIONS)], "r_regionkey int, r_name string"
        ),
        "region",
    )
    write(
        spark.createDataFrame(
            [(i, f"NATION_{i}", i % 5) for i in range(25)],
            "n_nationkey int, n_name string, n_regionkey int",
        ),
        "nation",
    )

    cust = spark.range(n_cust).select(
        F.col("id").alias("c_custkey"),
        F.format_string("Customer#%09d", F.col("id")).alias("c_name"),
        (_h(F.col("id"), F.lit("cn")) % 25).cast("int").alias("c_nationkey"),
        ((_h(F.col("id"), F.lit("cb")) % 1_099_966).cast("double") / 100 - 1000).alias(
            "c_acctbal"
        ),
        _pick(SEGMENTS, F.col("id"), F.lit("cs")).alias("c_mktsegment"),
    )
    write(cust, "customer")

    supp = spark.range(n_supp).select(
        F.col("id").alias("s_suppkey"),
        F.format_string("Supplier#%09d", F.col("id")).alias("s_name"),
        (_h(F.col("id"), F.lit("sn")) % 25).cast("int").alias("s_nationkey"),
        ((_h(F.col("id"), F.lit("sb")) % 1_000_000).cast("double") / 100).alias("s_acctbal"),
    )
    write(supp, "supplier")

    part = spark.range(n_part).select(
        F.col("id").alias("p_partkey"),
        F.concat_ws(
            " ", _pick(ADJ, F.col("id"), F.lit("pa")), _pick(NOUN, F.col("id"), F.lit("pn"))
        ).alias("p_name"),
        F.concat(F.lit("Brand#"), (_h(F.col("id"), F.lit("pb")) % 25 + 1).cast("string")).alias(
            "p_brand"
        ),
        _pick(PTYPES, F.col("id"), F.lit("pt")).alias("p_type"),
        (_h(F.col("id"), F.lit("ps")) % 50 + 1).cast("int").alias("p_size"),
        (F.lit(900.0) + (F.col("id") % 1000).cast("double") / 10).alias("p_retailprice"),
    )
    write(part, "part")

    odate = F.timestamp_seconds(
        F.unix_timestamp(F.lit("1995-01-01 00:00:00"))
        + _h(F.col("id"), F.lit("od")) % (2400 * 86400)  # ~6.6y span like testdata
    ).cast("timestamp_ntz")
    orders = spark.range(n_orders).select(
        F.col("id").alias("o_orderkey"),
        (_h(F.col("id"), F.lit("oc")) % n_cust).alias("o_custkey"),
        _pick(("O", "P", "F"), F.col("id"), F.lit("os")).alias("o_orderstatus"),
        ((_h(F.col("id"), F.lit("op")) % 49_899_128).cast("double") / 100 + 1000).alias(
            "o_totalprice"
        ),
        odate.alias("o_orderdate"),
        _pick(PRIORITIES, F.col("id"), F.lit("oo")).alias("o_orderpriority"),
    )
    write(orders, "orders")

    # lineitem: 1..7 lines per order (mean 4, matching the testdata
    # fan-out); shipdate = orderdate + 1..95 days
    li_base = spark.range(n_orders).select(
        F.col("id").alias("l_orderkey"),
        odate.alias("_odate"),
        F.explode(
            F.sequence(F.lit(1), (_h(F.col("id"), F.lit("ln")) % 7 + 1).cast("int"))
        ).alias("l_linenumber"),
    )
    lk, ln = F.col("l_orderkey"), F.col("l_linenumber")
    lineitem = li_base.select(
        "l_orderkey",
        (_h(lk, ln, F.lit("lp")) % n_part).alias("l_partkey"),
        (_h(lk, ln, F.lit("ls")) % n_supp).alias("l_suppkey"),
        ln.cast("int"),
        (_h(lk, ln, F.lit("lq")) % 50 + 1).cast("double").alias("l_quantity"),
        ((_h(lk, ln, F.lit("le")) % 10_409_923).cast("double") / 100 + 900).alias(
            "l_extendedprice"
        ),
        ((_h(lk, ln, F.lit("ld")) % 11).cast("double") / 100).alias("l_discount"),
        ((_h(lk, ln, F.lit("lt")) % 9).cast("double") / 100).alias("l_tax"),
        _pick(("A", "N", "R"), lk, ln, F.lit("lr")).alias("l_returnflag"),
        _pick(("O", "F"), lk, ln, F.lit("ll")).alias("l_linestatus"),
        (F.col("_odate") + F.make_dt_interval(_h(lk, ln, F.lit("lsd")) % 95 + 1)).alias(
            "l_shipdate"
        ),
    )
    write(lineitem, "lineitem")

    events = spark.range(n_events).select(
        F.col("id").alias("event_id"),
        F.timestamp_seconds(
            F.unix_timestamp(F.lit("2024-01-01 00:00:00"))
            + _h(F.col("id"), F.lit("et")) % (30 * 86400)
            + (_h(F.col("id"), F.lit("eu")) % 1_000_000).cast("double") / 1_000_000
        )
        .cast("timestamp_ntz")
        .alias("ts"),
        (_h(F.col("id"), F.lit("ei")) % n_cust).alias("user_id"),
        _pick(ETYPES, F.col("id"), F.lit("ee")).alias("event_type"),
        ((_h(F.col("id"), F.lit("ev")) % 56_022).cast("double") / 100).alias("value"),
        F.format_string(
            '{"k": %d}', (_h(F.col("id"), F.lit("ek")) % 100).cast("int")
        ).alias("props"),
    )
    write(events, "events")

    # documents: 5% are near-copies (one token dropped + 'dup'
    # appended) of an earlier NON-dup doc — the base's words re-derive
    # from the same pure formula, so no driver-side text state exists
    ident = F.col("id")
    is_dup = (ident % 20 == 11) & (ident >= 20)
    # greatest(ident, 1): ids 0..19 are never dups, but ANSI mode
    # evaluates both branches — a literal % 0 would throw
    safe_id = F.greatest(ident, F.lit(1))
    base_raw = _h(ident, F.lit("db")) % safe_id
    base_id = F.when(base_raw % 20 == 11, (base_raw + 1) % safe_id).otherwise(base_raw)
    own_words = _doc_words(ident, "dw")
    base_words = _doc_words(base_id, "dw")
    drop_pos = (_h(ident, F.lit("dd")) % F.size(base_words) + 1).cast("int")
    dup_words = F.concat(
        F.filter(base_words, lambda w, i: i + 1 != drop_pos), F.array(F.lit("dup"))
    )
    text = F.array_join(F.when(is_dup, dup_words).otherwise(own_words), " ")
    docs = spark.range(n_docs).select(
        ident.alias("doc_id"),
        text.alias("text"),
        _pick(LANGS, ident, F.lit("dl")).alias("lang"),
        F.concat(F.lit("src"), (ident % 20).cast("string")).alias("source"),
        F.length(text).cast("long").alias("n_chars"),
    )
    write(docs, "documents")

    emb = spark.range(n_emb).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(1), F.lit(EMB_DIM)),
            lambda j: (
                (_h(F.col("id"), F.lit("em"), j) % 1_000_001).cast("double") / 1_000_000
                * (2 * EMB_HALF_WIDTH)
                - EMB_HALF_WIDTH
            ).cast("float"),
        ).alias("embedding"),
        (_h(F.col("id"), F.lit("el")) % 10).cast("int").alias("label"),
    )
    write(emb, "embeddings")

    print(f"wrote scratch sf={sf:g} dataset to {out}", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
