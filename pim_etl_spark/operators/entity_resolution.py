"""Entity resolution / record linkage (the MDM verb of a PIM).

The reference's sync pipeline assumes each supplier feed carries clean
shared keys (sku/product_id — /root/reference/etl/transformers/
midocean_transformer.py maps them 1:1); real multi-supplier catalogs
don't: the same physical product arrives with reformatted brand codes,
abbreviated names, and drifted prices, and linking them IS the job.
This module implements the standard four-stage ER pipeline —
deterministic dirty-record derivation, multi-pass blocking, integer
feature scoring, connected-component clustering + survivorship — with
every stage DuckDB-twinned (the derivation is md5-deterministic, so
the planted ground truth is exactly replayable cross-engine).

Scale shape: candidates are generated per blocking key (never all
pairs — reduction ratio is itself a gated output), features run
map-side on the candidate set, and clustering shuffles (edge, label)
ids only. Because the raw key domains are fixed-cardinality
(brand-digits × type, type × size), raw block sizes grow LINEARLY
with data and within-block pair volume QUADRATICALLY — measured on
the synthetic tables: 94,780 pairs at sf0.01 → 9,083,972 at sf0.1
(~96× for 10× data, max raw block 50 → 358). The sorted-neighborhood
cap below (BLOCK_CAP) converts that to a linear law: oversized blocks
sort on (cents, psize, rec_id) and split into overlapping 2·CAP-record
cells, so total candidate volume is ≤ (key rows)·2·CAP — linear in
data (measured: 9.08M pairs → 3.51M at sf0.1, max block 358 → 64;
blocks ≤ 2·CAP retain all pairs, so sf0.01 volume is unchanged while
the split path still executes). The recall cost of the cap is not
asserted but MEASURED:
`pair_completeness_e4` stays in `er_blocking_candidates`' hash-gated
output, so every SF's blocking-recall number is driver-proven (the
similarity-ordered sort keeps it ~100% at tested SFs, vs 20.5% for a
random md5 split at the same pair budget). At 100 TB the knobs are
the blocking keys plus CAP: coarser keys trade candidate volume for
recall, and the audit entry measures exactly that trade.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pim_etl_spark.catalog import query
from pim_etl_spark.sources import load_table
from pim_etl_spark.tuning import loop_partitions, sorted_output

MATCH_THRESHOLD = 70

# Block-size cap via sorted-neighborhood splitting: any blocking key
# holding more than BLOCK_CAP records is sorted on (cents, psize,
# rec_id) — a TOTAL order both engines share — and each record lands
# in the two overlapping cells pos DIV CAP and pos DIV CAP + 1, so
# every cell holds <= 2*CAP records (a genuine cap) and every pair
# within CAP sort positions still meets in some cell. The sort key is
# chosen so true variants stay adjacent (planted drifts are <= 50
# cents / 1 size unit), which is why this beats a random md5 split:
# measured at sf0.1, md5(nname) sub-bucketing kept only 20.5% of true
# pairs while sorted-neighborhood keeps ~100% at the same pair-volume
# cap. 32 fires at sf0.01 (max raw block 50) and sf0.1 (358) but not
# sf0.001 (13), so the driver's sf0.01 hash gate exercises the capped
# path while the sf0.001 behavioral pins keep the uncapped
# perfect-recall semantics observable via cap=None.
BLOCK_CAP = 32

# Shared dirty-record + matcher CTE chain (DuckDB side). Three
# sources per part: A = verbatim, B = abbreviated name (upper first
# token, devoweled second) + reformatted brand + md5-drifted price
# (±50 cents), C (every 7th part) = token-swapped name + occasional
# size error. The matcher below is provenance-blind: it normalizes
# generically (lowercase, token sets, brand-digit extraction) and
# never inverts the specific perturbations.
_ER_CTE = f"""
    parts AS (
      SELECT p_partkey AS pk, p_name, p_brand, p_type, p_size,
             CAST(round(p_retailprice * 100) AS BIGINT) AS cents,
             string_split(p_name, ' ') AS tk
      FROM part
    ),
    recs AS (
      SELECT 'A' || CAST(pk AS VARCHAR) AS rec_id, pk, p_name AS name,
             p_brand AS brand, p_type AS ptype, p_size AS psize, cents
      FROM parts
      UNION ALL
      SELECT 'B' || CAST(pk AS VARCHAR), pk,
             upper(tk[1]) || ' ' || regexp_replace(tk[2], '[aeiou]', '', 'g'),
             'brd ' || regexp_extract(p_brand, '[0-9]+'),
             p_type, p_size,
             cents + CAST(('0x' || substr(md5('bdrift:' || CAST(pk AS VARCHAR)), 1, 4)) AS BIGINT) % 101 - 50
      FROM parts
      UNION ALL
      SELECT 'C' || CAST(pk AS VARCHAR), pk,
             tk[2] || ' ' || tk[1], p_brand, p_type,
             p_size + CASE WHEN CAST(('0x' || substr(md5('csz:' || CAST(pk AS VARCHAR)), 1, 4)) AS BIGINT) % 5 = 0
                           THEN 1 ELSE 0 END,
             cents
      FROM parts WHERE pk % 7 = 0
    ),
    norm AS (
      SELECT rec_id, pk, name, brand, ptype, psize, cents,
             lower(name) AS nname,
             list_sort(list_distinct(string_split(lower(name), ' '))) AS tset,
             regexp_extract(brand, '[0-9]+') AS bdig
      FROM recs
    ),
    bkeys0 AS (
      SELECT rec_id, cents, psize, 'bt|' || bdig || '|' || ptype AS bkey FROM norm
      UNION ALL
      SELECT rec_id, cents, psize, 'ts|' || ptype || '|' || CAST(psize AS VARCHAR) FROM norm
    ),
    bsz AS (SELECT bkey, count(*) AS sz FROM bkeys0 GROUP BY 1),
    bpos AS (
      -- sorted-neighborhood split of oversized blocks: a total order
      -- on (cents, psize, rec_id) puts true variants adjacent (the
      -- planted drifts are <= 50 cents / 1 size), then overlapping
      -- cells pos DIV CAP and pos DIV CAP + 1 cap every cell at 2*CAP
      -- records while covering every pair within CAP positions
      SELECT k.rec_id, k.bkey, s.sz,
             row_number() OVER (PARTITION BY k.bkey
                                ORDER BY k.cents, k.psize, k.rec_id) - 1 AS pos
      FROM bkeys0 k JOIN bsz s ON k.bkey = s.bkey
    ),
    bkeys AS (
      SELECT rec_id, bkey FROM bpos WHERE sz <= {BLOCK_CAP}
      UNION ALL
      SELECT rec_id, bkey || '#' || CAST(pos // {BLOCK_CAP} AS VARCHAR)
      FROM bpos WHERE sz > {BLOCK_CAP}
      UNION ALL
      SELECT rec_id, bkey || '#' || CAST(pos // {BLOCK_CAP} + 1 AS VARCHAR)
      FROM bpos WHERE sz > {BLOCK_CAP}
    ),
    cand AS (
      SELECT DISTINCT a.rec_id AS rec_a, b.rec_id AS rec_b
      FROM bkeys a JOIN bkeys b ON a.bkey = b.bkey AND a.rec_id < b.rec_id
    ),
    scored AS (
      SELECT c.rec_a, c.rec_b,
             CAST(levenshtein(x.nname, y.nname) AS BIGINT) AS name_lev,
             CAST(len(list_intersect(x.tset, y.tset)) * 10000
                  // len(list_distinct(x.tset || y.tset)) AS BIGINT) AS tok_jac_e4,
             abs(x.cents - y.cents) AS cents_diff,
             CAST(abs(x.psize - y.psize) AS BIGINT) AS size_diff,
             CASE WHEN x.bdig = y.bdig THEN 1 ELSE 0 END AS brand_eq,
             CASE WHEN x.ptype = y.ptype THEN 1 ELSE 0 END AS type_eq,
             CASE WHEN x.pk = y.pk THEN 1 ELSE 0 END AS is_true,
             CAST(CASE WHEN x.bdig = y.bdig THEN 30 ELSE 0 END
                  + CASE WHEN x.ptype = y.ptype THEN 10 ELSE 0 END
                  + greatest(0, 20 - 5 * abs(x.psize - y.psize))
                  + greatest(least(20, CAST(len(list_intersect(x.tset, y.tset)) * 10000
                                            // len(list_distinct(x.tset || y.tset)) AS BIGINT) * 2 // 1000),
                             greatest(0, 20 - 4 * levenshtein(x.nname, y.nname)))
                  + greatest(0, 20 - abs(x.cents - y.cents) // 10) AS BIGINT) AS score
      FROM cand c
      JOIN norm x ON c.rec_a = x.rec_id
      JOIN norm y ON c.rec_b = y.rec_id
    )
"""


def dirty_records(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalized record set from three deterministic sources.

    Columns: rec_id, pk (provenance — the matcher never reads it),
    name, brand, ptype, psize, cents, nname, tset, bdig.
    """
    # NOTE (r13): fan_out on the part scan was tried and REGRESSED
    # (dirty_records 0.51 → 0.93 s, scored_pairs 3.06 → 3.66 s at
    # sf0.1): the normalization is cheap enough that the extra
    # exchange + partition probe cost more than the parallelism buys —
    # unlike the documents-table shingle pipelines where it wins 2×.
    parts = load_table(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("pk"),
        F.col("p_name"),
        F.col("p_brand"),
        F.col("p_type").alias("ptype"),
        F.col("p_size"),
        F.round(F.col("p_retailprice") * 100).cast("long").alias("cents"),
        F.split("p_name", " ").alias("tk"),
    )
    pk_s = F.col("pk").cast("string")
    a = parts.select(
        F.concat(F.lit("A"), pk_s).alias("rec_id"),
        "pk",
        F.col("p_name").alias("name"),
        F.col("p_brand").alias("brand"),
        "ptype",
        F.col("p_size").alias("psize"),
        "cents",
    )
    bdrift = (
        F.conv(F.substring(F.md5(F.concat(F.lit("bdrift:"), pk_s)), 1, 4), 16, 10).cast("long")
        % 101
        - 50
    )
    b = parts.select(
        F.concat(F.lit("B"), pk_s).alias("rec_id"),
        "pk",
        F.concat(
            F.upper(F.col("tk").getItem(0)),
            F.lit(" "),
            F.regexp_replace(F.col("tk").getItem(1), "[aeiou]", ""),
        ).alias("name"),
        F.concat(F.lit("brd "), F.regexp_extract("p_brand", "[0-9]+", 0)).alias("brand"),
        "ptype",
        F.col("p_size").alias("psize"),
        (F.col("cents") + bdrift).alias("cents"),
    )
    csz = (
        F.conv(F.substring(F.md5(F.concat(F.lit("csz:"), pk_s)), 1, 4), 16, 10).cast("long") % 5
        == 0
    ).cast("int")
    c = parts.filter(F.col("pk") % 7 == 0).select(
        F.concat(F.lit("C"), pk_s).alias("rec_id"),
        "pk",
        F.concat(F.col("tk").getItem(1), F.lit(" "), F.col("tk").getItem(0)).alias("name"),
        F.col("p_brand").alias("brand"),
        "ptype",
        (F.col("p_size") + csz).alias("psize"),
        "cents",
    )
    recs = a.unionByName(b).unionByName(c)
    return recs.select(
        "*",
        F.lower("name").alias("nname"),
        F.array_sort(F.array_distinct(F.split(F.lower("name"), " "))).alias("tset"),
        F.regexp_extract("brand", "[0-9]+", 0).alias("bdig"),
    )


def blocking_keys(norm: DataFrame, cap: int | None = BLOCK_CAP) -> DataFrame:
    """Multi-pass blocking: (brand digits, type) catches brand
    reformatting; (type, size) catches brand-field corruption. The
    union of passes is the standard recall hedge — each pass is a
    cheap equi-key, and the pair set is the union.

    Block-size cap (the 100×-scale guard): the raw key domains are
    fixed-cardinality, so raw block sizes grow linearly with data and
    within-block pair volume quadratically. Any block above ``cap``
    records is sorted-neighborhood split (see BLOCK_CAP above): rows
    sort on the total order (cents, psize, rec_id) and land in the two
    overlapping cells ``pos DIV cap`` / ``pos DIV cap + 1``, bounding
    every cell at 2·cap records and per-block pair volume at ~2·sz·cap
    — linear in data. The recall cost is measured, not assumed:
    `pair_completeness_e4` stays in `er_blocking_candidates`'
    hash-gated output. ``cap=None`` gives the uncapped keys (the
    sf0.001 behavioral pins use it to assert the raw passes' perfect
    planted-pair completeness).

    Cost shape (round 9 — DISTRIBUTED position assignment, replacing
    the per-raw-block single-task window sort): positions within a
    block are assigned with the repo's rank + prefix-sum-offset
    pattern (``assign_surrogate_keys``, warehouse.py), specialized to
    an ORDER-PRESERVING bucketing — ``repartitionByRange`` on the full
    sort key (bkey, cents, psize, rec_id) gives every task a
    contiguous slice of the global order, a window ranks locally per
    (partition, block), and each slice adds the broadcast prefix-sum
    of the earlier slices' per-block counts. Per-task work is bounded
    by the RANGE-PARTITION size (a config dial), never by the raw
    block size (linear in data): at a 10⁴× scale-up a 3.6M-row raw
    block costs ~3.6M/n_partitions rows per task instead of one
    3.6M-row single-task sort. The offsets frame is one row per
    (block, partition-it-spans) — ≤ key_rows/partition_size + n_blocks
    rows, broadcast-sized by construction. Positions are a pure
    function of the data (the global rank in a TOTAL order — rec_id is
    unique), so the assignment is reproducible under ANY partitioning
    and the DuckDB oracle's single ``row_number() OVER (PARTITION BY
    bkey)`` stays hash-identical."""
    bt = norm.select(
        "rec_id",
        "cents",
        "psize",
        F.concat(F.lit("bt|"), F.col("bdig"), F.lit("|"), F.col("ptype")).alias("bkey"),
    )
    ts = norm.select(
        "rec_id",
        "cents",
        "psize",
        F.concat(
            F.lit("ts|"), F.col("ptype"), F.lit("|"), F.col("psize").cast("string")
        ).alias("bkey"),
    )
    raw = bt.unionByName(ts)
    if cap is None:
        return raw.select("rec_id", "bkey")
    # pid must be IDENTICAL for the two consumers below (the
    # per-(pid, bkey) counts and the final rank join), or offsets and
    # local ranks compose against different slice boundaries. That
    # consistency is made STRUCTURAL by the cache: an InMemoryRelation
    # wraps exactly ONE underlying RDD, whose shuffle dependency (and
    # the RangePartitioner's once-sampled boundaries) therefore exists
    # exactly once no matter how many branches consume it or in what
    # order AQE schedules their stages. Relying on exchange/stage
    # REUSE instead is a measured trap: reuse is a planner courtesy
    # that a semantically irrelevant plan detail can break — switching
    # repartitionByRange from conf-N to explicit-N flipped the AQE
    # stage-cache race and made both branches execute their own
    # independently-sampled range shuffle (4 runs, 4 different outputs
    # at sf0.01 — NOTES round 9). Lifetime: bounded by
    # catalog._entry_scoped's entry-start clearCache (module cache
    # contract, see scored_pairs).
    n_slices = int(raw.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    ranked = (
        raw.repartitionByRange(n_slices, "bkey", "cents", "psize", "rec_id")
        .withColumn("pid", F.spark_partition_id())
        .withColumn(
            "r",
            F.row_number().over(
                Window.partitionBy("pid", "bkey").orderBy("cents", "psize", "rec_id")
            ),
        )
        .cache()
    )
    # per-(block, slice) counts give BOTH the block total (sz — the
    # split decision) and the prefix-sum offset each slice adds; the
    # old separate whole-block size join is subsumed
    counts = ranked.groupBy("bkey", "pid").agg(F.count(F.lit(1)).alias("n"))
    w_pref = (
        Window.partitionBy("bkey").orderBy("pid").rowsBetween(Window.unboundedPreceding, -1)
    )
    w_tot = Window.partitionBy("bkey")
    offsets = counts.select(
        "bkey",
        "pid",
        F.coalesce(F.sum("n").over(w_pref), F.lit(0)).alias("off"),
        F.sum("n").over(w_tot).alias("sz"),
    )
    # global pos = earlier slices' count + local rank − 1; emit each
    # row's final key set as an array and explode — ONE pass, no
    # small/oversized union re-running the rank per branch
    cell = F.expr(f"(off + r - 1) DIV {cap}")
    keys_arr = F.when(F.col("sz") <= cap, F.array(F.col("bkey"))).otherwise(
        F.array(
            F.concat("bkey", F.lit("#"), cell.cast("string")),
            F.concat("bkey", F.lit("#"), (cell + 1).cast("string")),
        )
    )
    return (
        ranked.join(F.broadcast(offsets), ["bkey", "pid"])
        .select("rec_id", F.explode(keys_arr).alias("bkey"))
    )


def candidate_pairs(norm: DataFrame, cap: int | None = BLOCK_CAP) -> DataFrame:
    """Distinct within-block ordered pairs — the only place pairs are
    formed; everything downstream is linear in candidates (and, with
    the block-size cap, candidates are linear in data)."""
    return candidate_pairs_from_keys(blocking_keys(norm, cap=cap))


def candidate_pairs_from_keys(keys: DataFrame) -> DataFrame:
    """Within-block ordered pairs from an existing (rec_id, bkey)
    frame — callers that already hold (cached) keys avoid rebuilding
    the size join."""
    a = keys.alias("a")
    b = keys.alias("b")
    return (
        a.join(b, (F.col("a.bkey") == F.col("b.bkey")) & (F.col("a.rec_id") < F.col("b.rec_id")))
        .select(F.col("a.rec_id").alias("rec_a"), F.col("b.rec_id").alias("rec_b"))
        .distinct()
    )


def match_features(xp: str, yp: str) -> dict:
    """Integer feature + score expressions for a record pair, given
    the two column prefixes (e.g. alias-qualified ``"x."``/``"y."`` or
    rename-prefixed ``"b_"``) — the single definition every batch,
    incremental, and streaming matcher shares."""
    def c(p: str, name: str):
        return F.col(p + name)

    def nonneg_idiv(a, b):
        # exact integer floor division (SQL DIV) — PRECONDITION: both
        # operands nonnegative and b > 0 (all call sites feed abs/size
        # inputs over non-empty token sets). (a - a % b) is exactly
        # divisible by b, so the double division is exact below 2**53;
        # a NEGATIVE dividend would truncate toward zero here while
        # DuckDB's // floors — the name carries the precondition.
        a = a.cast("long")
        return ((a - (a % b)) / b).cast("long")

    name_lev = F.levenshtein(c(xp, "nname"), c(yp, "nname")).cast("long")
    # The SCORE only reads the name distance through
    # greatest(0, 20 - 4*lev), which floors at 0 for lev >= 5 — so the
    # score can use a THRESHOLDED levenshtein (r13, guide §2.3 /
    # VERDICT r12 #6): Spark's 3-arg levenshtein short-circuits to -1
    # when abs(len(a) - len(b)) > k (most cross-source pairs here: a
    # verbatim 5-token name vs a 2-token abbreviation) and otherwise
    # runs the banded O(k·n) DP instead of the full O(m·n) matrix.
    # Equivalence: lev <= 4 → same value → same term; lev > 4 → -1 →
    # term 0 = greatest(0, negative). Consumers that also project the
    # exact ``name_lev`` feature (er_matched_pairs) pay the full DP
    # only on rows surviving the match filter, because Catalyst pushes
    # the score filter below the feature projection; consumers that
    # never read name_lev (golden record, incremental/stream linkers,
    # linkage scorecard) never compute the full DP at all (column
    # pruning). Rows are unchanged either way — pinned by
    # tests/test_r13_optimizations.py against the unthresholded score.
    lev4 = F.levenshtein(c(xp, "nname"), c(yp, "nname"), 4)
    lev_term = F.when(lev4 >= 0, (F.lit(20) - 4 * lev4).cast("long")).otherwise(
        F.lit(0).cast("long")
    )
    tok_jac_e4 = nonneg_idiv(
        F.size(F.array_intersect(c(xp, "tset"), c(yp, "tset"))).cast("long") * 10000,
        F.size(F.array_union(c(xp, "tset"), c(yp, "tset"))),
    )
    cents_diff = F.abs(c(xp, "cents") - c(yp, "cents"))
    size_diff = F.abs(c(xp, "psize") - c(yp, "psize")).cast("long")
    brand_eq = (c(xp, "bdig") == c(yp, "bdig")).cast("int")
    type_eq = (c(xp, "ptype") == c(yp, "ptype")).cast("int")
    score = (
        brand_eq * 30
        + type_eq * 10
        + F.greatest(F.lit(0), F.lit(20) - 5 * size_diff)
        + F.greatest(
            F.least(F.lit(20).cast("long"), nonneg_idiv(tok_jac_e4 * 2, 1000)),
            lev_term,
        )
        + F.greatest(F.lit(0).cast("long"), F.lit(20) - nonneg_idiv(cents_diff, 10))
    ).cast("long")
    return {
        "name_lev": name_lev,
        "tok_jac_e4": tok_jac_e4,
        "cents_diff": cents_diff,
        "size_diff": size_diff,
        "brand_eq": brand_eq,
        "type_eq": type_eq,
        "score": score,
    }


def scored_pairs(
    spark: SparkSession,
    sf_dir: str,
    norm: DataFrame | None = None,
    cand_filter=None,
) -> DataFrame:
    """Candidate pairs with integer similarity features and the
    0–100 match score (see _ER_CTE for the exact formula).

    Callers that already hold a (cached) ``dirty_records`` frame pass
    it via ``norm`` so the dirty-record derivation runs once per entry
    (round-6 ADVICE); built-here norms are cached.

    CACHE-LIFETIME CONTRACT: this module's helpers (here,
    ``er_golden_record``'s edge cache, ``base_cluster_labels``) cache
    frames WITHOUT unpersisting — the lifetime is bounded by
    catalog._entry_scoped, which calls ``spark.catalog.clearCache()``
    at every catalog-entry start. A caller invoking these helpers
    outside the catalog wrapper (direct library use) owns cache
    hygiene: call ``spark.catalog.clearCache()`` (or unpersist the
    returned frames) between batches, or executor storage accumulates.

    Plan shape (re-measured round 7): candidates DISTINCT first on the
    narrow (rec_a, rec_b) ids, then each payload side re-attaches via
    a join against norm — which Catalyst broadcasts while the record
    set fits (it does at every bench SF), making both re-attaches
    map-side and levenshtein run exactly once per distinct pair. The
    alternative fused attach-then-block layout (payloads travel with
    the blocking keys, dedupe on feature rows) measured 2× SLOWER here
    (26–33 s vs 14 s at sf0.1): it re-evaluates features on
    both-blocking-pass duplicates and shuffles wide feature rows for
    the dedup. At a scale where norm stops broadcasting, AQE degrades
    the re-attaches to shuffle joins and the fused layout becomes the
    right trade — that dial, not this code, is the 100 TB knob.

    ``cand_filter`` (a Column over rec_a/rec_b) prunes candidate pairs
    BEFORE the feature joins — for consumers that provably never read
    a pair class (the incremental/streaming linkers discard every B–B
    pair: ~22% of candidates at the tested record mix), skipping their
    levenshtein/array feature evaluation is an execution-side-only
    prune with identical output."""
    if norm is None:
        norm = dirty_records(spark, sf_dir).cache()
    cand = candidate_pairs(norm)
    if cand_filter is not None:
        cand = cand.filter(cand_filter)
    x = norm.alias("x")
    y = norm.alias("y")
    joined = (
        cand.join(x, F.col("rec_a") == F.col("x.rec_id"))
        .join(y, F.col("rec_b") == F.col("y.rec_id"))
    )
    fx = match_features("x.", "y.")
    return joined.select(
        "rec_a",
        "rec_b",
        fx["name_lev"].alias("name_lev"),
        fx["tok_jac_e4"].alias("tok_jac_e4"),
        fx["cents_diff"].alias("cents_diff"),
        fx["size_diff"].alias("size_diff"),
        fx["brand_eq"].alias("brand_eq"),
        fx["type_eq"].alias("type_eq"),
        (F.col("x.pk") == F.col("y.pk")).cast("int").alias("is_true"),
        fx["score"].alias("score"),
    )


@query(
    "er_blocking_candidates",
    oracle=f"""
    -- blocking audit: per-pass block/candidate volume + the combined
    -- reduction-ratio / pair-completeness trade (ER's recall-vs-cost
    -- dial). rr_e6 = share of all possible pairs PRUNED, floor-scaled.
    WITH {_ER_CTE},
    per_block AS (
      SELECT substr(bkey, 1, 2) AS pass, bkey, count(*) AS sz
      FROM bkeys GROUP BY 1, 2
    ),
    per_pass AS (
      SELECT pass,
             CAST(count(*) AS BIGINT) AS n_blocks,
             CAST(max(sz) AS BIGINT) AS max_block,
             CAST(sum(sz * (sz - 1) // 2) AS BIGINT) AS n_pairs
      FROM per_block GROUP BY 1
    ),
    n AS (SELECT count(*) AS n_recs FROM norm),
    truth AS (
      SELECT CAST(sum(m * (m - 1) // 2) AS BIGINT) AS n_truth
      FROM (SELECT pk, count(*) AS m FROM norm GROUP BY 1)
    ),
    truth_pairs AS (
      SELECT x.rec_id AS rec_a, y.rec_id AS rec_b
      FROM norm x JOIN norm y ON x.pk = y.pk AND x.rec_id < y.rec_id
    ),
    covered AS (
      SELECT CAST(count(*) AS BIGINT) AS n_cov
      FROM truth_pairs t JOIN cand c ON t.rec_a = c.rec_a AND t.rec_b = c.rec_b
    )
    SELECT pass, n_blocks, max_block, n_pairs,
           CAST(NULL AS BIGINT) AS rr_e6, CAST(NULL AS BIGINT) AS pair_completeness_e4
    FROM per_pass
    UNION ALL
    SELECT 'all',
           (SELECT CAST(count(DISTINCT bkey) AS BIGINT) FROM bkeys),
           (SELECT CAST(max(sz) AS BIGINT) FROM per_block),
           (SELECT CAST(count(*) AS BIGINT) FROM cand),
           1000000 - (SELECT count(*) FROM cand) * 1000000
                     // (SELECT n_recs * (n_recs - 1) // 2 FROM n),
           (SELECT n_cov FROM covered) * 10000 // (SELECT n_truth FROM truth)
    ORDER BY pass
    """,
)
def er_blocking_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocking-efficiency audit: per blocking pass the block count,
    the largest block (the straggler-task predictor at scale), and the
    within-block pair volume; for the combined pass set the reduction
    ratio (share of the n·(n−1)/2 all-pairs space pruned away) and
    pair completeness (share of true pairs surviving blocking) — the
    two numbers every blocking design is judged by. All-pairs ER is
    what this table proves we never do, and since round 8 `max_block`
    also proves the BLOCK_CAP sorted-neighborhood split holds (raw max
    block 50 at sf0.01 / 358 at sf0.1 → capped ≤ 2·CAP by
    construction), with the cap's recall cost carried live in
    `pair_completeness_e4`. Pair-volume growth law: uncapped ∝ SF²
    (fixed key domains), capped ≤ key_rows·2·CAP ∝ SF."""
    norm = dirty_records(spark, sf_dir).cache()
    # cache the CAPPED key frame: it feeds the per-block stats, the
    # distinct-key count, AND the candidate self-join (cache lifetime
    # is bounded by catalog._entry_scoped's entry-start clearCache)
    keys = blocking_keys(norm).cache()
    per_block = keys.groupBy(F.substring("bkey", 1, 2).alias("pass"), "bkey").agg(
        F.count(F.lit(1)).alias("sz")
    )
    per_pass = per_block.groupBy("pass").agg(
        F.count(F.lit(1)).cast("long").alias("n_blocks"),
        F.max("sz").cast("long").alias("max_block"),
        F.sum(F.expr("sz * (sz - 1) DIV 2")).cast("long").alias("n_pairs"),
    ).select(
        "pass",
        "n_blocks",
        "max_block",
        "n_pairs",
        F.lit(None).cast("long").alias("rr_e6"),
        F.lit(None).cast("long").alias("pair_completeness_e4"),
    )
    cand = candidate_pairs_from_keys(keys).cache()
    x = norm.alias("x")
    y = norm.alias("y")
    truth_pairs = x.join(
        y, (F.col("x.pk") == F.col("y.pk")) & (F.col("x.rec_id") < F.col("y.rec_id"))
    ).select(F.col("x.rec_id").alias("rec_a"), F.col("y.rec_id").alias("rec_b"))
    combined = (
        norm.agg(F.count(F.lit(1)).alias("n_recs"))
        .crossJoin(F.broadcast(cand.agg(F.count(F.lit(1)).alias("n_cand"))))
        # one agg, not two: per_block has exactly one row per distinct
        # bkey (its pass prefix is a function of the key), so its row
        # count IS countDistinct(bkey) and rides the same job as max(sz)
        .crossJoin(
            F.broadcast(
                per_block.agg(
                    F.count(F.lit(1)).alias("n_blocks"), F.max("sz").alias("max_block")
                )
            )
        )
        .crossJoin(
            F.broadcast(truth_pairs.agg(F.count(F.lit(1)).alias("n_truth")))
        )
        .crossJoin(
            F.broadcast(
                # coverage = |truth ∩ cand| (both sides are DISTINCT
                # pair sets, so the semi count is symmetric). The BIG
                # cached side goes on the LEFT so the semi's build side
                # is the linearly-growing-but-small truth frame — AQE
                # broadcasts it while it fits (measured 2.64 s → 0.66 s
                # at sf0.1) and degrades to a shuffle semi when it
                # doesn't; no forced broadcast of a data-sized frame.
                cand.join(truth_pairs, ["rec_a", "rec_b"], "left_semi").agg(
                    F.count(F.lit(1)).alias("n_cov")
                )
            )
        )
        .select(
            F.lit("all").alias("pass"),
            F.col("n_blocks").cast("long"),
            F.col("max_block").cast("long"),
            F.col("n_cand").cast("long").alias("n_pairs"),
            (
                F.lit(1000000)
                - F.expr("n_cand * 1000000 DIV (n_recs * (n_recs - 1) DIV 2)")
            ).cast("long").alias("rr_e6"),
            F.expr("n_cov * 10000 DIV n_truth").cast("long").alias("pair_completeness_e4"),
        )
    )
    return per_pass.unionByName(combined).transform(sorted_output, "pass")


@query(
    "er_matched_pairs",
    oracle=f"""
    WITH {_ER_CTE}
    SELECT rec_a, rec_b, name_lev, tok_jac_e4, cents_diff, size_diff,
           brand_eq, type_eq, is_true, score
    FROM scored WHERE score >= {MATCH_THRESHOLD}
    ORDER BY rec_a, rec_b
    """,
)
def er_matched_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scored candidate pairs above the match threshold with their
    integer feature vector (levenshtein, token Jaccard ×10⁴, cents
    drift, size drift, brand/type agreement) — every feature exact
    integer arithmetic so the decision boundary is reproducible across
    engines AND partitionings. `is_true` carries the planted
    provenance for downstream quality audit; the score never reads it."""
    return sorted_output(
        scored_pairs(spark, sf_dir).filter(F.col("score") >= MATCH_THRESHOLD),
        "rec_a",
        "rec_b",
    )


@query(
    "er_linkage_quality",
    oracle=f"""
    -- one-row linkage scorecard vs the planted truth: pairwise
    -- precision / recall / F1, floor-scaled e4 (NOTES ratio rule)
    WITH {_ER_CTE},
    m AS (SELECT * FROM scored WHERE score >= {MATCH_THRESHOLD}),
    truth AS (
      SELECT CAST(sum(k * (k - 1) // 2) AS BIGINT) AS n_truth
      FROM (SELECT pk, count(*) AS k FROM norm GROUP BY 1)
    ),
    agg AS (
      SELECT CAST(count(*) AS BIGINT) AS n_matched,
             CAST(sum(is_true) AS BIGINT) AS tp
      FROM m
    )
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM norm) AS n_records,
           (SELECT CAST(count(*) AS BIGINT) FROM cand) AS n_candidates,
           n_matched, tp,
           n_matched - tp AS fp,
           (SELECT n_truth FROM truth) - tp AS fn,
           tp * 10000 // n_matched AS precision_e4,
           tp * 10000 // (SELECT n_truth FROM truth) AS recall_e4,
           2 * tp * 10000 // (n_matched + (SELECT n_truth FROM truth)) AS f1_e4
    FROM agg
    """,
)
def er_linkage_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linkage scorecard: pairwise precision/recall/F1 against the
    planted same-part truth. Precision < 1 is genuine — distinct parts
    with identical name/brand/type and near-equal size/price are
    indistinguishable to any attribute matcher, and the count of such
    collisions is itself deterministic."""
    norm = dirty_records(spark, sf_dir).cache()
    # scored has exactly one row per candidate pair, so the candidate
    # count derives from the CACHED scored frame — the blocking
    # self-join runs once per entry, not twice. Cache only the two
    # columns this scorecard reads (r13): the full feature projection
    # (incl. the exact name_lev DP) is never consumed here, and the
    # narrow cache lets column pruning skip computing it.
    scored = scored_pairs(spark, sf_dir, norm=norm).select("score", "is_true").cache()
    m = scored.filter(F.col("score") >= MATCH_THRESHOLD)
    truth = (
        norm.groupBy("pk")
        .agg(F.count(F.lit(1)).alias("k"))
        .agg(F.sum(F.expr("k * (k - 1) DIV 2")).cast("long").alias("n_truth"))
    )
    agg = m.agg(
        F.count(F.lit(1)).cast("long").alias("n_matched"),
        F.sum("is_true").cast("long").alias("tp"),
    )
    return (
        agg.crossJoin(F.broadcast(truth))
        .crossJoin(F.broadcast(norm.agg(F.count(F.lit(1)).cast("long").alias("n_records"))))
        .crossJoin(
            F.broadcast(scored.agg(F.count(F.lit(1)).cast("long").alias("n_candidates")))
        )
        .select(
            "n_records",
            "n_candidates",
            "n_matched",
            "tp",
            (F.col("n_matched") - F.col("tp")).alias("fp"),
            (F.col("n_truth") - F.col("tp")).alias("fn"),
            F.expr("tp * 10000 DIV n_matched").alias("precision_e4"),
            F.expr("tp * 10000 DIV n_truth").alias("recall_e4"),
            F.expr("2 * tp * 10000 DIV (n_matched + n_truth)").alias("f1_e4"),
        )
    )


CC_ROUNDS = 3


@query(
    "er_golden_record",
    oracle=f"""
    -- clusters = connected components over matched pairs (3 unrolled
    -- min-label rounds — both engines run the SAME recurrence, so
    -- labels agree even pre-convergence); survivorship: longest name
    -- (tie lexicographic), min brand digits, min size, max cents
    WITH {_ER_CTE},
    m AS (SELECT rec_a, rec_b FROM scored WHERE score >= {MATCH_THRESHOLD}),
    adj AS (
      SELECT rec_a AS u, rec_b AS v FROM m
      UNION ALL SELECT rec_b, rec_a FROM m
      UNION ALL SELECT rec_id, rec_id FROM norm
    ),
    l0 AS (SELECT rec_id, rec_id AS lbl FROM norm),
    l1 AS (SELECT a.u AS rec_id, min(p.lbl) AS lbl FROM adj a JOIN l0 p ON a.v = p.rec_id GROUP BY 1),
    l2 AS (SELECT a.u AS rec_id, min(p.lbl) AS lbl FROM adj a JOIN l1 p ON a.v = p.rec_id GROUP BY 1),
    l3 AS (SELECT a.u AS rec_id, min(p.lbl) AS lbl FROM adj a JOIN l2 p ON a.v = p.rec_id GROUP BY 1)
    SELECT l.lbl AS cluster_id,
           CAST(count(*) AS BIGINT) AS n_members,
           CAST(count(DISTINCT substr(n.rec_id, 1, 1)) AS BIGINT) AS n_sources,
           min_by(n.nname, lpad(CAST(1000 - len(n.nname) AS VARCHAR), 4, '0') || n.nname) AS canonical_name,
           min(n.bdig) AS canonical_brand,
           CAST(min(n.psize) AS BIGINT) AS canonical_size,
           max(n.cents) AS canonical_cents
    FROM l3 l JOIN norm n ON l.rec_id = n.rec_id
    GROUP BY 1 ORDER BY 1
    """,
)
def er_golden_record(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Golden-record synthesis: cluster matched records by connected
    components (fixed {CC_ROUNDS} min-label-propagation rounds — ids-only
    shuffles, the dedup_cluster_resolution shape) and apply
    deterministic survivorship per cluster: longest name wins (most
    information), minimal brand digits, minimal size, maximal cents
    (conservative price). One golden row per physical product is the
    PIM's master output."""
    norm = dirty_records(spark, sf_dir).cache()
    # cache the matched edge list: the symmetric adjacency union below
    # reads it twice, and uncached each read re-runs the full blocking
    # + feature-scoring join
    m = (
        scored_pairs(spark, sf_dir, norm=norm)
        .filter(F.col("score") >= MATCH_THRESHOLD)
        .select("rec_a", "rec_b")
        .cache()
    )
    # ids-only label loop: pin a small co-partitioning on the join key
    # so each round reuses it instead of a 200-partition default
    # exchange per iteration (the naive-session stage-count killer);
    # width is conf-derived (floor = the bench-measured 8) so a
    # cluster session widens the loop instead of serializing it
    n_loop = loop_partitions(norm)
    adj = (
        m.select(F.col("rec_a").alias("u"), F.col("rec_b").alias("v"))
        .unionByName(m.select(F.col("rec_b").alias("u"), F.col("rec_a").alias("v")))
        .unionByName(norm.select(F.col("rec_id").alias("u"), F.col("rec_id").alias("v")))
        .repartition(n_loop, "v")
        .cache()
    )
    lbl = norm.select("rec_id", F.col("rec_id").alias("lbl"))
    for _ in range(CC_ROUNDS):
        # localCheckpoint truncates the per-round lineage: a lazily
        # cached/raw label DF re-runs the whole prefix every time a
        # consumer (or broadcast) pulls it (greedy_coverage lesson)
        lbl = (
            adj.join(lbl.withColumnRenamed("rec_id", "v").repartition(n_loop, "v"), "v")
            .groupBy(F.col("u").alias("rec_id"))
            .agg(F.min("lbl").alias("lbl"))
            .localCheckpoint(eager=False)
        )
    surv_key = F.concat(
        F.lpad((F.lit(1000) - F.length("nname")).cast("string"), 4, "0"), F.col("nname")
    )
    return (
        lbl.join(norm, "rec_id")
        .groupBy(F.col("lbl").alias("cluster_id"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_members"),
            F.countDistinct(F.substring("rec_id", 1, 1)).cast("long").alias("n_sources"),
            F.min_by("nname", surv_key).alias("canonical_name"),
            F.min("bdig").alias("canonical_brand"),
            F.min("psize").cast("long").alias("canonical_size"),
            F.max("cents").alias("canonical_cents"),
        )
        .transform(sorted_output, "cluster_id")
    )


def base_cluster_labels(norm: DataFrame, scored: DataFrame) -> DataFrame:
    """Golden-index cluster labels over the base (non-B) records:
    connected components via the fixed min-label rounds. Cached —
    this is the persisted index incremental/streaming admission links
    against."""
    a_is_b = F.substring("rec_a", 1, 1) == "B"
    b_is_b = F.substring("rec_b", 1, 1) == "B"
    bm = scored.filter(
        (F.col("score") >= MATCH_THRESHOLD) & ~a_is_b & ~b_is_b
    ).select("rec_a", "rec_b")
    bnodes = norm.filter(F.substring("rec_id", 1, 1) != "B").select("rec_id")
    n_loop = loop_partitions(norm)
    badj = (
        bm.select(F.col("rec_a").alias("u"), F.col("rec_b").alias("v"))
        .unionByName(bm.select(F.col("rec_b").alias("u"), F.col("rec_a").alias("v")))
        .unionByName(bnodes.select(F.col("rec_id").alias("u"), F.col("rec_id").alias("v")))
        .repartition(n_loop, "v")
        .cache()
    )
    lbl = bnodes.select("rec_id", F.col("rec_id").alias("lbl"))
    for _ in range(CC_ROUNDS):
        lbl = (
            badj.join(lbl.withColumnRenamed("rec_id", "v").repartition(n_loop, "v"), "v")
            .groupBy(F.col("u").alias("rec_id"))
            .agg(F.min("lbl").alias("lbl"))
            .localCheckpoint(eager=False)
        )
    return lbl


@query(
    "er_incremental_link",
    oracle=f"""
    -- steady-state MDM: the base golden index is built from sources
    -- A+C only; the B batch then links against it through the same
    -- blocking+scoring, argmax per incoming record (ties -> smaller
    -- cluster id), below-threshold records become new clusters.
    -- is_correct checks the assignment against the planted truth
    -- (the cluster holding the record's A twin).
    WITH {_ER_CTE},
    bm AS (
      SELECT rec_a, rec_b FROM scored
      WHERE score >= {MATCH_THRESHOLD}
        AND substr(rec_a, 1, 1) <> 'B' AND substr(rec_b, 1, 1) <> 'B'
    ),
    bnodes AS (SELECT rec_id FROM norm WHERE substr(rec_id, 1, 1) <> 'B'),
    badj AS (
      SELECT rec_a AS u, rec_b AS v FROM bm
      UNION ALL SELECT rec_b, rec_a FROM bm
      UNION ALL SELECT rec_id, rec_id FROM bnodes
    ),
    bl0 AS (SELECT rec_id, rec_id AS lbl FROM bnodes),
    bl1 AS (SELECT a.u AS rec_id, min(p.lbl) AS lbl FROM badj a JOIN bl0 p ON a.v = p.rec_id GROUP BY 1),
    bl2 AS (SELECT a.u AS rec_id, min(p.lbl) AS lbl FROM badj a JOIN bl1 p ON a.v = p.rec_id GROUP BY 1),
    bl3 AS (SELECT a.u AS rec_id, min(p.lbl) AS lbl FROM badj a JOIN bl2 p ON a.v = p.rec_id GROUP BY 1),
    il AS (
      SELECT CASE WHEN substr(rec_a, 1, 1) = 'B' THEN rec_a ELSE rec_b END AS rec_id,
             CASE WHEN substr(rec_a, 1, 1) = 'B' THEN rec_b ELSE rec_a END AS base_rec,
             score
      FROM scored
      WHERE (substr(rec_a, 1, 1) = 'B') <> (substr(rec_b, 1, 1) = 'B')
    ),
    linked AS (
      SELECT i.rec_id,
             max(i.score) AS best_score,
             min_by(l.lbl, lpad(CAST(100 - i.score AS VARCHAR), 3, '0') || l.lbl) AS best_cluster
      FROM il i JOIN bl3 l ON i.base_rec = l.rec_id
      GROUP BY 1
    ),
    truth AS (
      SELECT n.rec_id, l.lbl AS true_cluster
      FROM norm n JOIN bl3 l ON l.rec_id = 'A' || CAST(n.pk AS VARCHAR)
      WHERE substr(n.rec_id, 1, 1) = 'B'
    )
    SELECT t.rec_id,
           COALESCE(k.best_score, 0) AS best_score,
           CASE WHEN k.best_score >= {MATCH_THRESHOLD} THEN k.best_cluster END AS assigned_cluster,
           CASE WHEN k.best_score >= {MATCH_THRESHOLD} THEN 0 ELSE 1 END AS is_new,
           CASE WHEN k.best_score >= {MATCH_THRESHOLD} AND k.best_cluster = t.true_cluster
                THEN 1 ELSE 0 END AS is_correct
    FROM truth t LEFT JOIN linked k ON t.rec_id = k.rec_id
    ORDER BY t.rec_id
    """,
)
def er_incremental_link(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental entity linking — the MDM steady state: the golden
    index exists (built here from sources A+C), and each incoming
    batch (source B) links against it WITHOUT re-clustering the world.
    Cost is O(batch × block density): the incoming records block
    against the index, score map-side, and take a per-record argmax
    (ties break to the smaller cluster id) — the exact shape of the
    streaming near-dup admission gate (streaming/queries.py), applied
    to record linkage. Below-threshold records open new clusters.

    The planted truth (each B record's A twin) grades every
    assignment, so linking accuracy is part of the gated output."""
    norm = dirty_records(spark, sf_dir).cache()
    is_b = F.substring("rec_id", 1, 1) == "B"
    a_is_b = F.substring("rec_a", 1, 1) == "B"
    b_is_b = F.substring("rec_b", 1, 1) == "B"
    # this linker reads base–base pairs (index build) and one-B pairs
    # (incoming links) — B–B pairs are never consumed, so skip their
    # feature evaluation entirely (output-identical prune). Cache only
    # the (ids, score) projection: the linker never reads the feature
    # columns, and a narrow cache materializes ~60% less (measured
    # 3.37 s → 3.04 s at sf0.1).
    scored = (
        scored_pairs(spark, sf_dir, norm=norm, cand_filter=~(a_is_b & b_is_b))
        .select("rec_a", "rec_b", "score")
        .cache()
    )
    lbl = base_cluster_labels(norm, scored)
    il = scored.filter(a_is_b != b_is_b).select(
        F.when(a_is_b, F.col("rec_a")).otherwise(F.col("rec_b")).alias("rec_id"),
        F.when(a_is_b, F.col("rec_b")).otherwise(F.col("rec_a")).alias("base_rec"),
        "score",
    )
    tie_key = F.concat(
        F.lpad((F.lit(100) - F.col("score")).cast("string"), 3, "0"), F.col("lbl")
    )
    linked = (
        il.join(lbl.withColumnRenamed("rec_id", "base_rec"), "base_rec")
        .groupBy("rec_id")
        .agg(
            F.max("score").alias("best_score"),
            F.min_by("lbl", tie_key).alias("best_cluster"),
        )
    )
    truth = (
        norm.filter(is_b)
        .select("rec_id", F.concat(F.lit("A"), F.col("pk").cast("string")).alias("a_twin"))
        .join(
            lbl.select(F.col("rec_id").alias("a_twin"), F.col("lbl").alias("true_cluster")),
            "a_twin",
        )
        .select("rec_id", "true_cluster")
    )
    matched = F.col("best_score") >= MATCH_THRESHOLD
    return (
        truth.join(linked, "rec_id", "left")
        .select(
            "rec_id",
            F.coalesce(F.col("best_score"), F.lit(0)).alias("best_score"),
            F.when(matched, F.col("best_cluster")).alias("assigned_cluster"),
            F.when(matched, F.lit(0)).otherwise(F.lit(1)).cast("int").alias("is_new"),
            F.when(matched & (F.col("best_cluster") == F.col("true_cluster")), 1)
            .otherwise(0)
            .cast("int")
            .alias("is_correct"),
        )
        .transform(sorted_output, "rec_id")
    )
