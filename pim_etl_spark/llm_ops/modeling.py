"""In-engine model training & evaluation (the quality-filter loop).

Large-scale corpus curation trains lightweight classifiers (fastText /
logistic quality filters) over document features and sweeps their
thresholds — the model-fitting step usually leaves the engine and with
it the determinism and the audit trail. Here the whole loop runs as
DataFrame plans: full-batch gradient-descent logistic regression where
each iteration is ONE map-side partial aggregate (d+1 bigint sums)
plus a broadcast of the d+1 updated weights — the classic
``treeAggregate`` LR shape (public analogue: Spark MLlib's
LogisticRegressionWithSGD aggregates gradients the same way), but
expressed declaratively so Catalyst fuses the feature projection into
the scan.

Cross-engine exactness: the sigmoid is replaced by the soft-sign
logistic p(z) = ((1+|z|)+z) / (2(1+|z|)) — built only from
+,-,*,/,|·| so both engines compute bit-identical values in scaled
BIGINT arithmetic (NOTES rule: no transcendentals cross the oracle
boundary); gradients are exact integer sums, so the trained weights
are identical under ANY partitioning — reproducible training at 1000
executors, not just locally. Signed integer division truncates toward
zero in BOTH engines (verified: -7 div 2 = -3 in Spark and DuckDB).

Evaluation is the exact rank-sum AUC (Mann-Whitney U with midrank tie
handling — ties are heavy for small integer scores, which is exactly
when naive rank AUC goes wrong) and an integer confusion-matrix
threshold sweep.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pim_etl_spark.catalog import query
from pim_etl_spark.sources import load_table

# Binary indicator features over the token stream: cheap, scale-free
# (no per-feature learning-rate tuning), and genuinely predictive of
# the long-document label. x0 is the bias.
_FEAT_SQL = """
    feats AS (
      SELECT doc_id,
             CASE WHEN n_chars >= 300 THEN 1 ELSE 0 END AS y,
             1 AS x0,
             CASE WHEN len(t) >= 40 THEN 1 ELSE 0 END AS x1,
             CASE WHEN len(list_filter(t, w -> len(w) >= 6)) >= 8 THEN 1 ELSE 0 END AS x2,
             CASE WHEN len(list_distinct(t)) >= 30 THEN 1 ELSE 0 END AS x3
      FROM (
        SELECT doc_id, n_chars,
               string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS t
        FROM documents
      )
    )
"""

# One GD iteration in scaled-integer SQL, parameterized on the CTE
# names. p_e6 = ((1e6+|z|)+z) * 500000 // (1e6+|z|)  (numerator and
# denominator both strictly positive -> floor == truncate).
_ITER_SQL = """
    {g} AS (
      SELECT CAST(sum((p_e6 - y * 1000000) * x0) AS BIGINT) AS g0,
             CAST(sum((p_e6 - y * 1000000) * x1) AS BIGINT) AS g1,
             CAST(sum((p_e6 - y * 1000000) * x2) AS BIGINT) AS g2,
             CAST(sum((p_e6 - y * 1000000) * x3) AS BIGINT) AS g3,
             CAST(sum(abs(p_e6 - y * 1000000)) AS BIGINT) AS sae_e6,
             CAST(count(*) AS BIGINT) AS n
      FROM (
        SELECT f.*,
               (1000000 + abs(z_e6) + z_e6) * 500000 // (1000000 + abs(z_e6)) AS p_e6
        FROM (
          SELECT f.*, w.w0_e6 * x0 + w.w1_e6 * x1 + w.w2_e6 * x2 + w.w3_e6 * x3 AS z_e6
          FROM feats f CROSS JOIN {w} w
        ) f
      )
    ),
    {wn} AS (
      SELECT (SELECT w0_e6 FROM {w}) - g0 // (2 * n) AS w0_e6,
             (SELECT w1_e6 FROM {w}) - g1 // (2 * n) AS w1_e6,
             (SELECT w2_e6 FROM {w}) - g2 // (2 * n) AS w2_e6,
             (SELECT w3_e6 FROM {w}) - g3 // (2 * n) AS w3_e6,
             sae_e6, n
      FROM {g}
    )
"""

GD_ITERS = 3


def doc_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, y, x0..x3) — label + binary indicator features."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.regexp_replace(F.lower("text"), r"\s+", " ")), " ")
    return docs.select(
        "doc_id",
        (F.col("n_chars") >= 300).cast("int").alias("y"),
        F.lit(1).alias("x0"),
        (F.size(toks) >= 40).cast("int").alias("x1"),
        (F.size(F.filter(toks, lambda w: F.length(w) >= 6)) >= 8).cast("int").alias("x2"),
        (F.size(F.array_distinct(toks)) >= 30).cast("int").alias("x3"),
    )


def _gd_cte() -> str:
    """The WITH chain w0 -> w{GD_ITERS} shared by the training entry
    and the model-based filter entry."""
    cte = "WITH " + _FEAT_SQL + ",\n    w0 AS (SELECT CAST(0 AS BIGINT) AS w0_e6, CAST(0 AS BIGINT) AS w1_e6, CAST(0 AS BIGINT) AS w2_e6, CAST(0 AS BIGINT) AS w3_e6)"
    for i in range(GD_ITERS):
        cte += ",\n" + _ITER_SQL.format(g=f"g{i}", w=f"w{i}", wn=f"w{i + 1}")
    return cte


def _gd_oracle() -> str:
    rows = [
        f"SELECT {i + 1} AS iter, w0_e6, w1_e6, w2_e6, w3_e6, sae_e6, n FROM w{i + 1}"
        for i in range(GD_ITERS)
    ]
    return _gd_cte() + "\n" + "\nUNION ALL\n".join(rows) + "\nORDER BY iter"


@query("logreg_gd_quality", oracle=_gd_oracle())
def logreg_gd_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-batch GD logistic regression over document features, 3
    iterations, every arithmetic step exact scaled-integer. Per
    iteration the engine runs ONE partial aggregate producing 6 bigint
    sums; the 1-row weight table broadcasts back onto the feature scan
    (crossJoin(broadcast)) — no collect anywhere, the optimizer sees
    the whole unrolled training loop as a single plan. Output: the
    weight vector after each iteration plus the sum of absolute
    residuals BEFORE the update (the training curve — strictly
    decreasing here, which the oracle pins exactly).

    100 TB shape: gradient traffic is d+1 longs per partition per
    iteration; the feature projection stays fused into the scan, so an
    iteration costs one pass over the corpus with a 6-value exchange.
    """
    feats = doc_features(spark, sf_dir).cache()
    out, _ = _train(feats)
    res = out[0]
    for o in out[1:]:
        res = res.unionByName(o)
    return res.orderBy("iter")


def _train(feats: DataFrame):
    """Run the unrolled GD loop; returns (per-iteration report DFs,
    final 1-row weight DF). Shared by the training entry and the
    model-based corpus filter."""
    weights = None
    out = []
    for i in range(GD_ITERS):
        if weights is None:
            z = F.lit(0).cast("long")
            base = feats
        else:
            base = feats.crossJoin(F.broadcast(weights))
            z = (
                F.col("w0_e6") * F.col("x0")
                + F.col("w1_e6") * F.col("x1")
                + F.col("w2_e6") * F.col("x2")
                + F.col("w3_e6") * F.col("x3")
            )
        p = F.expr(
            "(1000000 + abs(z_e6) + z_e6) * 500000 DIV (1000000 + abs(z_e6))"
        )
        resid = F.col("p_e6") - F.col("y") * 1000000
        g = (
            base.withColumn("z_e6", z)
            .withColumn("p_e6", p)
            .agg(
                F.sum(resid * F.col("x0")).cast("long").alias("g0"),
                F.sum(resid * F.col("x1")).cast("long").alias("g1"),
                F.sum(resid * F.col("x2")).cast("long").alias("g2"),
                F.sum(resid * F.col("x3")).cast("long").alias("g3"),
                F.sum(F.abs(resid)).cast("long").alias("sae_e6"),
                F.count(F.lit(1)).cast("long").alias("n"),
            )
        )
        if weights is None:
            upd = g.select(
                F.expr("0 - g0 DIV (2 * n)").alias("w0_e6"),
                F.expr("0 - g1 DIV (2 * n)").alias("w1_e6"),
                F.expr("0 - g2 DIV (2 * n)").alias("w2_e6"),
                F.expr("0 - g3 DIV (2 * n)").alias("w3_e6"),
                "sae_e6",
                "n",
            )
        else:
            upd = g.crossJoin(
                F.broadcast(
                    weights.select(
                        F.col("w0_e6").alias("pw0"),
                        F.col("w1_e6").alias("pw1"),
                        F.col("w2_e6").alias("pw2"),
                        F.col("w3_e6").alias("pw3"),
                    )
                )
            ).select(
                F.expr("pw0 - g0 DIV (2 * n)").alias("w0_e6"),
                F.expr("pw1 - g1 DIV (2 * n)").alias("w1_e6"),
                F.expr("pw2 - g2 DIV (2 * n)").alias("w2_e6"),
                F.expr("pw3 - g3 DIV (2 * n)").alias("w3_e6"),
                "sae_e6",
                "n",
            )
        weights = upd.select("w0_e6", "w1_e6", "w2_e6", "w3_e6").cache()
        out.append(
            upd.select(
                F.lit(i + 1).cast("int").alias("iter"),
                "w0_e6",
                "w1_e6",
                "w2_e6",
                "w3_e6",
                "sae_e6",
                "n",
            )
        )
    return out, weights


@query(
    "model_auc_ranksum",
    oracle=f"""
    -- exact Mann-Whitney AUC with midrank tie handling over a small
    -- integer score (ties are the norm, so the midrank correction is
    -- the whole point). 2*midrank of every row at score s =
    -- 2*(#rows below s) + (#rows at s) + 1; summed over positives
    -- gives 2*R+; auc_e6 = (2R+ - npos(npos+1)) * 500000 // (npos*nneg)
    WITH {_FEAT_SQL},
    s AS (SELECT y, 2 * x1 + x2 + x3 AS score FROM feats),
    grp AS (
      SELECT score, CAST(count(*) AS BIGINT) AS c, CAST(sum(y) AS BIGINT) AS pos_c
      FROM s GROUP BY score
    ),
    cum AS (
      SELECT score, c, pos_c,
             COALESCE(sum(c) OVER (ORDER BY score
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS below
      FROM grp
    ),
    agg AS (
      SELECT CAST(sum(pos_c * (2 * below + c + 1)) AS BIGINT) AS two_r,
             (SELECT CAST(sum(y) AS BIGINT) FROM s) AS npos,
             (SELECT CAST(count(*) - sum(y) AS BIGINT) FROM s) AS nneg
      FROM cum
    )
    SELECT npos, nneg,
           (two_r - npos * (npos + 1)) * 500000 // (npos * nneg) AS auc_e6
    FROM agg
    """,
)
def model_auc_ranksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact AUC of a fixed linear scorer via the rank-sum identity:
    AUC = (R+ − npos(npos+1)/2) / (npos·nneg) with midranks for ties.
    Computed from the per-score-GROUP rollup (score cardinality, not
    row cardinality, crosses the shuffle — the score takes 5 values
    here, so the window runs over 5 rows regardless of corpus size).
    Everything stays ×2-scaled integer until the single final floor
    division."""
    from pyspark.sql import Window

    feats = doc_features(spark, sf_dir)
    s = feats.select("y", (2 * F.col("x1") + F.col("x2") + F.col("x3")).alias("score"))
    grp = s.groupBy("score").agg(
        F.count(F.lit(1)).cast("long").alias("c"),
        F.sum("y").cast("long").alias("pos_c"),
    )
    below = F.coalesce(
        F.sum("c").over(
            Window.orderBy("score").rowsBetween(Window.unboundedPreceding, -1)
        ),
        F.lit(0),
    )
    cum = grp.withColumn("below", below)
    totals = s.agg(
        F.sum("y").cast("long").alias("npos"),
        (F.count(F.lit(1)) - F.sum("y")).cast("long").alias("nneg"),
    )
    return (
        cum.agg(F.sum(F.col("pos_c") * (2 * F.col("below") + F.col("c") + 1)).cast("long").alias("two_r"))
        .crossJoin(F.broadcast(totals))
        .select(
            "npos",
            "nneg",
            F.expr("(two_r - npos * (npos + 1)) * 500000 DIV (npos * nneg)").alias("auc_e6"),
        )
    )


@query(
    "confusion_threshold_sweep",
    oracle=f"""
    -- integer confusion matrix + P/R/F1 at every operating point of
    -- the 0..4 score (predict positive when score >= t)
    WITH {_FEAT_SQL},
    s AS (SELECT y, 2 * x1 + x2 + x3 AS score FROM feats),
    t AS (SELECT unnest([1, 2, 3, 4]) AS thr)
    SELECT thr,
           CAST(sum(CASE WHEN score >= thr AND y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
           CAST(sum(CASE WHEN score >= thr AND y = 0 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
           CAST(sum(CASE WHEN score < thr AND y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS fn,
           CAST(sum(CASE WHEN score < thr AND y = 0 THEN 1 ELSE 0 END) AS BIGINT) AS tn,
           CAST(sum(CASE WHEN score >= thr AND y = 1 THEN 1 ELSE 0 END) * 10000
                // greatest(sum(CASE WHEN score >= thr THEN 1 ELSE 0 END), 1) AS BIGINT) AS precision_e4,
           CAST(sum(CASE WHEN score >= thr AND y = 1 THEN 1 ELSE 0 END) * 10000
                // greatest(sum(y), 1) AS BIGINT) AS recall_e4,
           CAST(2 * sum(CASE WHEN score >= thr AND y = 1 THEN 1 ELSE 0 END) * 10000
                // greatest(sum(CASE WHEN score >= thr THEN 1 ELSE 0 END) + sum(y), 1) AS BIGINT) AS f1_e4
    FROM s CROSS JOIN t
    GROUP BY thr ORDER BY thr
    """,
)
def confusion_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Operating-point sweep: confusion matrix and floor-scaled
    precision/recall/F1 at each threshold of the integer score. The
    4-row threshold spine cross-joins onto the per-doc score (tiny
    side broadcast) and everything reduces in one partial aggregate —
    the whole sweep is a single pass however many thresholds."""
    feats = doc_features(spark, sf_dir)
    s = feats.select("y", (2 * F.col("x1") + F.col("x2") + F.col("x3")).alias("score"))
    thr = spark.range(1, 5).select(F.col("id").cast("int").alias("thr"))
    pred_pos = F.col("score") >= F.col("thr")
    return (
        s.crossJoin(F.broadcast(thr))
        .groupBy("thr")
        .agg(
            F.sum(F.when(pred_pos & (F.col("y") == 1), 1).otherwise(0)).cast("long").alias("tp"),
            F.sum(F.when(pred_pos & (F.col("y") == 0), 1).otherwise(0)).cast("long").alias("fp"),
            F.sum(F.when(~pred_pos & (F.col("y") == 1), 1).otherwise(0)).cast("long").alias("fn"),
            F.sum(F.when(~pred_pos & (F.col("y") == 0), 1).otherwise(0)).cast("long").alias("tn"),
        )
        .select(
            "thr",
            "tp",
            "fp",
            "fn",
            "tn",
            F.expr("tp * 10000 DIV greatest(tp + fp, 1)").alias("precision_e4"),
            F.expr("tp * 10000 DIV greatest(tp + fn, 1)").alias("recall_e4"),
            F.expr("2 * tp * 10000 DIV greatest(tp + fp + tp + fn, 1)").alias("f1_e4"),
        )
        .orderBy("thr")
    )


@query(
    "model_quality_filter",
    oracle=_gd_cte()
    + f"""
    -- train (the w{GD_ITERS} weights above) then SERVE in the same plan:
    -- a doc is kept iff its final-model score z >= 0 (p >= 1/2 exactly
    -- — the soft-sign logistic crosses 1/2 at z = 0, so no p division
    -- is needed at serve time). Per-lang acceptance report.
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN z_e6 >= 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           CAST(sum(CASE WHEN z_e6 >= 0 THEN 1 ELSE 0 END) * 10000 // count(*) AS BIGINT)
             AS kept_share_e4,
           CAST(sum(CASE WHEN (z_e6 >= 0) = (y = 1) THEN 1 ELSE 0 END) * 10000 // count(*) AS BIGINT)
             AS agree_label_e4
    FROM (
      SELECT d.lang, f.y,
             w.w0_e6 * f.x0 + w.w1_e6 * f.x1 + w.w2_e6 * f.x2 + w.w3_e6 * f.x3 AS z_e6
      FROM feats f JOIN documents d USING (doc_id)
      CROSS JOIN w{GD_ITERS} w
    )
    GROUP BY lang ORDER BY lang
    """,
)
def model_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-based corpus filtering — train THEN serve inside one
    logical plan: the {GD_ITERS}-iteration GD weights feed a map-side
    scoring pass over the whole corpus (the fastText-quality-filter
    deployment pattern), keeping docs whose final score z >= 0 (the
    soft-sign logistic crosses 1/2 exactly at z = 0, so serving needs
    no division at all). The gated report is the per-language
    acceptance table a curation run reviews before committing the
    filter: volume, kept share, and agreement with the training label.
    Scale shape: training cost is {GD_ITERS} corpus passes with
    6-long exchanges; serving is one more pass with the 1-row weight
    table broadcast — nothing new shuffles."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    feats = doc_features(spark, sf_dir).cache()
    _, weights = _train(feats)
    z = (
        F.col("w0_e6") * F.col("x0")
        + F.col("w1_e6") * F.col("x1")
        + F.col("w2_e6") * F.col("x2")
        + F.col("w3_e6") * F.col("x3")
    )
    kept = (z >= 0).cast("int")
    agree = (kept == F.col("y")).cast("int")
    return (
        feats.join(docs, "doc_id")
        .crossJoin(F.broadcast(weights))
        .select("lang", kept.alias("kept"), agree.alias("agree"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("kept").cast("long").alias("n_kept"),
            F.expr("sum(kept) * 10000 DIV count(*)").cast("long").alias("kept_share_e4"),
            F.expr("sum(agree) * 10000 DIV count(*)").cast("long").alias("agree_label_e4"),
        )
        .orderBy("lang")
    )


@query(
    "model_calibration_bins",
    oracle=_gd_cte()
    + f"""
    -- reliability diagram of the trained model: predictions bucketed
    -- by p_e6 into 5 fixed bins, exact mean label (floor e4) per bin —
    -- a calibrated model's label_rate tracks its p band
    SELECT p_e6 * 5 // 1000001 AS bin,
           CAST(count(*) AS BIGINT) AS n,
           CAST(min(p_e6) AS BIGINT) AS p_min_e6,
           CAST(max(p_e6) AS BIGINT) AS p_max_e6,
           CAST(sum(y) * 10000 // count(*) AS BIGINT) AS label_rate_e4
    FROM (
      SELECT f.y,
             (1000000 + abs(z_e6) + z_e6) * 500000 // (1000000 + abs(z_e6)) AS p_e6
      FROM (
        SELECT f.y, w.w0_e6 * f.x0 + w.w1_e6 * f.x1 + w.w2_e6 * f.x2 + w.w3_e6 * f.x3 AS z_e6
        FROM feats f CROSS JOIN w{GD_ITERS} w
      ) f
    )
    GROUP BY 1 ORDER BY 1
    """,
)
def model_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calibration audit (reliability diagram) of the trained
    classifier: scored probabilities bucket into 5 fixed bands and
    each band reports its exact observed label rate — the
    trust-the-scores check every model-based filter needs before its
    threshold means anything. All integer arithmetic; the bin id is a
    single floor division of p_e6. One corpus pass after training, one
    5-row aggregate."""
    feats = doc_features(spark, sf_dir).cache()
    _, weights = _train(feats)
    z = (
        F.col("w0_e6") * F.col("x0")
        + F.col("w1_e6") * F.col("x1")
        + F.col("w2_e6") * F.col("x2")
        + F.col("w3_e6") * F.col("x3")
    )
    scored = (
        feats.crossJoin(F.broadcast(weights))
        .withColumn("z_e6", z)
        .withColumn(
            "p_e6",
            F.expr("(1000000 + abs(z_e6) + z_e6) * 500000 DIV (1000000 + abs(z_e6))"),
        )
    )
    return (
        scored.groupBy(F.expr("p_e6 * 5 DIV 1000001").alias("bin"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.min("p_e6").cast("long").alias("p_min_e6"),
            F.max("p_e6").cast("long").alias("p_max_e6"),
            F.expr("sum(y) * 10000 DIV count(*)").cast("long").alias("label_rate_e4"),
        )
        .orderBy("bin")
    )


@query(
    "ks_separation_statistic",
    oracle=f"""
    -- exact Kolmogorov-Smirnov separation of the score distributions
    -- (positives vs negatives): at every distinct score threshold the
    -- CDF gap |F_pos - F_neg| compares via integer cross-
    -- multiplication |cum_pos*nneg - cum_neg*npos| — no division
    -- until the final floor-scale of the maximum
    WITH {_FEAT_SQL},
    s AS (SELECT y, 2 * x1 + x2 + x3 AS score FROM feats),
    tot AS (SELECT CAST(sum(y) AS BIGINT) AS npos,
                   CAST(count(*) - sum(y) AS BIGINT) AS nneg FROM s),
    grp AS (
      SELECT score,
             CAST(sum(y) AS BIGINT) AS pos_c,
             CAST(count(*) - sum(y) AS BIGINT) AS neg_c
      FROM s GROUP BY 1
    ),
    cum AS (
      SELECT score,
             CAST(sum(pos_c) OVER (ORDER BY score) AS BIGINT) AS cum_pos,
             CAST(sum(neg_c) OVER (ORDER BY score) AS BIGINT) AS cum_neg
      FROM grp
    ),
    gaps AS (
      SELECT score, abs(cum_pos * (SELECT nneg FROM tot) - cum_neg * (SELECT npos FROM tot)) AS gap_x
      FROM cum
    )
    SELECT (SELECT npos FROM tot) AS npos,
           (SELECT nneg FROM tot) AS nneg,
           (SELECT CAST(min(score) AS BIGINT) FROM gaps
             WHERE gap_x = (SELECT max(gap_x) FROM gaps)) AS ks_at_score,
           CAST((SELECT max(gap_x) FROM gaps) * 1000000
                // ((SELECT npos FROM tot) * (SELECT nneg FROM tot)) AS BIGINT) AS ks_e6
    """,
)
def ks_separation_statistic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Kolmogorov-Smirnov statistic between the positive- and
    negative-class score distributions — the class-separation summary
    alongside AUC (KS reads the single best operating point, AUC the
    whole curve). Gaps stay cross-multiplied integers; the one
    division floor-scales the final maximum. Like the AUC entry, the
    window runs over the per-SCORE rollup (5 rows), so cost is one
    partial aggregate regardless of corpus size."""
    from pyspark.sql import Window

    feats = doc_features(spark, sf_dir)
    s = feats.select("y", (2 * F.col("x1") + F.col("x2") + F.col("x3")).alias("score"))
    tot = s.agg(
        F.sum("y").cast("long").alias("npos"),
        (F.count(F.lit(1)) - F.sum("y")).cast("long").alias("nneg"),
    )
    grp = s.groupBy("score").agg(
        F.sum("y").cast("long").alias("pos_c"),
        (F.count(F.lit(1)) - F.sum("y")).cast("long").alias("neg_c"),
    )
    w = Window.orderBy("score").rowsBetween(Window.unboundedPreceding, 0)
    cum = grp.select(
        "score",
        F.sum("pos_c").over(w).cast("long").alias("cum_pos"),
        F.sum("neg_c").over(w).cast("long").alias("cum_neg"),
    )
    gaps = (
        cum.crossJoin(F.broadcast(tot))
        .select(
            "score",
            "npos",
            "nneg",
            F.abs(F.col("cum_pos") * F.col("nneg") - F.col("cum_neg") * F.col("npos")).alias("gap_x"),
        )
        .cache()
    )
    mx = gaps.agg(F.max("gap_x").alias("max_gap"))
    return (
        gaps.crossJoin(F.broadcast(mx))
        .filter(F.col("gap_x") == F.col("max_gap"))
        .groupBy("npos", "nneg", "max_gap")
        .agg(F.min("score").cast("long").alias("ks_at_score"))
        .select(
            "npos",
            "nneg",
            "ks_at_score",
            F.expr("max_gap * 1000000 DIV (npos * nneg)").cast("long").alias("ks_e6"),
        )
    )


@query(
    "model_gains_table",
    oracle=_gd_cte()
    + f"""
    -- cumulative gains / lift by score decile: rank the corpus by the
    -- trained model's score (total order: p desc, doc_id asc),
    -- ntile(10), per decile the positives captured and the cumulative
    -- capture share — the targeting-efficiency table
    , scored AS (
      SELECT f.doc_id, f.y,
             (1000000 + abs(z_e6) + z_e6) * 500000 // (1000000 + abs(z_e6)) AS p_e6
      FROM (
        SELECT f.doc_id, f.y,
               w.w0_e6 * f.x0 + w.w1_e6 * f.x1 + w.w2_e6 * f.x2 + w.w3_e6 * f.x3 AS z_e6
        FROM feats f CROSS JOIN w{GD_ITERS} w
      ) f
    ),
    dec AS (
      SELECT y, ntile(10) OVER (ORDER BY p_e6 DESC, doc_id ASC) AS decile
      FROM scored
    ),
    per AS (
      SELECT decile, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(y) AS BIGINT) AS n_pos
      FROM dec GROUP BY 1
    )
    SELECT decile, n, n_pos,
           CAST(sum(n_pos) OVER (ORDER BY decile) AS BIGINT) AS cum_pos,
           CAST(sum(n_pos) OVER (ORDER BY decile) * 10000
                // (SELECT sum(y) FROM scored) AS BIGINT) AS cum_capture_e4
    FROM per ORDER BY decile
    """,
)
def model_gains_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative gains table (lift chart): corpus ranked by the
    trained model's score into deciles (total order — ties broken by
    doc_id, so ntile agrees cross-engine), per decile the captured
    positives and the cumulative capture share. A top-decile
    capture ≫ 10% is the model earning its keep for
    prioritized processing; the table is the budget-vs-recall dial of
    a model-routed curation pipeline. The ntile windows over scored
    doc rows once; everything after is decile-sized."""
    from pyspark.sql import Window

    feats = doc_features(spark, sf_dir).cache()
    _, weights = _train(feats)
    z = (
        F.col("w0_e6") * F.col("x0")
        + F.col("w1_e6") * F.col("x1")
        + F.col("w2_e6") * F.col("x2")
        + F.col("w3_e6") * F.col("x3")
    )
    scored = (
        feats.crossJoin(F.broadcast(weights))
        .withColumn("z_e6", z)
        .withColumn(
            "p_e6",
            F.expr("(1000000 + abs(z_e6) + z_e6) * 500000 DIV (1000000 + abs(z_e6))"),
        )
        .cache()
    )
    dec = scored.withColumn(
        "decile", F.ntile(10).over(Window.orderBy(F.desc("p_e6"), F.asc("doc_id")))
    )
    per = dec.groupBy("decile").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("y").cast("long").alias("n_pos"),
    )
    total = scored.agg(F.sum("y").cast("long").alias("total_pos"))
    cum = F.sum("n_pos").over(
        Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    ).cast("long")
    return (
        per.crossJoin(F.broadcast(total))
        .withColumn("cum_pos", cum)
        .select(
            "decile",
            "n",
            "n_pos",
            "cum_pos",
            F.expr("cum_pos * 10000 DIV total_pos").alias("cum_capture_e4"),
        )
        .orderBy("decile")
    )
