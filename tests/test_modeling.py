"""Model-training/eval suite: semantic pins beyond oracle parity."""

from __future__ import annotations

import pyspark.sql.functions as F

from pim_etl_spark.llm_ops.modeling import (
    doc_features,
    logreg_gd_quality,
    model_auc_ranksum,
    confusion_threshold_sweep,
)


def test_gd_training_curve_decreases(spark, sf_dir):
    """Full-batch GD on a separable-ish label must reduce the sum of
    absolute residuals every iteration — the training-curve invariant
    the oracle also hashes, pinned here as an inequality so a future
    feature/label edit can't silently break learning."""
    rows = logreg_gd_quality(spark, sf_dir).collect()
    assert [r.iter for r in rows] == [1, 2, 3]
    saes = [r.sae_e6 for r in rows]
    assert saes[0] > saes[1] > saes[2]
    # the indicator features positively predict the label
    assert rows[-1].w1_e6 > 0 and rows[-1].w2_e6 > 0


def test_gd_weights_partitioning_invariant(spark, sf_dir):
    """Exact-integer gradients make training reproducible under any
    partitioning: a repartitioned feature table trains to the SAME
    weights bit for bit."""
    base = logreg_gd_quality(spark, sf_dir).collect()
    feats = doc_features(spark, sf_dir).repartition(17)
    # re-run one aggregate step manually on the skewed layout
    g = feats.agg(
        F.sum((F.lit(500000) - F.col("y") * 1000000) * F.col("x1")).cast("long").alias("g1")
    ).collect()[0]
    # iteration 1 starts at w=0 -> p = 0.5 exactly; w1 after update:
    n = feats.count()
    w1_iter1 = 0 - int(g.g1) // (2 * n) if g.g1 >= 0 else 0 - -((-int(g.g1)) // (2 * n))
    assert base[0].w1_e6 == w1_iter1


def test_auc_bounds_and_signal(spark, sf_dir):
    row = model_auc_ranksum(spark, sf_dir).collect()[0]
    assert 0 <= row.auc_e6 <= 1000000
    # the indicator score genuinely ranks long docs above short ones
    assert row.auc_e6 > 800000
    assert row.npos > 0 and row.nneg > 0


def test_sweep_monotonicity(spark, sf_dir):
    """Raising the threshold can only shrink the predicted-positive
    set: tp and fp are non-increasing in the threshold, tp+fn is the
    constant positive count."""
    rows = confusion_threshold_sweep(spark, sf_dir).collect()
    for a, b in zip(rows, rows[1:]):
        assert a.tp >= b.tp and a.fp >= b.fp
        assert a.tp + a.fn == b.tp + b.fn
