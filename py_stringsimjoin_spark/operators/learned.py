"""Learned pairwise matcher on top of ``featurize_pairs`` (pyspark.ml).

Completes the Magellan-style ML loop the reference ecosystem runs
downstream of its joins (py_stringsimjoin feeds py_entitymatching's
ML-matcher step; /root/reference has no learner itself): candidate pairs
→ feature vectors (:func:`..operators.matcher.featurize_pairs`) → a
distributed logistic-regression matcher → match probabilities, which feed
the same thresholds / clerical-review bands / connected-components
clustering as the rule-based and Fellegi–Sunter scorers.

Design decisions:

* **Missingness is a signal, not a zero.** ``featurize_pairs`` emits NULL
  where an attr was missing; here every feature gets a paired
  ``<name>__missing`` indicator column and NULLs are then filled with 0.0
  — the model learns the missing-data effect instead of conflating it
  with "similarity 0".
* **Spark-native training.** ``pyspark.ml`` LogisticRegression trains
  distributed (L-BFGS over partitioned gradients) — no driver-side
  sklearn fit, no collect of the feature table; scoring is one JVM
  ``transform``.
* Not SQL-expressible (iterative optimization), so this operator is
  validated by pytest (separable synthetic truth → F1 ≈ 1.0, probability
  calibration ordering) rather than a driver DuckDB oracle — the one
  operator class the driver contract exempts.

Scale shape: training cost is per-iteration one pass over the (already
blocked) candidate features; scoring is a map-only transform. Both
inherit the candset's partitioning; nothing is collected.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..plans.validation import validate_attr


def _assemble(df: DataFrame, feature_cols: list[str]):
    from pyspark.ml.feature import VectorAssembler

    # originals stay untouched (a NULL feature must stay NULL in the
    # output); the assembler reads shadow columns: 0-filled value + a
    # missing indicator per feature
    cols = []
    work = df
    for c in feature_cols:
        validate_attr(df, c, "features input")
        work = work.withColumn(
            f"__fm_{c}", F.col(c).isNull().cast("double")
        ).withColumn(f"__fv_{c}", F.coalesce(F.col(c), F.lit(0.0)))
        cols += [f"__fv_{c}", f"__fm_{c}"]
    asm = VectorAssembler(inputCols=cols, outputCol="__features")
    return asm.transform(work), cols


def train_matcher(
    labeled_features: DataFrame,
    feature_cols: list[str],
    label_col: str,
    max_iter: int = 64,
    reg_param: float = 0.0,
):
    """Fit a logistic-regression matcher on a labeled feature table.

    ``labeled_features`` is ``featurize_pairs`` output joined to labels
    (``label_col`` ∈ {0, 1} — clerical review / gold pairs). Returns the
    fitted ``pyspark.ml`` model; pass it to :func:`score_matches`.
    """
    from pyspark.ml.classification import LogisticRegression

    validate_attr(labeled_features, label_col, "labels")
    assembled, _ = _assemble(labeled_features, feature_cols)
    lr = LogisticRegression(
        featuresCol="__features",
        labelCol=label_col,
        maxIter=int(max_iter),
        regParam=float(reg_param),
    )
    return lr.fit(assembled)


def score_matches(
    model,
    features: DataFrame,
    feature_cols: list[str],
) -> DataFrame:
    """Match probability per candidate pair from a trained matcher.

    Returns the input columns + ``match_prob`` (P(match) as double).
    Map-only: one JVM transform, no shuffle, no Python.
    """
    from pyspark.ml.functions import vector_to_array

    assembled, _ = _assemble(features, feature_cols)
    out = model.transform(assembled)
    return out.select(
        *features.columns,
        vector_to_array(F.col("probability"))[1].alias("match_prob"),
    )
