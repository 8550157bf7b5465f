"""Supervised pair matching on ``pyspark.ml`` — the learning half of
the Magellan bridge.

Magellan (py_entitymatching, the UW-Madison ecosystem the upstream
package belongs to — its README routes users there for matching
beyond thresholds) trains per-pair classifiers (logistic regression,
random forest, ...) on pair feature vectors and applies them to a
blocked candidate set. Spark-first, that is ``pyspark.ml`` over
:func:`sparksimjoin.features.featurize_pairs` output:

- training is one JVM-side fit on a DataFrame of features + label
  (no sklearn, no driver-side pandas materialization of the pairs);
- scoring is a pure Catalyst plan — ``PipelineModel.transform`` adds
  the probability column; at 100 TB the scoring stage is a narrow
  map over the candidate partitions, no shuffle beyond what
  featurization already did;
- models persist/reload through the standard ``MLWriter``/``MLReader``
  (``model.write().save(path)`` / ``PipelineModel.load(path)``), so a
  trained matcher rides the same checkpoint workflow as every other
  stage.

Null features: ``featurize_pairs`` deliberately propagates nulls
(missingness is information), but ``VectorAssembler`` rejects them and
LogisticRegression cannot consume NaN — so both entry points impute a
caller-visible constant (``na_fill``, default 0.0, Magellan's default
imputation shape) through the SAME helper, keeping train and apply
bit-consistent. Pass the same ``na_fill`` to both, or bake imputation
into the feature query upstream.

Determinism: both estimators are seeded; LogisticRegression's L-BFGS
objective is aggregated over partitions with floating-point addition,
so coefficients can wiggle at the last ulp across very different
partitionings — the TESTS therefore assert on predictions of
well-separated data (stable), not raw coefficients. RandomForest uses
the seed for feature/row subsampling and is reproducible given the
same partitioning.
"""

from __future__ import annotations

from pyspark.ml import Pipeline, PipelineModel
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .features import DEFAULT_FEATURES

#: estimator registry: name -> (class path resolved lazily, default params)
_MODELS = ("logistic", "random_forest", "gbt")


def _feature_cols(df: DataFrame, feature_cols) -> list[str]:
    if feature_cols is not None:
        missing = [c for c in feature_cols if c not in df.columns]
        assert not missing, f"feature columns absent from input: {missing}"
        return list(feature_cols)
    cols = [c for c in DEFAULT_FEATURES if c in df.columns]
    assert cols, (
        "no DEFAULT_FEATURES columns found — run featurize_pairs first "
        "or pass feature_cols explicitly"
    )
    return cols


def _prep(df: DataFrame, cols: list[str], na_fill: float) -> DataFrame:
    """Cast features to double and impute nulls/NaNs with ``na_fill``
    — shared by train and apply so the two paths see identical
    values."""
    for c in cols:
        d = F.col(c).cast("double")
        df = df.withColumn(
            c,
            F.coalesce(F.nanvl(d, F.lit(None).cast("double")),
                       F.lit(float(na_fill))),
        )
    return df


def sample_pairs(
    candset: DataFrame,
    l_key: str,
    r_key: str,
    n: int,
    seed: int = 42,
    stratify_col: str | None = None,
    n_strata: int = 10,
) -> DataFrame:
    """Deterministic candidate sample for LABELING (the Magellan
    ``sample_table`` step that precedes training): ~``n`` pairs chosen
    by ranking on ``xxhash64(l_key, r_key, seed)`` — a pure function
    of the DATA, so the same input always yields the same sample
    regardless of partitioning (``F.rand`` would not be, across
    re-materializations). With ``stratify_col`` (e.g. a similarity
    score), the sample is spread evenly across ``n_strata``
    equal-width buckets of that column's [min, max] range — labeled
    sets that cover the whole score range train far better matchers
    than top-heavy ones. Ranking is one window per stratum key (tiny
    key cardinality), not a global sort of the candset."""
    from pyspark.sql import Window

    assert n > 0
    h = F.xxhash64(F.col(l_key), F.col(r_key), F.lit(seed))
    if stratify_col is None:
        w = Window.orderBy(h, F.col(l_key), F.col(r_key))
        # single-partition window over ~n survivors only: pre-filter
        # by an approximate hash cut is not deterministic, so rank the
        # full set but ONLY when unstratified (document: prefer
        # stratified at scale)
        return (candset.withColumn("__rn", F.row_number().over(w))
                .where(F.col("__rn") <= n).drop("__rn"))
    lo, hi = candset.agg(
        F.min(stratify_col), F.max(stratify_col)).collect()[0]
    if lo is None or hi is None:
        return candset.limit(0)
    width = (float(hi) - float(lo)) or 1.0
    bucket = F.least(
        F.lit(n_strata - 1),
        F.floor((F.col(stratify_col) - F.lit(float(lo))) / F.lit(width)
                * n_strata).cast("int"),
    )
    per = max(1, n // n_strata)
    w = Window.partitionBy("__b").orderBy(h, F.col(l_key), F.col(r_key))
    return (
        candset.withColumn("__b", bucket)
        .withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= per)
        .drop("__b", "__rn")
    )


def _strip_training_summaries(
    model: PipelineModel, warn: bool = False
) -> PipelineModel:
    """Drop every stage's JVM-side training summary before the model
    enters a scoring plan. Two reasons, one of them a hard failure:

    - **Task-closure weight**: ``LogisticRegressionModel`` (and the
      other ``HasTrainingSummary`` models) keep ``trainingSummary``
      as a NON-transient field referencing the training predictions
      DataFrame and its SparkSession. ``model.transform`` captures
      the model in the prediction UDF's task closure, so every task
      would drag the whole summary graph along — never what you want
      when scoring 10^12 candidate pairs.
    - **Spark 4.1 sharp edge** (diagnosed round 4, minimal repro in
      ``tests/test_ml.py::test_ml_survives_session_observation``):
      ``classic.SparkSession.observationManager`` is a lazily
      materialized, non-serializable, non-transient field. It stays
      ``null`` until the session's FIRST ``Dataset.observe()``
      registration — after which Java-serializing the session (via
      the summary, via the model, via the closure) throws
      ``NotSerializableException: ObservationManager`` and the
      scoring job dies. This engine registers Observations routinely
      (stop-token metrics, incremental vocab counters), so a fitted
      model that still carries its summary is a time bomb: it scores
      fine on a fresh session and fails after any pipeline ran.

    ``setSummary(None)`` is a public JVM method on every
    ``HasTrainingSummary`` model; stages without it are skipped.
    Summary statistics wanted for diagnostics should be read BEFORE
    scoring (or recomputed with ``model.evaluate``)."""
    from pyspark import SparkContext

    sc = SparkContext._active_spark_context  # classic mode only
    if sc is None:  # pragma: no cover - connect mode / no session
        return model
    none = sc._jvm.scala.Option.empty()
    for stage in model.stages:
        jobj = getattr(stage, "_java_obj", None)
        if jobj is None:  # pragma: no cover - connect-mode stages
            continue
        try:
            has = jobj.hasSummary()
        except Exception:
            continue  # stage has no HasTrainingSummary interface
        if has:
            if warn:
                import warnings

                warnings.warn(
                    "apply_ml_matcher: clearing the JVM training summary "
                    f"of caller-supplied stage {stage.uid} (mutates the "
                    "model in place; read model.summary diagnostics "
                    "BEFORE scoring, or recompute via model.evaluate)",
                    UserWarning,
                    stacklevel=3,
                )
                warn = False  # once per call, not per stage
            # OUTSIDE the probe's except: if clearing fails we must
            # hear about it here, not later as the resurrected
            # NotSerializableException deep inside a scoring job
            jobj.setSummary(none)
    return model


def train_match_model(
    train_df: DataFrame,
    label_col: str = "label",
    feature_cols: list[str] | None = None,
    model: str = "logistic",
    seed: int = 42,
    na_fill: float = 0.0,
    **params,
) -> PipelineModel:
    """Fit a pair-match classifier on a DataFrame of pair features +
    a 0/1 ``label_col``. ``feature_cols`` defaults to whichever
    DEFAULT_FEATURES columns are present. ``model``:
    ``'logistic'`` | ``'random_forest'`` | ``'gbt'``; extra ``params``
    flow to the estimator. -> fitted ``PipelineModel`` (persist with
    ``.write().save(path)``)."""
    from pyspark.ml.feature import VectorAssembler

    cols = _feature_cols(train_df, feature_cols)
    assert label_col in train_df.columns, f"label column {label_col!r} missing"
    asm = VectorAssembler(inputCols=cols, outputCol="__features")
    if model == "logistic":
        from pyspark.ml.classification import LogisticRegression

        clf = LogisticRegression(
            featuresCol="__features", labelCol=label_col,
            maxIter=params.pop("maxIter", 100), **params)
    elif model == "random_forest":
        from pyspark.ml.classification import RandomForestClassifier

        clf = RandomForestClassifier(
            featuresCol="__features", labelCol=label_col, seed=seed,
            numTrees=params.pop("numTrees", 50), **params)
    elif model == "gbt":
        from pyspark.ml.classification import GBTClassifier

        clf = GBTClassifier(
            featuresCol="__features", labelCol=label_col, seed=seed,
            maxIter=params.pop("maxIter", 30), **params)
    else:
        raise ValueError(f"model must be one of {_MODELS}, got {model!r}")
    prepped = _prep(
        train_df.withColumn(label_col, F.col(label_col).cast("double")),
        cols, na_fill)
    return _strip_training_summaries(Pipeline(stages=[asm, clf]).fit(prepped))


def apply_ml_matcher(
    model: PipelineModel,
    pairs_df: DataFrame,
    feature_cols: list[str] | None = None,
    threshold: float = 0.5,
    na_fill: float = 0.0,
    prob_attr: str = "_match_prob",
    match_attr: str = "_match",
) -> DataFrame:
    """Score a featurized candidate set with a trained model. Appends
    ``prob_attr`` (P[match], double) and ``match_attr`` (int: 1 iff
    prob >= ``threshold`` — an explicit probability cut so callers can
    calibrate, rather than the estimator's baked-in 0.5 argmax) to the
    input columns; the assembler/vector intermediates are dropped.
    Use the same ``feature_cols``/``na_fill`` as training.

    Any training summaries still attached to ``model`` are stripped
    first (see :func:`_strip_training_summaries` — they bloat the
    scoring task closure and, after the session has registered any
    ``Observation``, make it unserializable outright). This mutates
    only the JVM summary slot, never the learned parameters."""
    from pyspark.ml.functions import vector_to_array

    _strip_training_summaries(model, warn=True)
    cols = _feature_cols(pairs_df, feature_cols)
    out_cols = pairs_df.columns
    scored = model.transform(_prep(pairs_df, cols, na_fill))
    prob = vector_to_array(F.col("probability")).getItem(1)
    return (
        scored.withColumn(prob_attr, prob)
        .withColumn(match_attr, (F.col(prob_attr) >= F.lit(float(threshold))).cast("int"))
        .select(*out_cols, prob_attr, match_attr)
    )
