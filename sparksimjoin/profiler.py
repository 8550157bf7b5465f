"""profile_table_for_join (``[R] py_stringsimjoin/profiler/
profiler.py``; SURVEY.md §2.1 #13): per-attribute joinability report
computed in ONE aggregation pass (``agg(*exprs)``)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_table_for_join(
    df: DataFrame,
    profile_attrs: list[str] | None = None,
    reference_headers: bool = False,
) -> DataFrame:
    """``reference_headers=True`` renames the output to the upstream
    package's pandas report headers ('Unique values', 'Missing
    values', 'Comments' — ``[R] profiler/profiler.py``) for drop-in
    consumers; the default snake_case schema is the Spark-native
    form (and adds the fraction columns)."""
    attrs = profile_attrs or df.columns
    for a in attrs:
        assert a in df.columns, f"attribute {a!r} not in table"
    exprs = [F.count(F.lit(1)).alias("__n")]
    for a in attrs:
        exprs.append(F.countDistinct(F.col(a)).alias(f"__u_{a}"))
        exprs.append(F.sum(F.col(a).isNull().cast("long")).alias(f"__m_{a}"))
    row = df.agg(*exprs).collect()[0].asDict()
    n = row["__n"]
    out = []
    for a in attrs:
        uniq, miss = row[f"__u_{a}"], row[f"__m_{a}"]
        comments = []
        if uniq + miss == n and miss == 0 and n > 0:
            comments.append("This attribute can be used as a key attribute.")
        if miss > 0:
            comments.append(
                "Joining on this attribute will ignore "
                f"{miss} ({100.0 * miss / n:.2f}%) rows with missing values "
                "(unless allow_missing is set)."
            )
        out.append(
            {
                "attribute": a,
                "unique_count": uniq,
                "missing_count": miss,
                "unique_fraction": (uniq / n) if n else 0.0,
                "missing_fraction": (miss / n) if n else 0.0,
                "comment": " ".join(comments),
            }
        )
    spark = df.sparkSession
    res = spark.createDataFrame(
        out,
        schema="attribute string, unique_count long, missing_count long, "
        "unique_fraction double, missing_fraction double, comment string",
    )
    if reference_headers:
        res = res.select(
            F.col("attribute").alias("Attribute"),
            F.col("unique_count").alias("Unique values"),
            F.col("missing_count").alias("Missing values"),
            F.col("comment").alias("Comments"),
        )
    return res
