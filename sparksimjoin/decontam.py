"""Benchmark decontamination for training-data pipelines (beyond the
reference surface; task brief's LLM-pipeline extras).

The standard guard against test-set leakage (Brown et al. 2020 ran it
with 13-gram collisions; Dodge et al. 2021 with exact overlaps): a
training document is *contaminated* when it shares at least
``min_hits`` distinct word n-grams with a held-out benchmark/eval
corpus. This module computes the per-document contamination profile
so callers can drop or audit flagged documents.

100 TB design:

- The benchmark side is **tiny by construction** (eval sets are at
  most millions of n-grams — MBs, not TBs), so its distinct n-gram
  set is ``F.broadcast`` — the corpus scan never shuffles its
  exploded n-grams; membership is a map-side broadcast hash join.
- n-gram generation is a pure Column expression
  (``transform(sequence(...))`` over the token array — whole-stage
  codegen, no Python), and per-document hit counting is a
  ``groupBy(id).count()`` over the *surviving* (matched) grams only —
  partial map-side aggregation of a stream that is empty for clean
  documents, so the one shuffle moves O(contaminated grams), not
  O(corpus grams).
- Exactness: hits are counted over each document's **distinct**
  n-grams (``array_distinct`` before the explode), so a single
  repeated benchmark phrase inside one document counts once — the
  count is a set-intersection size, insensitive to repetition spam.

The DuckDB oracle replicates token split / n-gram window /
distinct-intersection semantics verbatim (``__spark_entry__.py``
``decontam_doc``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .validation import validate_attr

from .tokenizers import WhitespaceTokenizer

#: return_set=False keeps order AND duplicates — positional word
#: n-grams need both. Reusing the tokenizer (not a copied regex) keeps
#: the whitespace class — including the \x1c-\x1f separators Python's
#: str.split() treats as whitespace but (?U)\s does not — in ONE place.
_WS = WhitespaceTokenizer()


def _word_tokens(col: Column) -> Column:
    return _WS.spark_expr(F.lower(col))


def word_ngrams(col: Column, n: int) -> Column:
    """Distinct word ``n``-grams of a text column, space-joined, as an
    ``array<string>`` Column expression (empty array when the text has
    fewer than ``n`` tokens or is NULL)."""
    if n < 1:
        raise ValueError(f"n must be >= 1; got {n}")
    toks = _word_tokens(col)
    # NB: Spark's sequence(1, stop) REVERSES when stop < 1 (it yields a
    # descending run, not an empty array), so the short-text case must
    # be gated explicitly — the same trap bag_distance_expr documents.
    grams = F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (n - 1)),
            lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return F.array_distinct(grams)


def decontaminate(
    corpus: DataFrame,
    key_attr: str,
    text_attr: str,
    benchmark: DataFrame,
    bench_text_attr: str,
    n: int = 13,
    min_hits: int = 1,
) -> DataFrame:
    """Per-document benchmark-contamination profile.

    Returns one row per corpus document:

    - ``id``          — the corpus key
    - ``n_ngrams``    — distinct word n-grams in the document (int)
    - ``bench_hits``  — how many of those also occur anywhere in the
      benchmark corpus (int; a set-intersection size)
    - ``contaminated``— ``bench_hits >= min_hits`` (boolean)

    Documents with NULL/short text get ``n_ngrams = 0`` and are never
    contaminated. Benchmark rows with NULL text are ignored.
    """
    validate_attr(corpus, key_attr, "corpus")
    validate_attr(corpus, text_attr, "corpus")
    validate_attr(benchmark, bench_text_attr, "benchmark")
    if min_hits < 1:
        raise ValueError(f"min_hits must be >= 1; got {min_hits}")

    grams = word_ngrams(F.col(text_attr), n)
    prof = corpus.select(
        F.col(key_attr).alias("id"), grams.alias("_grams")
    ).select("id", "_grams", F.size("_grams").alias("n_ngrams"))

    bench_grams = (
        benchmark.select(
            F.explode(word_ngrams(F.col(bench_text_attr), n)).alias("gram")
        )
        .distinct()
    )

    hits = (
        prof.select("id", F.explode("_grams").alias("gram"))
        .join(F.broadcast(bench_grams), "gram")
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("bench_hits"))
    )

    return (
        prof.join(hits, "id", "left")
        .select(
            "id",
            F.col("n_ngrams").cast("int").alias("n_ngrams"),
            F.coalesce(F.col("bench_hits"), F.lit(0)).cast("int").alias("bench_hits"),
            (F.coalesce(F.col("bench_hits"), F.lit(0)) >= min_hits).alias(
                "contaminated"
            ),
        )
    )
