from __future__ import annotations

import pytest

from sparksimjoin.decontam import decontaminate, word_ngrams

from pyspark.sql import functions as F


def _py_ngrams(text: str | None, n: int) -> set[str]:
    if text is None:
        return set()
    toks = [t for t in text.lower().split() if t]
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


CORPUS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "a quick brown fox jumps over a sleeping cat"),
    (3, "completely unrelated text about spark shuffles"),
    (4, None),
    (5, "short text"),
    (6, "the quick brown fox jumps over the lazy dog twice over"),
]

BENCH = [
    ("quick brown fox jumps over the lazy dog end",),
    (None,),
    ("spark shuffles",),
]


def _brute(n: int, min_hits: int):
    bench_grams = set()
    for (t,) in BENCH:
        bench_grams |= _py_ngrams(t, n)
    out = {}
    for i, t in CORPUS:
        grams = _py_ngrams(t, n)
        hits = len(grams & bench_grams)
        out[i] = (len(grams), hits, hits >= min_hits)
    return out


@pytest.mark.parametrize("n,min_hits", [(3, 1), (3, 2), (5, 1), (1, 3)])
def test_brute_force_parity(spark, n, min_hits):
    corpus = spark.createDataFrame(CORPUS, "doc_id long, text string")
    bench = spark.createDataFrame(BENCH, "text string")
    got = {
        r.id: (r.n_ngrams, r.bench_hits, r.contaminated)
        for r in decontaminate(
            corpus, "doc_id", "text", bench, "text", n=n, min_hits=min_hits
        ).collect()
    }
    assert got == _brute(n, min_hits)


def test_distinct_grams_counted_once(spark):
    # a repeated benchmark phrase inside one doc counts as ONE hit
    corpus = spark.createDataFrame(
        [(1, "alpha beta alpha beta alpha beta")], "doc_id long, text string"
    )
    bench = spark.createDataFrame([("alpha beta",)], "text string")
    row = decontaminate(corpus, "doc_id", "text", bench, "text", n=2).collect()[0]
    # doc grams: {alpha beta, beta alpha} -> exactly 1 benchmark hit
    assert (row.n_ngrams, row.bench_hits, row.contaminated) == (2, 1, True)


def test_short_and_null_docs_never_contaminated(spark):
    corpus = spark.createDataFrame(
        [(1, "one two"), (2, None), (3, "")], "doc_id long, text string"
    )
    bench = spark.createDataFrame([("one two three",)], "text string")
    rows = {r.id: r for r in
            decontaminate(corpus, "doc_id", "text", bench, "text", n=3).collect()}
    assert all(rows[i].n_ngrams == 0 and not rows[i].contaminated for i in (1, 2, 3))


def test_benchmark_side_is_broadcast(spark):
    corpus = spark.createDataFrame(CORPUS, "doc_id long, text string")
    bench = spark.createDataFrame(BENCH, "text string")
    plan = decontaminate(corpus, "doc_id", "text", bench, "text", n=3)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_validation(spark):
    corpus = spark.createDataFrame(CORPUS, "doc_id long, text string")
    bench = spark.createDataFrame(BENCH, "text string")
    with pytest.raises(Exception):
        decontaminate(corpus, "nope", "text", bench, "text")
    with pytest.raises(ValueError):
        decontaminate(corpus, "doc_id", "text", bench, "text", min_hits=0)
    with pytest.raises(ValueError):
        word_ngrams(F.col("text"), 0)
