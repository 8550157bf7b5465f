"""Properties of the dense-long surrogate record ids (with_iid) the
candidate funnel shuffles instead of string ids: determinism across
re-materializations, injectivity under adversarial key shapes,
namespace disjointness, and original-id-space output orientation of
the joins built on top."""

from __future__ import annotations

from pyspark.sql import functions as F

from sparksimjoin import WhitespaceTokenizer, jaccard_join
from sparksimjoin.joins.core import (
    IID_NS_SHIFT,
    ensure_iid,
    iid_tag,
    with_iid,
)


def _ids_df(spark, ids):
    return spark.createDataFrame([(i,) for i in ids], "id string")


# adversarial: shared long prefixes (defeats prefix bucketing), mixed
# lengths, near-duplicates, non-ascii, and ids differing only in the
# last char
TRICKY_IDS = (
    [f"conv{'0' * 30}{i:04d}" for i in range(200)]
    + ["a", "aa", "aaa", "b", "ab", "ba"]
    + [f"conv{i:04d}" for i in range(50)]
    + ["日本語-1", "日本語-2", "ключ", "\x00weird", "\x00weird2"]
)


def test_iid_injective_and_deterministic(spark):
    df = with_iid(_ids_df(spark, TRICKY_IDS))
    rows = {r["id"]: r["iid"] for r in df.collect()}
    assert len(rows) == len(TRICKY_IDS)
    assert len(set(rows.values())) == len(TRICKY_IDS), "iid collision"
    # re-materialize the SAME logical plan from scratch (fresh frame,
    # no cache): a cache-evicted branch must re-derive identical iids
    again = {r["id"]: r["iid"] for r in with_iid(_ids_df(spark, TRICKY_IDS)).collect()}
    assert rows == again
    # determinism must also hold under a different partitioning of the
    # same data (a recomputed branch sees different splits)
    shuffled = {
        r["id"]: r["iid"]
        for r in with_iid(_ids_df(spark, TRICKY_IDS).repartition(7)).collect()
    }
    assert rows == shuffled


def test_iid_namespace_disjoint(spark):
    base = with_iid(_ids_df(spark, [f"x{i}" for i in range(100)]))
    other = with_iid(_ids_df(spark, [f"y{i}" for i in range(100)]))
    tagged = iid_tag(other, 1)
    both = base.select("iid").unionAll(tagged.select("iid"))
    assert both.distinct().count() == 200
    # the tag occupies the ns field only: low bits unchanged
    low = 1 << IID_NS_SHIFT
    for r in tagged.collect():
        assert r["iid"] >= low


def test_ensure_iid_idempotent(spark):
    df = with_iid(_ids_df(spark, ["p", "q"]))
    assert ensure_iid(df) is df
    plain = _ids_df(spark, ["p", "q"])
    assert "iid" in ensure_iid(plain).columns


def test_self_join_output_original_id_order(spark):
    # iid order is NOT the original-id order; the join must still emit
    # canonical (l_id < r_id) pairs in ORIGINAL id space
    rows = [(f"id{i:03d}", "the same exact text here") for i in range(12)]
    df = spark.createDataFrame(rows, "id string, val string")
    out = jaccard_join(
        df, df, "id", "id", "val", "val", WhitespaceTokenizer(), 0.9,
        self_join=True, dedup_strings=False,
    ).collect()
    assert len(out) == 12 * 11 // 2
    for r in out:
        assert r["l_id"] < r["r_id"]


def test_two_table_join_sides_not_swapped(spark):
    l = spark.createDataFrame([("L1", "alpha beta gamma")], "id string, val string")
    r = spark.createDataFrame([("R1", "alpha beta gamma")], "id string, val string")
    out = jaccard_join(l, r, "id", "id", "val", "val",
                       WhitespaceTokenizer(), 0.5).collect()
    assert [(x["l_id"], x["r_id"]) for x in out] == [("L1", "R1")]


def test_iid_property_random_unicode(spark):
    """Hypothesis-style corpus (fixed seeds — one Spark roundtrip per
    example set is too slow for per-example shrinking): random unicode
    ids incl. surrogum-adjacent codepoints, whitespace, and empties
    must stay injective and deterministic."""
    import random

    rng = random.Random(1234)
    alphabet = "ab01-_ \té中\U0001f600"
    ids = {""} | {
        "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 24)))
        for _ in range(500)
    }
    ids = sorted(ids)
    m1 = {r["id"]: r["iid"] for r in with_iid(_ids_df(spark, ids)).collect()}
    assert len(set(m1.values())) == len(ids)
    m2 = {
        r["id"]: r["iid"]
        for r in with_iid(_ids_df(spark, ids).repartition(13)).collect()
    }
    assert m1 == m2


def test_funnel_is_long_keyed(spark):
    """The candidate funnel's shuffled id columns are BIGINT (the whole
    point: ~24B UnsafeRow string ids -> 8B longs in the wall stage)."""
    from sparksimjoin.joins.core import (
        build_token_ranks, order_tokens, prefix_explode,
    )
    from sparksimjoin.joins.core import tokenize_table

    df = spark.createDataFrame(
        [(f"c{i}", "a b c d e") for i in range(10)], "key string, val string"
    )
    tok = tokenize_table(df, "key", "val", WhitespaceTokenizer().with_return_set(True))
    ranks = build_token_ranks([tok])
    prep = order_tokens(tok, ranks)
    ex = prefix_explode(prep, "l", "JACCARD", 0.8)
    assert dict(ex.dtypes)["l_id"] == "bigint"
