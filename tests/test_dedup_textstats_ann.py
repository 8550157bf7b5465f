from __future__ import annotations

import itertools

import numpy as np
import pytest
from pyspark.sql import functions as F

from sparksimjoin.ann import brute_force_topk, lsh_topk
from sparksimjoin.dedup import (
    exact_dedup,
    minhash_lsh_dedup,
    ngram_jaccard_dedup,
    simhash,
    simhash_dedup,
)
from sparksimjoin.textstats import text_stats

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "the quick brown fox jumps over the lazy dog"),          # exact dup of 0
    (2, "the quick brown fox jumped over the lazy dog"),         # near dup
    (3, "el rapido zorro marron salta sobre el perro que duerme y que corre"),
    (4, "completely different text about spark and distributed joins"),
    (5, "the quick brown fox leaps over the lazy dog today"),    # near dup
    (6, None),
    (7, ""),
]


@pytest.fixture(scope="module")
def docs(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string").cache()
    df.count()
    return df


def test_exact_dedup(spark, docs):
    got = {r["id"]: r["group_id"] for r in exact_dedup(docs, "doc_id", "text").collect()}
    assert got[0] == 0 and got[1] == 0       # identical texts share min id
    assert got[2] == 2 and got[4] == 4
    assert got[6] == 6                        # null is its own group


def test_minhash_lsh_finds_near_dups(spark, docs):
    pairs = {
        (r["l_id"], r["r_id"])
        for r in minhash_lsh_dedup(docs, "doc_id", "text", threshold=0.5).collect()
    }
    assert (0, 1) in pairs          # exact dup always survives
    assert (0, 2) in pairs          # 1-token change at jaccard>=0.5
    assert all(l < r for l, r in pairs)
    # verified jaccard: no false positives below threshold
    from sparksimjoin.naive import naive_set_sim_join
    import pandas as pd

    pdf = pd.DataFrame(DOCS, columns=["doc_id", "text"])
    truth = {
        (l, r)
        for l, r, _ in naive_set_sim_join(
            pdf, pdf, "doc_id", "doc_id", "text", "text",
            __import__("sparksimjoin").WhitespaceTokenizer(), 0.5, "JACCARD",
            allow_empty=False, self_join=True,
        )
    }
    assert pairs <= truth


def test_simhash_deterministic_and_dedup(spark, docs):
    s1 = {r["id"]: r["simhash"] for r in simhash(docs, "doc_id", "text").collect()}
    s2 = {r["id"]: r["simhash"] for r in simhash(docs, "doc_id", "text").collect()}
    assert s1 == s2
    assert s1[0] == s1[1]  # identical text -> identical simhash
    pairs = {
        (r["l_id"], r["r_id"]): r["hamming"]
        for r in simhash_dedup(docs, "doc_id", "text", hamming_k=8).collect()
    }
    assert pairs[(0, 1)] == 0
    for (l, r), h in pairs.items():
        assert h == bin(s1[l] ^ s1[r]).count("1")


def test_ngram_jaccard_dedup(spark, docs):
    pairs = {
        (r["l_id"], r["r_id"]) for r in ngram_jaccard_dedup(docs, "doc_id", "text", 0.8).collect()
    }
    assert (0, 1) in pairs
    assert (3, 4) not in pairs


def test_text_stats(spark, docs):
    got = {r["id"]: r.asDict() for r in text_stats(docs, "doc_id", "text").collect()}
    assert got[0]["n_tokens"] == 9
    assert got[0]["lang"] == "en"
    assert got[3]["lang"] == "es"
    assert got[0]["fingerprint"] == got[1]["fingerprint"]
    assert got[0]["fingerprint"] != got[4]["fingerprint"]
    assert 0.0 <= got[0]["quality"] <= 1.0
    assert got[7]["n_tokens"] == 0


VECS = None


def _vectors():
    global VECS
    if VECS is None:
        rng = np.random.default_rng(7)
        base = rng.standard_normal((20, 16))
        # rows 0/1 nearly identical, 2 close to 0
        base[1] = base[0] + 0.001 * rng.standard_normal(16)
        base[2] = base[0] + 0.2 * rng.standard_normal(16)
        VECS = [(i, [float(x) for x in row]) for i, row in enumerate(base)]
    return VECS


def test_brute_force_topk(spark):
    df = spark.createDataFrame(_vectors(), "vec_id long, embedding array<double>")
    top = brute_force_topk(df, "vec_id", "embedding", k=3)
    rows = {(r["query_id"], r["rank"]): r["neighbor_id"] for r in top.collect()}
    assert rows[(0, 1)] == 1      # nearest neighbor of 0 is its near-copy
    assert rows[(1, 1)] == 0
    # oracle check vs numpy
    import numpy.linalg as la

    vecs = dict(_vectors())
    a = np.array(vecs[0])
    sims = {
        j: float(a @ np.array(v) / (la.norm(a) * la.norm(np.array(v))))
        for j, v in vecs.items() if j != 0
    }
    expect_top3 = [j for j, _ in sorted(sims.items(), key=lambda kv: (-round(kv[1], 6), kv[0]))[:3]]
    got_top3 = [rows[(0, r)] for r in (1, 2, 3)]
    assert got_top3 == expect_top3


def test_lsh_topk_recall(spark):
    df = spark.createDataFrame(_vectors(), "vec_id long, embedding array<double>")
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in brute_force_topk(df, "vec_id", "embedding", k=1).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in lsh_topk(df, "vec_id", "embedding", k=1, n_planes=6, n_tables=6).collect()
    }
    # near-identical pairs must be found; overall top-1 recall >= 0.5
    assert (0, 1) in approx and (1, 0) in approx
    assert len(exact & approx) / len(exact) >= 0.5


def test_topk_zero_vector_scores_zero_not_nan(spark):
    """A zero embedding (failed encoder output) must score cosine 0.0
    against everything — a NaN would sort FIRST under the cosine-desc
    window and emit k garbage rows for that query."""
    rows = [(0, [0.0] * 4), (1, [1.0, 0.0, 0.0, 0.0]),
            (2, [0.9, 0.1, 0.0, 0.0]), (3, [0.0, 1.0, 0.0, 0.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = brute_force_topk(df, "vec_id", "embedding", k=1).collect()
    by_q = {r["query_id"]: r for r in got}
    # the zero vector's own best match has cosine 0.0 (any partner)
    assert by_q[0]["cosine"] == 0.0
    # no other query ranks the zero vector first (real neighbors with
    # positive cosine exist for 1/2/3), and nothing is NaN
    for q in (1, 2, 3):
        assert by_q[q]["neighbor_id"] != 0
        assert by_q[q]["cosine"] == by_q[q]["cosine"]  # not NaN


def test_ivf_list_chunks_exact_equivalence(spark):
    """Hash-splitting the inverted lists (the hot-cell straggler
    guard) must not change a single row: per-(cell, chunk) top-k
    followed by the global window merge is the same exact top-k."""
    import pytest

    from sparksimjoin.ann import ivf_topk

    df = spark.createDataFrame(_vectors(), "vec_id long, embedding array<double>")
    one = ivf_topk(df, "vec_id", "embedding", k=3, n_cells=4, n_probe=2)
    three = ivf_topk(df, "vec_id", "embedding", k=3, n_cells=4, n_probe=2,
                     list_chunks=3)
    assert one.exceptAll(three).count() == 0
    assert three.exceptAll(one).count() == 0
    with pytest.raises(ValueError, match="list_chunks"):
        ivf_topk(df, "vec_id", "embedding", list_chunks=0)


def test_ivf_topk_recall_and_no_pair_dup(spark):
    from sparksimjoin.ann import ivf_topk

    df = spark.createDataFrame(_vectors(), "vec_id long, embedding array<double>")
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in brute_force_topk(df, "vec_id", "embedding", k=1).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in ivf_topk(df, "vec_id", "embedding", k=1,
                          n_cells=5, n_probe=3).collect()
    }
    # the near-identical pair lands in each other's probed cells
    assert (0, 1) in approx and (1, 0) in approx
    assert len(exact & approx) / len(exact) >= 0.5
    # one inverted list per base vector -> a pair meets at most once:
    # ranks are dense and rows unique without any distinct in the plan
    rows = ivf_topk(df, "vec_id", "embedding", k=3, n_cells=5, n_probe=3).collect()
    keys = {(r["query_id"], r["neighbor_id"]) for r in rows}
    assert len(keys) == len(rows)
    per_q = {}
    for r in rows:
        per_q.setdefault(r["query_id"], []).append(r["rank"])
    assert all(sorted(v) == list(range(1, len(v) + 1)) for v in per_q.values())


def test_minhash_md5_variant(spark, docs):
    """The md5 hash variant (driver-oracle path) finds the same
    verified near-dup pairs as the default xxhash64 banding on this
    fixture, and both respect the exact-jaccard threshold."""
    xx = {(r["l_id"], r["r_id"]): r["jaccard_sim"]
          for r in minhash_lsh_dedup(docs, "doc_id", "text", threshold=0.5).collect()}
    md5 = {(r["l_id"], r["r_id"]): r["jaccard_sim"]
           for r in minhash_lsh_dedup(docs, "doc_id", "text", threshold=0.5,
                                      hash_fn="md5").collect()}
    assert xx == md5
    assert all(v >= 0.5 for v in md5.values())


def test_simhash_md5_variant(spark, docs):
    """60-bit md5 signatures: deterministic, <2^60, identical text ->
    identical signature, and simhash_dedup hamming verified."""
    sigs = {r["id"]: r["simhash"]
            for r in simhash(docs, "doc_id", "text", hash_fn="md5").collect()}
    assert sigs[0] == sigs[1]
    assert all(0 <= s < (1 << 60) for s in sigs.values())
    pairs = {(r["l_id"], r["r_id"]): r["hamming"]
             for r in simhash_dedup(docs, "doc_id", "text", hamming_k=8,
                                    hash_fn="md5").collect()}
    assert pairs[(0, 1)] == 0
    for (l, r), h in pairs.items():
        assert h == bin(sigs[l] ^ sigs[r]).count("1") <= 8


def test_minhash_dedup_sets_equivalent(spark, docs):
    """Collapsing identical token sets before the LSH must not change
    the output: reps share signatures with members, and within-group
    pairs are exact duplicates at jaccard 1.0."""
    on = {(r["l_id"], r["r_id"]): round(r["jaccard_sim"], 9)
          for r in minhash_lsh_dedup(docs, "doc_id", "text", threshold=0.5,
                                     dedup_sets=True).collect()}
    off = {(r["l_id"], r["r_id"]): round(r["jaccard_sim"], 9)
           for r in minhash_lsh_dedup(docs, "doc_id", "text", threshold=0.5,
                                      dedup_sets=False).collect()}
    assert on == off
    assert on[(0, 1)] == 1.0


def test_embedding_neardup_no_window(spark):
    """embedding_neardup applies the threshold directly on the shared
    LSH candidate stage — no per-query row_number Window (which made a
    skewed bucket's per-query sort one hot task). Exercised on a
    skew-adversarial fixture: near-identical vectors that all collide
    into one bucket per table."""
    import numpy as np

    from sparksimjoin.ann import embedding_neardup

    rng = np.random.default_rng(5)
    base = rng.standard_normal(16)
    rows = [
        (i, (base + 0.01 * rng.standard_normal(16)).tolist()) for i in range(80)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = embedding_neardup(df, "vec_id", "embedding", threshold=0.99)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    got = {(r["l_id"], r["r_id"]) for r in out.collect()}
    # all pairs are near-identical (cosine ~0.999+) and share buckets
    assert len(got) == 80 * 79 // 2
    assert all(l < r for l, r in got)


# ---------------------------------------------------------------------------
# segment-level dedup (dedup.py segment_stats / segment_dedup)
# ---------------------------------------------------------------------------

_BOILER = "SPDX-License: MIT"
_NAV = "home | about | contact"


def _seg_docs(spark):
    rows = [
        # doc 0: canonical holder of both boilerplate lines
        (0, f"{_BOILER}\nalpha unique zero\n{_NAV}\nalpha unique zero"),
        # doc 1: boilerplate + own content; note doubled spaces + tab
        # normalize to the same boilerplate line
        (1, f"SPDX-License:  MIT\nbravo unique one\n{_NAV}"),
        # doc 2: boilerplate with trailing spaces, unique rest
        (2, f"{_BOILER}   \ncharlie unique two"),
        # doc 3: all-unique
        (3, "delta unique three\necho unique three"),
        # doc 4: null text
        (4, None),
        # doc 5: only empty/whitespace lines
        (5, " \n\t\n  "),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_segment_stats_semantics(spark):
    from sparksimjoin.dedup import segment_stats

    got = {r["id"]: r.asDict() for r in
           segment_stats(_seg_docs(spark), "doc_id", "text").collect()}
    assert len(got) == 6
    # doc 0: 4 lines, 3 unique ("alpha unique zero" twice), 2 cross-dup
    assert got[0]["n_segments"] == 4 and got[0]["n_unique"] == 3
    assert got[0]["n_cross_dup"] == 2
    assert round(got[0]["intra_dup_ratio"], 6) == 0.25
    # doc 1: whitespace-normalized boilerplate counts as the same line
    assert got[1]["n_segments"] == 3 and got[1]["n_cross_dup"] == 2
    # doc 2: trailing spaces trimmed -> boilerplate matches
    assert got[2]["n_cross_dup"] == 1
    # doc 3: no cross-corpus duplicates
    assert got[3]["n_cross_dup"] == 0 and got[3]["intra_dup_ratio"] == 0.0
    # docs 4/5: null text / only-empty lines -> zero counts, not dropped
    for i in (4, 5):
        assert got[i]["n_segments"] == 0 and got[i]["n_cross_dup"] == 0


def test_segment_dedup_semantics(spark):
    from sparksimjoin.dedup import segment_dedup

    got = {r["id"]: r.asDict() for r in
           segment_dedup(_seg_docs(spark), "doc_id", "text").collect()}
    # canonical doc keeps everything (including its intra-doc repeat)
    assert got[0]["clean_text"].count(_BOILER) == 1
    assert got[0]["n_dropped"] == 0 and got[0]["n_kept"] == 4
    # non-canonical docs lose the duplicated lines, keep their own, in
    # original order
    assert got[1]["clean_text"] == "bravo unique one"
    assert got[1]["n_kept"] == 1 and got[1]["n_dropped"] == 2
    assert got[2]["clean_text"] == "charlie unique two"
    assert got[3]["clean_text"] == "delta unique three\necho unique three"
    assert got[3]["n_dropped"] == 0
    # null stays null; all-empty doc rebuilds to ''
    assert got[4]["clean_text"] is None
    assert got[5]["clean_text"] == "" and got[5]["n_kept"] == 0


def test_segment_dedup_min_docs_and_paragraphs(spark):
    from sparksimjoin.dedup import segment_dedup

    rows = [
        (0, "shared para one\n\nunique a"),
        (1, "shared para one\n\nunique b"),
        (2, "shared para one\n\nunique c"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    # min_docs=4: nothing reaches the bar, everything kept
    all_kept = segment_dedup(df, "doc_id", "text", granularity="paragraph",
                             min_docs=4)
    assert all_kept.agg({"n_dropped": "sum"}).collect()[0][0] == 0
    # default bar: the shared paragraph survives only in doc 0
    got = {r["id"]: r["clean_text"] for r in
           segment_dedup(df, "doc_id", "text",
                         granularity="paragraph").collect()}
    assert got[0] == "shared para one\n\nunique a"
    assert got[1] == "unique b" and got[2] == "unique c"


def test_segment_granularity_validation(spark):
    import pytest as _pytest

    from sparksimjoin.dedup import segment_stats

    with _pytest.raises(ValueError, match="granularity"):
        segment_stats(_seg_docs(spark), "doc_id", "text",
                      granularity="sentence").collect()


def test_ivf_kmeans_refinement_improves_recall(spark):
    """The fixed-iteration Lloyd refinement of the IVF codebook
    (ann._ivf_centroids kmeans_iters) must be (a) strictly better than
    the naive smallest-id codebook on real-ish data — measured on the
    sf0.01 embeddings: recall@3 0.518 naive -> 0.593 at 2 iterations —
    and (b) deterministic across partitionings (the exact-integer
    quantized centroid update commutes, double summation would not)."""
    import pyspark.sql.functions as F

    from sparksimjoin.ann import ivf_topk

    e = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    truth = {
        (r["query_id"], r["neighbor_id"])
        for r in brute_force_topk(e, "vec_id", "embedding", k=3).collect()
    }

    def recall(iters, df):
        got = {
            (r["query_id"], r["neighbor_id"])
            for r in ivf_topk(df, "vec_id", "embedding", k=3, n_cells=16,
                              n_probe=4, kmeans_iters=iters).collect()
        }
        return len(got & truth) / len(truth), got

    r0, _ = recall(0, e)
    r2, got2 = recall(2, e)
    assert r2 > r0, (r0, r2)
    assert r2 >= 0.55  # anchor well below the measured 0.593
    # partitioning invariance of the refined codebook end to end
    _, got2b = recall(2, e.repartition(13, F.col("vec_id")))
    assert got2 == got2b


def test_lsh_bucket_cap(spark):
    """bucket_cap: the lossy hot-bucket guard (round-5 scale finding —
    the uncapped bucket self-join's Sigma(bucket^2) term filled a
    77 GB disk on a 200k clustered corpus). A high cap is a no-op
    (identical result set, dropped_buckets == 0); a tight cap on a
    degenerate corpus drops the hot buckets (dropped_buckets > 0),
    the result is a subset of the uncapped result, and near-identical
    pairs still meet through the other tables' buckets."""
    import numpy as np

    from sparksimjoin.ann import lsh_topk

    rng = np.random.default_rng(7)
    # degenerate cluster: 30 copies of one direction (one hot bucket
    # per table) + 20 spread vectors
    hot = rng.standard_normal(8)
    rows = [(i, (hot + 0.01 * rng.standard_normal(8)).tolist()) for i in range(30)]
    rows += [(100 + i, rng.standard_normal(8).tolist()) for i in range(20)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    uncapped = {(r["query_id"], r["neighbor_id"], r["rank"])
                for r in lsh_topk(df, "vec_id", "embedding", k=2).collect()}
    m_hi: dict = {}
    hi = {(r["query_id"], r["neighbor_id"], r["rank"])
          for r in lsh_topk(df, "vec_id", "embedding", k=2,
                            bucket_cap=1000, metrics_out=m_hi).collect()}
    assert hi == uncapped
    assert int(m_hi["dropped_buckets"]) == 0

    m_lo: dict = {}
    lo_rows = lsh_topk(df, "vec_id", "embedding", k=2,
                       bucket_cap=25, metrics_out=m_lo).collect()
    lo_pairs = {(r["query_id"], r["neighbor_id"]) for r in lo_rows}
    assert int(m_lo["dropped_buckets"]) > 0
    # capped candidates are a subset of uncapped CANDIDATES: every
    # capped pair appears in the uncapped candidate set (rank may
    # shift when competitors are dropped, so compare pairs via a
    # bigger-k uncapped run)
    uncapped_all = {(r["query_id"], r["neighbor_id"])
                    for r in lsh_topk(df, "vec_id", "embedding", k=50).collect()}
    assert lo_pairs <= uncapped_all

    for bad in (0, -1):
        with pytest.raises(ValueError, match="bucket_cap"):
            lsh_topk(df, "vec_id", "embedding", bucket_cap=bad)
