"""Training-data deduplication operators (beyond the reference —
first-class components for the 100 TB pipeline; see task brief):

- exact_dedup: hash-groupBy duplicate groups (one shuffle).
- minhash_lsh_dedup: shingle -> 64-perm MinHash -> banded LSH
  bucket-join -> exact Jaccard verify. All JVM-side: per-permutation
  min-hash is a single explode + groupBy with 64 min() aggregates.
- simhash_dedup: 64-bit SimHash; near-dup candidates via the
  pigeonhole band join (k+1 chunks for Hamming<=k), verified with
  bit_count(xor).
- ngram_jaccard_dedup: thin wrapper over the prefix-filtered jaccard
  self-join (joins/set_sim.py) with qgram shingles.

Each returns pair- or group-shaped DataFrames with stable column
names for the DuckDB oracle harness.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .cache import track
from .filter_math import sim_expr
from .tokenizers import QgramTokenizer, Tokenizer, WhitespaceTokenizer


def exact_dedup(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """-> (id, group_id) where group_id = min id among rows with
    byte-identical text. Null texts are their own singleton groups.

    Scale shape: ``groupBy(text).min(id)`` pre-aggregates map-side, so
    a hot duplicate text (a billion-copy boilerplate doc) collapses to
    one row per input partition before the shuffle — unlike a
    ``Window.partitionBy(text)``, which would sort every copy inside a
    single reducer. The join back to assign group ids shuffles on an
    8-byte ``xxhash64(text)`` key (text equality re-checked as a
    residual), not the full text."""
    base = df.select(F.col(id_col).alias("id"), F.col(text_col).alias("_t"))
    nn = base.where(F.col("_t").isNotNull()).withColumn("_h", F.xxhash64("_t"))
    groups = nn.groupBy("_h", "_t").agg(F.min("id").alias("group_id"))
    grouped = (
        nn.join(groups.withColumnRenamed("_t", "_gt"), "_h")
        .where(F.col("_t") == F.col("_gt"))
        .select("id", "group_id")
    )
    singletons = base.where(F.col("_t").isNull()).select(
        "id", F.col("id").alias("group_id")
    )
    return grouped.unionByName(singletons)


def _perm_hash(i: int, tok, hash_fn: str):
    """Per-permutation token hash. ``xxhash64`` (default) is the fast
    JVM codegen path; ``md5`` is a 60-bit hash both Spark and DuckDB
    compute identically (conv(substr(md5(...),1,15),16,10)), existing
    so the driver's SQL oracle can replicate signatures exactly."""
    if hash_fn == "xxhash64":
        return F.xxhash64(F.lit(i), tok)
    if hash_fn == "md5":
        return F.conv(
            F.substring(F.md5(F.concat_ws("|", F.lit(str(i)), tok)), 1, 15), 16, 10
        ).cast("bigint")
    raise ValueError(hash_fn)


def _minhash_sigs(
    df: DataFrame, id_col: str, tokens_col: str, num_perm: int, hash_fn: str = "xxhash64"
) -> DataFrame:
    """-> (id, mh_0 .. mh_{num_perm-1}) via explode + min aggregates."""
    ex = df.select(F.col(id_col).alias("id"), F.explode(tokens_col).alias("tok"))
    aggs = [
        F.min(_perm_hash(i, F.col("tok"), hash_fn)).alias(f"mh_{i}")
        for i in range(num_perm)
    ]
    return ex.groupBy("id").agg(*aggs)


def _auto_bands(num_perm: int, threshold: float, min_recall: float = 0.95) -> int:
    """Pick the band count whose (b, r) banding keeps LSH recall at
    ``threshold`` above ``min_recall`` with the FEWEST bands (largest
    rows-per-band -> fewest false-positive bucket collisions).
    recall(b, r) = 1 - (1 - t^r)^b."""
    best = num_perm  # r=1: recall ~1, most collisions — worst case
    for b in sorted({d for d in range(1, num_perm + 1) if num_perm % d == 0}):
        r = num_perm // b
        recall = 1 - (1 - threshold**r) ** b
        if recall >= min_recall:
            return b
    return best


def minhash_lsh_dedup(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.7,
    num_perm: int = 64,
    bands: int | None = None,
    tokenizer: Tokenizer | None = None,
    hash_fn: str = "xxhash64",
    dedup_sets: bool | str = "auto",
) -> DataFrame:
    """-> (l_id, r_id, jaccard_sim) for near-duplicate pairs found in
    at least one LSH band and verified with exact token-set Jaccard
    >= threshold. Deterministic (seeded permutation hashes; see
    _perm_hash for the xxhash64/md5 choice — md5 is the
    oracle-replicable variant). bands=None auto-tunes the banding to
    the threshold (>=95% LSH recall with minimal bucket collisions).

    ``dedup_sets``: signatures depend only on the token SET, so
    records with identical sets are collapsed to one representative
    before the signature aggregation and bucket join (within-group
    pairs are exact duplicates, jaccard 1.0, emitted directly) —
    duplication-factor^2 less LSH work on boilerplate-heavy corpora.
    "auto" decides from sampled duplication stats; True/False force."""
    from .joins.core import (
        canonical_set_key,
        expand_gid_pairs,
        resolve_dedup,
        string_dedup_maps,
    )

    if bands is None:
        bands = _auto_bands(num_perm, threshold)
    assert num_perm % bands == 0
    rows_per_band = num_perm // bands
    tok = (tokenizer or WhitespaceTokenizer()).with_return_set(True)

    key_fn = lambda c: canonical_set_key(tok, c)  # noqa: E731
    use_dedup = resolve_dedup(dedup_sets, df, df, text_col, text_col, key_fn=key_fn)
    if use_dedup:
        reps, _, id_map, _ = string_dedup_maps(
            df, df, id_col, id_col, text_col, text_col, key_fn=key_fn
        )
        src, src_id, src_text = reps, "__gid", "__val"
    else:
        src, src_id, src_text = df, id_col, text_col

    base = src.where(F.col(src_text).isNotNull()).select(
        F.col(src_id).alias("id"), tok.spark_expr(F.col(src_text)).alias("toks")
    ).where(F.size("toks") > 0)
    # hashed int token arrays for the verify stage: array_intersect on
    # array<bigint> takes Spark's primitive codegen path (25x faster
    # than the string fallback); 64-bit collision risk is negligible
    n_part = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    # widen early: a single-file parquet scan otherwise serializes the
    # signature aggregation and the bucket join behind one task
    base = track(
        base.repartition(n_part, "id").withColumn(
            "toks_h", F.array_sort(F.transform("toks", lambda x: F.xxhash64(x)))
        )
    )
    sigs = _minhash_sigs(base, "id", "toks", num_perm, hash_fn)
    band_cols = [
        F.struct(
            F.lit(b).alias("band"),
            F.xxhash64(*[F.col(f"mh_{b * rows_per_band + r}") for r in range(rows_per_band)]).alias("sig"),
        )
        for b in range(bands)
    ]
    # persist the bucket table: it is tiny (bands rows per record) and
    # feeds BOTH sides of the band self-join — without the cache the
    # 64-aggregate signature pipeline is computed twice, and a third
    # time inside the verify job
    buckets = track(
        sigs.select("id", F.explode(F.array(*band_cols)).alias("bk")).select(
            "id", F.col("bk.band").alias("band"), F.col("bk.sig").alias("sig")
        )
    )
    l = buckets.select(F.col("id").alias("l_id"), "band", "sig")
    r = buckets.select(F.col("id").alias("r_id"), "band", "sig")
    cand = track(
        l.join(r, ["band", "sig"]).where(F.col("l_id") < F.col("r_id"))
        .select("l_id", "r_id").distinct()
    )
    # no pair-key respread here: `cand` IS the cached output of a
    # distinct over (l_id, r_id) — already hash-partitioned by exactly
    # the spread key, so the old repartition was a full extra exchange
    # of the candidate stream for an identical layout
    verified = (
        cand
        .join(base.select(F.col("id").alias("l_id"), F.col("toks_h").alias("_lt")), "l_id")
        .join(base.select(F.col("id").alias("r_id"), F.col("toks_h").alias("_rt")), "r_id")
        .withColumn("jaccard_sim", sim_expr(F.col("_lt"), F.col("_rt"), "JACCARD"))
        .where(F.col("jaccard_sim") >= threshold)
        .select("l_id", "r_id", "jaccard_sim")
    )
    if use_dedup:
        verified = expand_gid_pairs(
            verified, id_map, id_map, self_join=True, score_cols=("jaccard_sim",)
        )
        # within-group pairs: identical token sets, jaccard exactly
        # 1.0; only groups that reached `base` (non-null, non-empty)
        eligible = base.select(F.col("id").alias("__gid"))
        m1 = id_map.join(eligible, "__gid").select("__gid", F.col("__oid").alias("l_id"))
        m2 = id_map.select("__gid", F.col("__oid").alias("r_id"))
        diag = (
            m1.join(m2, "__gid")
            .where(F.col("l_id") < F.col("r_id"))
            .select("l_id", "r_id", F.lit(1.0).alias("jaccard_sim"))
        )
        if threshold <= 1.0:
            verified = verified.unionByName(diag)
    return verified


def simhash_bits(hash_fn: str) -> int:
    """Signature width: 64 for xxhash64, 60 for the md5 oracle
    variant (15 hex chars -> 60 bits; both engines compute it)."""
    return 64 if hash_fn == "xxhash64" else 60


def simhash(
    df: DataFrame,
    id_col: str,
    text_col: str,
    tokenizer: Tokenizer | None = None,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """-> (id, simhash) SimHash over token-bag hashes: bit b of the
    output is 1 iff sum over token occurrences of (+1 if bit b of
    hash(token) else -1) is positive. 64-bit with xxhash64 (default);
    60-bit with the DuckDB-replicable md5 hash (driver oracle)."""
    n_bits = simhash_bits(hash_fn)
    tok = (tokenizer or WhitespaceTokenizer()).with_return_set(False)
    base = df.where(F.col(text_col).isNotNull()).select(
        F.col(id_col).alias("id"), tok.spark_expr(F.col(text_col)).alias("toks")
    )
    if hash_fn == "xxhash64":
        h = F.xxhash64("_tok")
    elif hash_fn == "md5":
        h = F.conv(F.substring(F.md5(F.col("_tok")), 1, 15), 16, 10).cast("bigint")
    else:
        raise ValueError(hash_fn)
    ex = base.select("id", F.explode("toks").alias("_tok")).select("id", h.alias("h"))
    # bit 63 of a signed long is the sign bit: 1<<63 overflows, so use
    # its two's-complement value
    aggs = [
        F.sum(
            F.when(
                F.col("h").bitwiseAND(F.lit(1 << b if b < 63 else -(1 << 63))) != 0, 1
            ).otherwise(-1)
        ).alias(f"s_{b}")
        for b in range(n_bits)
    ]
    sums = ex.groupBy("id").agg(*aggs)
    sig = F.lit(0).cast("long")
    for b in range(n_bits):
        sig = sig + F.when(F.col(f"s_{b}") > 0, F.lit(1 << b if b < 63 else -(1 << 63))).otherwise(0).cast("long")
    return sums.select("id", sig.alias("simhash"))


def simhash_dedup(
    df: DataFrame,
    id_col: str,
    text_col: str,
    hamming_k: int = 3,
    tokenizer: Tokenizer | None = None,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """-> (l_id, r_id, hamming) pairs with SimHash Hamming distance
    <= k. Candidates via the pigeonhole band join: split the signature
    bits into k+1 chunks; any pair within distance k shares >= 1 exact
    chunk."""
    n_bits = simhash_bits(hash_fn)
    sigs = simhash(df, id_col, text_col, tokenizer, hash_fn)
    chunks = hamming_k + 1
    if chunks == 1:
        l0 = sigs.select(F.col("id").alias("l_id"), F.col("simhash").alias("l_sig"))
        r0 = sigs.select(F.col("id").alias("r_id"), F.col("simhash").alias("r_sig"))
        return (
            l0.join(r0, l0["l_sig"] == r0["r_sig"]).where(F.col("l_id") < F.col("r_id"))
            .select("l_id", "r_id", F.lit(0).alias("hamming"))
        )
    width = n_bits // chunks
    chunk_cols = [
        F.struct(
            F.lit(c).alias("chunk"),
            F.shiftrightunsigned(F.col("simhash"), c * width)
            .bitwiseAND(F.lit((1 << width) - 1))
            .alias("val"),
        )
        for c in range(chunks)
    ]
    buckets = sigs.select("id", "simhash", F.explode(F.array(*chunk_cols)).alias("ck")).select(
        "id", "simhash", F.col("ck.chunk").alias("chunk"), F.col("ck.val").alias("val")
    )
    l = buckets.select(F.col("id").alias("l_id"), F.col("simhash").alias("l_sig"), "chunk", "val")
    r = buckets.select(F.col("id").alias("r_id"), F.col("simhash").alias("r_sig"), "chunk", "val")
    cand = (
        l.join(r, ["chunk", "val"]).where(F.col("l_id") < F.col("r_id"))
        .select("l_id", "r_id", "l_sig", "r_sig").distinct()
    )
    ham = F.bit_count(F.col("l_sig").bitwiseXOR(F.col("r_sig")))
    return (
        cand.withColumn("hamming", ham.cast("int"))
        .where(F.col("hamming") <= hamming_k)
        .select("l_id", "r_id", "hamming")
    )


def ngram_jaccard_dedup(
    df: DataFrame, id_col: str, text_col: str, threshold: float = 0.8, qval: int = 3
) -> DataFrame:
    """Character-shingle near-dup detection: prefix-filtered jaccard
    self-join over padded q-grams."""
    from .joins.set_sim import jaccard_join

    out = jaccard_join(
        df, df, id_col, id_col, text_col, text_col,
        QgramTokenizer(qval=qval, padding=True), threshold,
        allow_empty=False, self_join=True,
    )
    return out.select(
        F.col(f"l_{id_col}").alias("l_id"),
        F.col(f"r_{id_col}").alias("r_id"),
        F.col("_sim_score").alias("jaccard_sim"),
    )


# ---------------------------------------------------------------------------
# Segment-level (line / paragraph) dedup — Lee et al., "Deduplicating
# Training Data Makes Language Models Better" (ACL 2022) motivate
# removing repeated SUBSTRINGS across a corpus, not only whole-doc
# duplicates: boilerplate lines (nav bars, license headers, cookie
# banners) recur across millions of pages. The suffix-array exact
# substring machinery is replaced here by its practical segment-level
# counterpart: split on line/paragraph boundaries, normalize
# whitespace, and dedup segments across documents.
# ---------------------------------------------------------------------------

_SEG_DELIM = {"line": "\n", "paragraph": "\n\n"}


def _segments(df: DataFrame, id_col: str, text_col: str, granularity: str,
              min_chars: int) -> DataFrame:
    """(id, seg_idx, seg) — normalized, non-empty segments.

    Normalization is deliberately replicable in ANSI SQL / DuckDB:
    collapse runs of [ \\t\\r] to one space, then trim spaces. seg_idx
    is the ORIGINAL split position so reassembly preserves relative
    order even after empty segments are dropped.
    """
    if granularity not in _SEG_DELIM:
        raise ValueError(f"granularity must be one of {sorted(_SEG_DELIM)}")
    base = df.select(F.col(id_col).alias("id"), F.col(text_col).alias("_t"))
    seg = (
        base.where(F.col("_t").isNotNull())
        .select("id", F.posexplode(F.split("_t", _SEG_DELIM[granularity]))
                .alias("seg_idx", "_raw"))
        .withColumn("seg", F.trim(F.regexp_replace("_raw", "[ \t\r]+", " ")))
        .where(F.length("seg") >= min_chars)
        .select("id", "seg_idx", "seg")
    )
    return seg


def segment_stats(
    df: DataFrame,
    id_col: str,
    text_col: str,
    granularity: str = "line",
    min_chars: int = 1,
) -> DataFrame:
    """Per-document segment duplication profile
    -> (id, n_segments, n_unique, intra_dup_ratio, n_cross_dup).

    - ``n_segments``: normalized non-empty segments in the doc.
    - ``n_unique``: distinct segment values within the doc.
    - ``intra_dup_ratio``: 1 - n_unique/n_segments (Gopher-style
      repeated-line fraction; Rae et al. 2021 use this family of
      repetition signals as quality filters).
    - ``n_cross_dup``: of the doc's distinct segments, how many also
      appear in at least one OTHER document.

    Scale shape: both aggregations partial-aggregate map-side. The
    cross-corpus count groups by ``xxhash64(seg)`` with the segment
    string carried only through the first (per-doc) level, so a
    billion-copy boilerplate line collapses to one row per (doc) at
    level one and one row at level two — never a window over
    occurrences. Docs with NULL text or no qualifying segments are
    reported with zero counts (not dropped).
    """
    seg = _segments(df, id_col, text_col, granularity, min_chars)
    # level 1: per (doc, segment) — map-side combine collapses
    # intra-doc repeats of the same line before any shuffle
    per_doc_seg = seg.groupBy("id", F.xxhash64("seg").alias("_h"), "seg").agg(
        F.count("*").alias("n_occ")
    )
    # level 2: per segment — distinct-doc count (input already one row
    # per (doc, segment))
    per_seg = per_doc_seg.groupBy("_h", "seg").agg(
        F.count("*").alias("n_docs")
    )
    joined = per_doc_seg.join(
        per_seg.withColumnRenamed("seg", "_gseg"), "_h"
    ).where(F.col("seg") == F.col("_gseg"))
    stats = joined.groupBy("id").agg(
        F.sum("n_occ").cast("int").alias("n_segments"),
        F.count("*").cast("int").alias("n_unique"),
        F.sum(F.when(F.col("n_docs") >= 2, 1).otherwise(0))
        .cast("int").alias("n_cross_dup"),
    )
    ids = df.select(F.col(id_col).alias("id")).distinct()
    return ids.join(stats, "id", "left").select(
        "id",
        F.coalesce("n_segments", F.lit(0)).alias("n_segments"),
        F.coalesce("n_unique", F.lit(0)).alias("n_unique"),
        F.when(F.coalesce("n_segments", F.lit(0)) > 0,
               F.round(1.0 - F.col("n_unique") / F.col("n_segments"), 6))
        .otherwise(F.lit(0.0)).alias("intra_dup_ratio"),
        F.coalesce("n_cross_dup", F.lit(0)).alias("n_cross_dup"),
    )


def segment_dedup(
    df: DataFrame,
    id_col: str,
    text_col: str,
    granularity: str = "line",
    min_chars: int = 1,
    min_docs: int = 2,
) -> DataFrame:
    """Cross-document segment dedup -> (id, clean_text, n_kept,
    n_dropped).

    A segment whose normalized value appears in >= ``min_docs``
    DISTINCT documents is kept only in its canonical document (the
    minimum id among documents containing it) and dropped from all
    others; segments below the bar are kept everywhere. ``clean_text``
    is the document rebuilt from its kept segments in original order,
    joined with the granularity delimiter. Docs with NULL text keep
    NULL; docs whose every segment was dropped get ''.

    Deterministic by construction (canonical = min id, order =
    original split position) — byte-identical across runs and
    engines, which is what the checkpoint/resume invariant needs.

    Scale shape: the per-segment verdict frame (one row per DISTINCT
    segment: n_docs + canonical id, built with map-side-combinable
    min/count aggs) is joined back to occurrences on the 8-byte
    xxhash64 key with a string-equality residual. A ubiquitous
    boilerplate segment makes that join key hot on the OCCURRENCE
    side only — AQE skew-join splits it (the verdict side is one row
    per key, so splitting is always legal). Reassembly groups by doc
    id — naturally balanced by doc length, never by segment
    popularity.
    """
    base = df.select(F.col(id_col).alias("id"), F.col(text_col).alias("_t"))
    seg = _segments(df, id_col, text_col, granularity, min_chars)
    per_doc_seg = seg.groupBy("id", F.xxhash64("seg").alias("_h"), "seg").agg(
        F.count("*").alias("n_occ")
    )
    verdict = per_doc_seg.groupBy("_h", "seg").agg(
        F.count("*").alias("n_docs"), F.min("id").alias("canon_id")
    )
    occ = seg.withColumn("_h", F.xxhash64("seg"))
    kept = (
        occ.join(verdict.withColumnRenamed("seg", "_gseg"), "_h")
        .where(F.col("seg") == F.col("_gseg"))
        .withColumn(
            "_keep",
            (F.col("n_docs") < min_docs) | (F.col("id") == F.col("canon_id")),
        )
    )
    rebuilt = (
        kept.groupBy("id").agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(F.col("_keep"),
                                   F.struct("seg_idx", "seg"))
                        )
                    ),
                    lambda s: s.seg,
                ),
                _SEG_DELIM[granularity],
            ).alias("clean_text"),
            F.sum(F.when(F.col("_keep"), 1).otherwise(0))
            .cast("int").alias("n_kept"),
            F.sum(F.when(F.col("_keep"), 0).otherwise(1))
            .cast("int").alias("n_dropped"),
        )
    )
    return base.join(rebuilt, "id", "left").select(
        "id",
        F.when(F.col("_t").isNull(), F.lit(None).cast("string"))
        .otherwise(F.coalesce("clean_text", F.lit(""))).alias("clean_text"),
        F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
        F.coalesce("n_dropped", F.lit(0)).alias("n_dropped"),
    )
