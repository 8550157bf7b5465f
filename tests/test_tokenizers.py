from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sparksimjoin.tokenizers import (
    AlphabeticTokenizer,
    AlphanumericTokenizer,
    DelimiterTokenizer,
    QgramTokenizer,
    WhitespaceTokenizer,
)

CASES = [
    "hello world",
    "  leading and   trailing  ",
    "",
    "x",
    "ab",
    "one,two;three four",
    "MiXeD CaSe 123",
    # non-ASCII whitespace: NBSP, line/para separators, em-space,
    # ideographic space — Spark (?U)\s+ must agree with str.split()
    "a b c d e　f",
    "ααβ unicode ßtr",
    "a  b",
]

TOKENIZERS = [
    QgramTokenizer(qval=2, padding=True),
    QgramTokenizer(qval=3, padding=True),
    QgramTokenizer(qval=2, padding=False),
    QgramTokenizer(qval=2, padding=True, return_set=True),
    WhitespaceTokenizer(),
    WhitespaceTokenizer(return_set=True),
    DelimiterTokenizer(delim=","),
    AlphanumericTokenizer(),
    AlphabeticTokenizer(),
    AlphabeticTokenizer(return_set=True),
]


@pytest.mark.parametrize("tok", TOKENIZERS, ids=lambda t: repr(t))
def test_spark_expr_matches_python(spark, tok):
    df = spark.createDataFrame([(i, s) for i, s in enumerate(CASES)], ["id", "s"])
    got = {
        r["id"]: r["toks"]
        for r in df.select("id", tok.spark_expr(F.col("s")).alias("toks")).collect()
    }
    for i, s in enumerate(CASES):
        expected = tok.tokenize(s)
        # spark preserves multiset but may order set-dedupe differently;
        # dedupe order is irrelevant downstream (global reordering) so
        # compare as multisets for return_set=False, sets otherwise
        if tok.return_set:
            assert sorted(got[i]) == sorted(expected), (s, tok)
        else:
            assert got[i] == expected, (s, tok)


def test_qgram_padding_semantics():
    t = QgramTokenizer(qval=2, padding=True)
    assert t.tokenize("") == ["#$"]
    assert t.tokenize("a") == ["#a", "a$"]
    t3 = QgramTokenizer(qval=3, padding=True)
    assert t3.tokenize("ab") == ["##a", "#ab", "ab$", "b$$"]
    nopad = QgramTokenizer(qval=3, padding=False)
    assert nopad.tokenize("ab") == []


def test_with_return_set_roundtrip():
    t = QgramTokenizer(qval=3, padding=False)
    s = t.with_return_set(True)
    assert s.qval == 3 and s.padding is False and s.return_set is True
    assert s.with_return_set(True) is s


def test_ws_oracle_regex_matches_python_split():
    """The DuckDB oracle's explicit whitespace class (RE2 \\s is
    ASCII-only) must split exactly like Python str.split() — i.e. like
    the engine's WhitespaceTokenizer — on every Unicode whitespace
    codepoint including \\x1c-\\x1f."""
    import duckdb

    import __spark_entry__ as entry

    ws_chars = [c for c in map(chr, range(0x11000)) if c.isspace()]
    probe = "a" + "".join(f"{c}t{i}" for i, c in enumerate(ws_chars))
    got = duckdb.sql(
        "SELECT list_filter(string_split_regex(?, ?), x -> x <> '')",
        params=[probe, entry._WS_RE],
    ).fetchone()[0]
    assert got == probe.split()
    # and a non-separator control char must NOT split
    assert duckdb.sql(
        "SELECT string_split_regex(?, ?)", params=["a\x00b", entry._WS_RE]
    ).fetchone()[0] == ["a\x00b"]
