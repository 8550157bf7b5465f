from __future__ import annotations

import re

import pytest

from sparksimjoin.pii import PII_PATTERNS, pii_redact, pii_scan

ROWS = [
    (1, "mail me at jane.doe+spam@corp.example.com or bob@x.io today"),
    (2, "ssn 123-45-6789 card 1234-5678-9012-3456 phone 555-123-4567"),
    (3, "server at 10.0.3.217 and 192.168.001.1; dotted phone 555.123.4567"),
    (4, None),
    (5, "no pii here, just 12345 and v1.2.3 and a-b-c"),
    (6, "two mails: a@b.co c@d.org and twice 555-000-1111 555-000-1111"),
]


def _py_counts(text: str | None) -> dict[str, int]:
    if text is None:
        return {t: 0 for t in PII_PATTERNS}
    return {t: len(re.findall(p, text)) for t, p in PII_PATTERNS.items()}


def _py_redact(text: str | None) -> str | None:
    if text is None:
        return None
    for t, p in PII_PATTERNS.items():
        text = re.sub(p, f"[{t.upper()}_REDACTED]", text)
    return text


def test_scan_matches_python_re(spark):
    df = spark.createDataFrame(ROWS, "doc_id long, text string")
    got = {r.id: r.asDict() for r in pii_scan(df, "doc_id", "text").collect()}
    for i, text in ROWS:
        want = _py_counts(text)
        for t in PII_PATTERNS:
            assert got[i][f"n_{t}"] == want[t], (i, t)
        assert got[i]["n_pii"] == sum(want.values())


def test_redact_matches_python_re(spark):
    df = spark.createDataFrame(ROWS, "doc_id long, text string")
    got = {r.id: r.redacted for r in pii_redact(df, "doc_id", "text").collect()}
    assert got == {i: _py_redact(t) for i, t in ROWS}


def test_redact_idempotent(spark):
    df = spark.createDataFrame(ROWS, "doc_id long, text string")
    once = pii_redact(df, "doc_id", "text")
    twice = pii_redact(once, "id", "redacted")
    assert sorted(r.redacted for r in once.collect() if r.redacted) == sorted(
        r.redacted for r in twice.collect() if r.redacted
    )


def test_known_values(spark):
    df = spark.createDataFrame(ROWS, "doc_id long, text string")
    got = {r.id: r.asDict() for r in pii_scan(df, "doc_id", "text").collect()}
    assert got[1]["n_email"] == 2 and got[1]["n_pii"] == 2
    assert (got[2]["n_ssn"], got[2]["n_credit_card"], got[2]["n_phone"]) == (1, 1, 1)
    assert got[3]["n_ipv4"] == 2 and got[3]["n_phone"] == 1
    assert got[4]["n_pii"] == 0
    assert got[5]["n_pii"] == 0
    assert got[6]["n_email"] == 2 and got[6]["n_phone"] == 2


def test_type_subset_and_canonical_order(spark):
    df = spark.createDataFrame([(1, "a@b.co 555-123-4567")], "doc_id long, text string")
    out = pii_scan(df, "doc_id", "text", types=["phone", "email"])
    assert [c for c in out.columns if c.startswith("n_")] == [
        "n_email", "n_phone", "n_pii"
    ]
    row = out.collect()[0]
    assert (row.n_email, row.n_phone, row.n_pii) == (1, 1, 2)


def test_validation(spark):
    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError):
        pii_scan(df, "doc_id", "text", types=["email", "dna"])
    with pytest.raises(Exception):
        pii_redact(df, "nope", "text")
