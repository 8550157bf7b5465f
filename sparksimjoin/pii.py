"""PII detection and redaction for training-data pipelines (beyond
the reference surface; task brief's LLM-pipeline extras).

Scrubbing personally-identifiable information is a standard step
before text lands in a training corpus. This module provides two
operators over a text column:

- ``pii_scan``   — per-document match counts for each PII type
  (audit / filtering signal);
- ``pii_redact`` — the text with every match replaced by a typed
  placeholder (``[EMAIL_REDACTED]`` etc.), applied in a fixed,
  documented order so output is deterministic.

Both are **pure Column expressions** (``regexp_count`` /
``regexp_replace`` — whole-stage codegen, zero Python in the hot
path, no shuffle at all: this is a map-only operator that scales
embarrassingly to any corpus size and pushes column pruning into the
scan).

Pattern portability: Spark compiles Java ``java.util.regex``; the
DuckDB oracle compiles RE2. Every pattern below stays inside the
common subset — character classes, bounded repetition, non-capturing
groups, ASCII ``\\b`` word boundaries; no lookaround, no
backreferences — so both engines match the identical spans and the
oracle can replicate counts and redacted text byte-for-byte
(``__spark_entry__.py`` ``pii_doc``).

These are pragmatic high-precision patterns (the classic regex tier
of PII scrubbing), not an NER model; plug a model-based detector in
via ``apply_matcher``-style pandas UDFs where recall on names and
addresses matters.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .validation import validate_attr

#: detection/redaction order is the dict order: specific → general,
#: so e.g. a credit-card number is consumed before the phone pattern
#: could ever see its digit groups.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ssn": r"\b\d{3}-\d{2}-\d{4}\b",
    "credit_card": r"\b\d{4}[- ]\d{4}[- ]\d{4}[- ]\d{4}\b",
    "phone": r"\b\d{3}[-.]\d{3}[-.]\d{4}\b",
    "ipv4": r"\b(?:\d{1,3}\.){3}\d{1,3}\b",
}


def _check_types(types: list[str] | None) -> list[str]:
    if types is None:
        return list(PII_PATTERNS)
    unknown = [t for t in types if t not in PII_PATTERNS]
    if unknown:
        raise ValueError(
            f"unknown PII type(s) {unknown}; available: {list(PII_PATTERNS)}"
        )
    # keep the canonical order regardless of caller order — redaction
    # order is part of the operator's deterministic contract
    return [t for t in PII_PATTERNS if t in types]


def pii_count(col: Column, pii_type: str) -> Column:
    """Match count of one PII type in a text column (0 for NULL)."""
    return F.coalesce(
        F.regexp_count(col, F.lit(PII_PATTERNS[pii_type])), F.lit(0)
    ).cast("int")


def pii_redact_expr(col: Column, types: list[str] | None = None) -> Column:
    """Text with every PII match replaced by ``[<TYPE>_REDACTED]``,
    applied in the canonical PII_PATTERNS order. NULL stays NULL."""
    out = col
    for t in _check_types(types):
        out = F.regexp_replace(
            out, F.lit(PII_PATTERNS[t]), F.lit(f"[{t.upper()}_REDACTED]")
        )
    return out


def pii_scan(
    df: DataFrame,
    key_attr: str,
    text_attr: str,
    types: list[str] | None = None,
) -> DataFrame:
    """Per-document PII profile: ``id``, one ``n_<type>`` int column
    per requested type, and ``n_pii`` (their sum). Counts are each
    computed on the ORIGINAL text, independently per type."""
    validate_attr(df, key_attr, "table")
    validate_attr(df, text_attr, "table")
    ts = _check_types(types)
    counts = [pii_count(F.col(text_attr), t).alias(f"n_{t}") for t in ts]
    out = df.select(F.col(key_attr).alias("id"), *counts)
    total = sum((F.col(f"n_{t}") for t in ts), F.lit(0))
    return out.withColumn("n_pii", total.cast("int"))


def pii_redact(
    df: DataFrame,
    key_attr: str,
    text_attr: str,
    types: list[str] | None = None,
) -> DataFrame:
    """``id`` + ``redacted`` text column (placeholders substituted in
    the canonical order; idempotent — placeholders contain no
    redactable spans)."""
    validate_attr(df, key_attr, "table")
    validate_attr(df, text_attr, "table")
    return df.select(
        F.col(key_attr).alias("id"),
        pii_redact_expr(F.col(text_attr), types).alias("redacted"),
    )
