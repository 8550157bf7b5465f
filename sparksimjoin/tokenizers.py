"""Tokenizers with dual implementations: a Spark ``Column`` expression
(JVM-side, whole-stage-codegen'd — no Python in the hot path) and a
plain-Python ``tokenize`` used by the naive test oracle and
``filter_pair`` semantics.

Semantics mirror the reference's py_stringmatching tokenizers
(``[R] py_stringsimjoin`` call sites pass QgramTokenizer /
WhitespaceTokenizer / DelimiterTokenizer / AlphanumericTokenizer;
see SURVEY.md §2.1 #16-17):

- QgramTokenizer(qval, padding, prefix_pad, suffix_pad, return_set):
  pads with qval-1 pad chars each side, slides a q-char window.
  Without padding, strings shorter than q produce no tokens.
- WhitespaceTokenizer: ``str.split()`` (any whitespace run, empties
  dropped).
- DelimiterTokenizer: split on a single delimiter string.
- AlphanumericTokenizer: maximal [a-zA-Z0-9]+ runs.

``return_set=True`` dedupes preserving first occurrence (the order is
irrelevant downstream — the join re-orders tokens globally).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import Column
from pyspark.sql import functions as F


def _dedupe(tokens: list[str]) -> list[str]:
    seen: set[str] = set()
    out = []
    for t in tokens:
        if t not in seen:
            seen.add(t)
            out.append(t)
    return out


@dataclass(frozen=True)
class Tokenizer:
    return_set: bool = False

    def tokenize(self, s: str) -> list[str]:  # pragma: no cover - abstract
        raise NotImplementedError

    def spark_expr(self, col: Column) -> Column:  # pragma: no cover - abstract
        raise NotImplementedError

    def with_return_set(self, return_set: bool) -> "Tokenizer":
        if self.return_set == return_set:
            return self
        kwargs = {f.name: getattr(self, f.name) for f in self.__dataclass_fields__.values()}  # type: ignore[attr-defined]
        kwargs["return_set"] = return_set
        return type(self)(**kwargs)

    def _maybe_set_py(self, tokens: list[str]) -> list[str]:
        return _dedupe(tokens) if self.return_set else tokens

    def _maybe_set_sql(self, arr: Column) -> Column:
        return F.array_distinct(arr) if self.return_set else arr


@dataclass(frozen=True)
class QgramTokenizer(Tokenizer):
    qval: int = 2
    padding: bool = True
    prefix_pad: str = "#"
    suffix_pad: str = "$"

    def tokenize(self, s: str) -> list[str]:
        if s is None:
            return []
        if self.padding:
            s = self.prefix_pad * (self.qval - 1) + s + self.suffix_pad * (self.qval - 1)
        n = len(s) - self.qval + 1
        toks = [s[i : i + self.qval] for i in range(max(n, 0))]
        return self._maybe_set_py(toks)

    def spark_expr(self, col: Column) -> Column:
        q = self.qval
        padded = (
            F.concat(F.lit(self.prefix_pad * (q - 1)), col, F.lit(self.suffix_pad * (q - 1)))
            if self.padding
            else col
        )
        n = F.length(padded) - F.lit(q - 1)
        grams = F.when(
            n >= 1,
            F.transform(F.sequence(F.lit(1), n), lambda i: F.substring(padded, i, q)),
        ).otherwise(F.array().cast("array<string>"))
        return self._maybe_set_sql(grams)


@dataclass(frozen=True)
class WhitespaceTokenizer(Tokenizer):
    def tokenize(self, s: str) -> list[str]:
        if s is None:
            return []
        return self._maybe_set_py(s.split())

    def spark_expr(self, col: Column) -> Column:
        # (?U) = Java UNICODE_CHARACTER_CLASS so \s matches the same
        # non-ASCII whitespace (NBSP, U+2028, ideographic space, ...)
        # that the Python twin's str.split() treats as separators;
        # ASCII \s+ alone would tokenize non-ASCII input differently
        # from the oracle/filter_pair path. \x1c-\x1f (file/group/
        # record/unit separators) are added explicitly: Python's
        # str.split() treats them as whitespace but they lack the
        # Unicode White_Space property, so (?U)\s misses them.
        arr = F.filter(F.split(col, r"(?U)[\s\x1c-\x1f]+"), lambda x: x != "")
        return self._maybe_set_sql(arr)


@dataclass(frozen=True)
class DelimiterTokenizer(Tokenizer):
    delim: str = " "

    def tokenize(self, s: str) -> list[str]:
        if s is None:
            return []
        toks = [t for t in s.split(self.delim) if t != ""]
        return self._maybe_set_py(toks)

    def spark_expr(self, col: Column) -> Column:
        arr = F.filter(F.split(col, re.escape(self.delim)), lambda x: x != "")
        return self._maybe_set_sql(arr)


@dataclass(frozen=True)
class AlphanumericTokenizer(Tokenizer):
    def tokenize(self, s: str) -> list[str]:
        if s is None:
            return []
        return self._maybe_set_py(re.findall(r"[a-zA-Z0-9]+", s))

    def spark_expr(self, col: Column) -> Column:
        arr = F.filter(F.split(col, r"[^a-zA-Z0-9]+"), lambda x: x != "")
        return self._maybe_set_sql(arr)


@dataclass(frozen=True)
class AlphabeticTokenizer(Tokenizer):
    """Maximal runs of ASCII letters (py_stringmatching's
    AlphabeticTokenizer; digits and punctuation are separators)."""

    def tokenize(self, s: str) -> list[str]:
        if s is None:
            return []
        return self._maybe_set_py(re.findall(r"[a-zA-Z]+", s))

    def spark_expr(self, col: Column) -> Column:
        arr = F.filter(F.split(col, r"[^a-zA-Z]+"), lambda x: x != "")
        return self._maybe_set_sql(arr)
