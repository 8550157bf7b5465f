"""sparksimjoin — PySpark-native record-linkage / string-similarity
join engine (filter-verify paradigm of py_stringsimjoin, re-expressed
as Catalyst-optimized DataFrame plans; SURVEY.md)."""

from .tokenizers import (
    AlphanumericTokenizer,
    DelimiterTokenizer,
    QgramTokenizer,
    Tokenizer,
    WhitespaceTokenizer,
)
from .joins.set_sim import (
    cosine_join,
    dice_join,
    jaccard_join,
    overlap_coefficient_join,
    overlap_join,
    set_sim_join,
)
from .joins.edit_distance import edit_distance_join
from .session import get_spark

__all__ = [
    "AlphanumericTokenizer",
    "DelimiterTokenizer",
    "QgramTokenizer",
    "Tokenizer",
    "WhitespaceTokenizer",
    "cosine_join",
    "dice_join",
    "edit_distance_join",
    "get_spark",
    "jaccard_join",
    "overlap_coefficient_join",
    "overlap_join",
    "set_sim_join",
]
