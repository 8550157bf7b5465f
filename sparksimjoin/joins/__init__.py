from .set_sim import (
    cosine_join,
    dice_join,
    jaccard_join,
    overlap_coefficient_join,
    overlap_join,
    set_sim_join,
)
from .edit_distance import edit_distance_join
from .hamming import hamming_join
from .jaro import jaro_join, jaro_winkler_join
from .tversky import tversky_index_join

__all__ = [
    "cosine_join",
    "dice_join",
    "edit_distance_join",
    "hamming_join",
    "jaccard_join",
    "jaro_join",
    "jaro_winkler_join",
    "overlap_coefficient_join",
    "overlap_join",
    "set_sim_join",
    "tversky_index_join",
]
