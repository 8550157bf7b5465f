from .overlap_filter import OverlapFilter
from .size_filter import SizeFilter
from .prefix_filter import PrefixFilter
from .position_filter import PositionFilter
from .suffix_filter import SuffixFilter

__all__ = ["OverlapFilter", "SizeFilter", "PrefixFilter", "PositionFilter", "SuffixFilter"]
