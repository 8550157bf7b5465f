"""sparksimjoin — PySpark-native record-linkage / string-similarity
join engine (filter-verify paradigm of py_stringsimjoin, re-expressed
as Catalyst-optimized DataFrame plans; SURVEY.md)."""

from .tokenizers import (
    AlphabeticTokenizer,
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
from .joins.hamming import hamming_join
from .joins.jaro import jaro_join, jaro_winkler_join
from .joins.monge_elkan import generalized_jaccard_join, monge_elkan_join
from .joins.soft_tfidf import soft_tfidf_join
from .joins.tfidf import tfidf_join
from .joins.tversky import tversky_index_join
from .alignment import Affine, NeedlemanWunsch, SmithWaterman
from .simfunctions import (BagDistance, Editex, GeneralizedJaccard,
                           HammingDistance, Soundex, TfIdf, TverskyIndex)
from .fuzz import (partial_ratio, partial_token_sort_ratio, ratio,
                   token_set_ratio, token_sort_ratio)
from .features import (DEFAULT_FEATURES, attr_equivalence_block,
                       featurize_numeric_pairs, featurize_pairs,
                       match_by_rules, union_candsets)
from .joins.weighted import (weighted_cosine_join, weighted_dice_join,
                             weighted_jaccard_join)
from .ml import apply_ml_matcher, train_match_model
from .ranking import topk_pairs
from .evaluation import (bcubed_contributions, bcubed_metrics,
                         best_threshold, clustering_pairwise_metrics,
                         pair_metrics, threshold_sweep)
from .cache import release_all, scoped_caches
from .session import get_spark
from .matcher import apply_matcher
from .missing import get_pairs_with_missing_value
from .estimate import estimate_hybrid_join_cost, estimate_join_cost
from .profiler import profile_table_for_join
from .converter import column_to_str
from .clustering import connected_components, refine_clusters
from .pipeline import PipelineConfig, pairwise_f1, prepare_records, run_pipeline
from .audit import cluster_audit, cluster_audit_chain
from .fellegi_sunter import (Comparison, TfAdjustment, comparison_vectors,
                             estimate_u, fellegi_sunter, load_fs_params,
                             sampled_pairs, save_fs_params,
                             score_with_params, term_frequencies)

__all__ = [
    "Affine",
    "AlphabeticTokenizer",
    "AlphanumericTokenizer",
    "BagDistance",
    "Editex",
    "GeneralizedJaccard",
    "HammingDistance",
    "Soundex",
    "TfIdf",
    "TverskyIndex",
    "partial_ratio",
    "partial_token_sort_ratio",
    "ratio",
    "token_set_ratio",
    "token_sort_ratio",
    "NeedlemanWunsch",
    "SmithWaterman",
    "DelimiterTokenizer",
    "PipelineConfig",
    "QgramTokenizer",
    "Tokenizer",
    "WhitespaceTokenizer",
    "apply_matcher",
    "cluster_audit",
    "cluster_audit_chain",
    "bcubed_contributions",
    "bcubed_metrics",
    "best_threshold",
    "clustering_pairwise_metrics",
    "column_to_str",
    "comparison_vectors",
    "Comparison",
    "TfAdjustment",
    "estimate_u",
    "fellegi_sunter",
    "load_fs_params",
    "sampled_pairs",
    "save_fs_params",
    "score_with_params",
    "term_frequencies",
    "connected_components",
    "refine_clusters",
    "cosine_join",
    "dice_join",
    "edit_distance_join",
    "estimate_join_cost",
    "get_pairs_with_missing_value",
    "get_spark",
    "hamming_join",
    "jaccard_join",
    "generalized_jaccard_join",
    "jaro_join",
    "monge_elkan_join",
    "soft_tfidf_join",
    "tfidf_join",
    "train_match_model",
    "apply_ml_matcher",
    "jaro_winkler_join",
    "overlap_coefficient_join",
    "overlap_join",
    "pair_metrics",
    "threshold_sweep",
    "tversky_index_join",
    "DEFAULT_FEATURES",
    "attr_equivalence_block",
    "featurize_pairs",
    "match_by_rules",
    "union_candsets",
    "pairwise_f1",
    "prepare_records",
    "profile_table_for_join",
    "release_all",
    "run_pipeline",
    "scoped_caches",
    "set_sim_join",
    "topk_pairs",
    "weighted_cosine_join",
    "weighted_dice_join",
    "weighted_jaccard_join",
]
