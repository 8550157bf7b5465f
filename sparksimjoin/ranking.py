"""Per-record top-k match ranking over scored candidate pairs.

A record-linkage extra beyond the reference surface (the upstream
package returns the full thresholded pair set; SURVEY.md §2 extras):
real ER pipelines cap each record's match list before human review or
clustering — "give me the k best candidate matches per record, with a
deterministic tie-break".

Scale notes (100 TB):
- ``topk_pairs`` is ONE keyed shuffle: ``row_number`` over a window
  partitioned by the record id. Key cardinality is the record count
  (millions+), so the shuffle is well-spread by construction; per-key
  sort depth is each record's candidate count, already bounded by the
  upstream filter-verify pruning. No global sort, no driver collect.
- Ties are broken deterministically (score DESC, then partner id ASC)
  so the output is stable across partitionings and re-runs — required
  for the byte-identical checkpoint/resume contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def topk_pairs(
    scored: DataFrame,
    k: int,
    id_col: str = "l_id",
    partner_col: str = "r_id",
    score_col: str = "_sim_score",
    rank_out: str = "rank",
) -> DataFrame:
    """Keep each ``id_col`` record's ``k`` best-scoring pairs.

    Deterministic ordering: ``score_col`` descending, ``partner_col``
    ascending on ties. Adds ``rank_out`` (1-based dense position by
    ``row_number`` — exactly k rows survive per record even when
    scores tie).
    """
    if k < 1:
        raise ValueError(f"k must be >= 1 (got {k})")
    for c in (id_col, partner_col, score_col):
        if c not in scored.columns:
            raise ValueError(f"column {c!r} not in scored pairs {scored.columns}")
    w = Window.partitionBy(id_col).orderBy(
        F.col(score_col).desc(), F.col(partner_col).asc()
    )
    return (
        scored.withColumn(rank_out, F.row_number().over(w))
        .filter(F.col(rank_out) <= k)
    )
