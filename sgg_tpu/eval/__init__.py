"""Evaluation: Recall@K / mean-Recall / zero- and k-shot protocol."""

from sgg_tpu.eval.sgg_eval import (  # noqa: F401
    MeanRecallEvaluator, SGGEvaluator, argsort_desc, evaluate_recall,
    intersect_2d, normalize_counts, rank_predicted_rels, recall_at_ks,
    triplet_key,
)
from sgg_tpu.eval.surgery import filter_dets, rank_pairs  # noqa: F401
