from .verification import roc_curve, tar_at_far, eer, verification_metrics
from .search import cumulative_match_curve, rank_k_accuracy, mean_average_precision

__all__ = ["roc_curve", "tar_at_far", "eer", "verification_metrics",
           "cumulative_match_curve", "rank_k_accuracy",
           "mean_average_precision"]
