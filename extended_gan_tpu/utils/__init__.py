from .metrics import (
    IncrementalTuple,
    MetricsManager,
    batch_metrics,
    thresholded_metrics,
    get_metrics,
    accuracy_criterion,
    rounded_match_nd,
    denormalize,
    nowcast_scores,
)
from .history import (
    TrainingHistory,
    update_history,
    plot_history,
    save_history_json,
)


def get_number_parameters(params) -> int:
    """Total trainable parameter count of a pytree (reference:
    dcgan/utils.py:63-64)."""
    import jax

    return sum(x.size for x in jax.tree_util.tree_leaves(params))


__all__ = [
    "IncrementalTuple",
    "MetricsManager",
    "batch_metrics",
    "thresholded_metrics",
    "get_metrics",
    "accuracy_criterion",
    "rounded_match_nd",
    "denormalize",
    "nowcast_scores",
    "TrainingHistory",
    "update_history",
    "plot_history",
    "save_history_json",
    "get_number_parameters",
]
