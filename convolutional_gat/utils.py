"""Parity shim for /root/reference/convolutional_gat/utils.py: the registry,
viz, history and metric helpers live in extended_gan_tpu."""

from extended_gan_tpu.models.registry import model_classes  # noqa: F401
from extended_gan_tpu.utils import (  # noqa: F401
    denormalize,
    get_metrics,
    get_number_parameters,
    plot_history,
    update_history,
)
from extended_gan_tpu.utils.term import term_display  # noqa: F401
from extended_gan_tpu.utils.viz import (  # noqa: F401
    visualize_gat_predictions as visualize_predictions,
)


def model_persistence(x):
    """Last-input-frame persistence baseline (reference utils.py:307-308),
    on (B, H, W, T, V) batches: repeat the last context frame."""
    import numpy as np

    last = np.asarray(x)[:, :, :, -1:, :]
    return np.repeat(last, x.shape[3], axis=3)
