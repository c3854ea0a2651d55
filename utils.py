"""Top-level utils — parity shim for /root/reference/utils.py (viz +
history + thresholded metrics + denormalize)."""

from extended_gan_tpu.utils import (  # noqa: F401
    denormalize,
    get_metrics,
    get_number_parameters,
    plot_history,
    update_history,
)
from extended_gan_tpu.utils.viz import visualize_predictions  # noqa: F401
