"""`python -m convolutional_gat` — conv-GAT / SmaAt-UNet frame-prediction
pipeline (TPU-native).

Entry-point parity with the reference's convolutional_gat package
(/root/reference/convolutional_gat/__main__.py). Implementation lives in
extended_gan_tpu; this package is the CLI + experiment-dir surface.
"""

from extended_gan_tpu.train.gat_driver import train  # noqa: F401
from extended_gan_tpu.train.gat_trainer import test  # noqa: F401
from extended_gan_tpu.models.registry import model_classes, build_model  # noqa: F401
from extended_gan_tpu.models.gat import (  # noqa: F401
    BaselineModel,
    BaselineModel2D,
    GATMultiHead3D,
    Model,
    SpatialModel,
    TemporalModel,
    TemporalModel4h,
    TemporalModel2l,
    MultiStreamModel,
)
from extended_gan_tpu.models.unet_model import UnetModel  # noqa: F401
