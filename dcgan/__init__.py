"""`python -m dcgan` — DCGAN-style frame-prediction GAN (TPU-native).

Entry-point parity with the reference's dcgan package
(/root/reference/dcgan/__main__.py). Implementation lives in
extended_gan_tpu; this package is the CLI surface.
"""

from extended_gan_tpu.train.dcgan_driver import train, build_dcgan  # noqa: F401
from extended_gan_tpu.train.dcgan_trainer import (  # noqa: F401
    test,
    train_single_epoch,
    make_dcgan_train_step,
    make_dcgan_eval_step,
)
from extended_gan_tpu.models.dcgan import (  # noqa: F401
    ConvBlock,
    Generator,
    FrameDiscriminator,
    TemporalDiscriminator,
)
