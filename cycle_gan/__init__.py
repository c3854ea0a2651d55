"""`python -m cycle_gan` — CycleGAN frame-prediction (TPU-native).

The working realization of the reference cycle_gan package's intent
(/root/reference/cycle_gan/README.md: dual G/D pairs + cycle-consistency).
"""

from extended_gan_tpu.train.cyclegan_driver import train, build_cyclegan  # noqa: F401
from extended_gan_tpu.train.cyclegan_trainer import (  # noqa: F401
    CycleGANStates,
    make_cyclegan_train_step,
    make_cyclegan_eval_step,
)
