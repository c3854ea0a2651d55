from .state import NetState, create_net_state, param_count
from .optim import (
    adam,
    sgd,
    make_optimizer,
    StepLR,
    ReduceLROnPlateau,
    get_learning_rate,
    set_learning_rate,
)
from .losses import bce, mse, l1, CRITERIA
from .adversarial import (
    make_vanilla_gan_step,
    make_sampler,
    apply_eval,
)
from .module import TrainModule, Trainer
from .checkpoint import save_model, load_model, CheckpointManager

__all__ = [
    "NetState",
    "create_net_state",
    "param_count",
    "adam",
    "sgd",
    "make_optimizer",
    "StepLR",
    "ReduceLROnPlateau",
    "get_learning_rate",
    "set_learning_rate",
    "bce",
    "mse",
    "l1",
    "CRITERIA",
    "make_vanilla_gan_step",
    "make_sampler",
    "apply_eval",
    "TrainModule",
    "Trainer",
    "save_model",
    "load_model",
    "CheckpointManager",
]
