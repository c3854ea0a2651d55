from .vanilla_gan import MLPGenerator, MLPDiscriminator
from .dcgan import (
    ConvBlock,
    Generator,
    FrameDiscriminator,
    TemporalDiscriminator,
)
from .smaat_unet import SmaAt_UNet
from .unet_model import UnetModel
from .registry import model_classes, build_model

__all__ = [
    "MLPGenerator",
    "MLPDiscriminator",
    "ConvBlock",
    "Generator",
    "FrameDiscriminator",
    "TemporalDiscriminator",
    "SmaAt_UNet",
    "UnetModel",
    "model_classes",
    "build_model",
]
