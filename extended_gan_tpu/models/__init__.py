from .vanilla_gan import MLPGenerator, MLPDiscriminator

__all__ = ["MLPGenerator", "MLPDiscriminator"]
