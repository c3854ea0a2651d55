from extended_gan_tpu.preprocess.arai import preprocess  # noqa: F401
