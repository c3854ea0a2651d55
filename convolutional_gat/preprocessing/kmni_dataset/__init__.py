from extended_gan_tpu.preprocess.kmni import (  # noqa: F401
    preprocess,
    test_split,
    get_z_score_normalizing_constants,
)
