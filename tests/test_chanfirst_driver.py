"""conv_impl='chanfirst' through the real driver (launchable surface)."""

import numpy as np
import pytest


@pytest.mark.slow
def test_gat_driver_trains_with_chanfirst(tmp_path):
    from extended_gan_tpu.train.gat_driver import train

    _, history = train(
        model_type="temporal", mapping_type="conv", dataset="synthetic",
        epochs=1, train_batch_size=8, test_batch_size=8, max_batches=2,
        downsample_size=(12, 12), conv_impl="chanfirst", plot=False,
        output_path=str(tmp_path), seed=3,
    )
    assert np.isfinite(history["train_loss"][0])
    assert np.isfinite(history["val_loss"][-1])
