"""Golden regression oracles for the GAN trainers (cpu mesh, seeded).

Tolerance is 0.1% relative — 10x above observed run-to-run drift (values
reproduced exactly to 5 decimals across rounds 2 and 3), 10x tighter than
the 1% parity budget (round-2 VERDICT item 7).
"""

import numpy as np
import pytest

GOLDEN_DCGAN = {  # recorded 2026-08-16 (round 2: torch-exact BN running
    # stats), jax 0.9.0 CPU; 1 epoch, 4 batches. Reconfirmed exact
    # 2026-08-17 when the tolerance was tightened to 0.1%.
    "train_mse": 0.13356,
    "pred_mse": 0.12733,
}
GOLDEN_CYCLEGAN = {  # same setup
    "pred_mse": 0.12243,
    "cycle_l1": 0.30973,
}
TOL = 1e-3


@pytest.mark.slow
def test_golden_dcgan_curve(tmp_path):
    from extended_gan_tpu.train.dcgan_driver import train

    states, history = train(
        epochs=1, train_batch_size=8, test_batch_size=8, max_batches=4,
        synthetic=True, out_dir=str(tmp_path), seed=777,
        params={"ndf": 8, "imsize": 64},
    )
    h = history.history
    print("observed dcgan:", {k: round(h[k][-1], 5)
                              for k in ("train_mse", "pred_mse")})
    for k, g in GOLDEN_DCGAN.items():
        assert abs(h[k][-1] - g) / g < TOL, (k, h[k][-1], g)


@pytest.mark.slow
def test_golden_cyclegan_curve(tmp_path):
    from extended_gan_tpu.train.cyclegan_driver import train

    states, history = train(
        epochs=1, train_batch_size=8, test_batch_size=8, max_batches=4,
        imsize=64, ndf=8, synthetic=True, out_dir=str(tmp_path), seed=777,
    )
    h = history.history
    print("observed cyclegan:", {k: round(h[k][-1], 5)
                                 for k in ("pred_mse", "cycle_l1")})
    for k, g in GOLDEN_CYCLEGAN.items():
        assert abs(h[k][-1] - g) / g < TOL, (k, h[k][-1], g)
