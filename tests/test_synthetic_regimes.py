"""Mixed weather regimes in the synthetic KNMI generator.

data/synthetic.py REGIMES backs the heterogeneous-archive Switch-MoE A/B
(scripts/probe_moe_regimes.py): "storm" files must be statistically
distinct from "drizzle" files (intensity and motion), regime=None must
reproduce the original generator byte-for-byte (cache dirs and goldens
from earlier rounds stay valid), and make_kmni_dataset(regimes=...) must
alternate regimes across files.
"""

import numpy as np

from extended_gan_tpu.data.synthetic import (
    REGIMES,
    _rain_video,
    make_kmni_dataset,
)


def test_regime_none_is_byte_identical_to_pre_regime_generator():
    # the exact pre-REGIMES sampling order: pos, vel(+-1.5), sig(.06-.22),
    # amp(.4-1.0)
    def legacy(rng, n_frames, h, w, n_cells=4):
        yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
        pos = rng.uniform([0, 0], [h, w], (n_cells, 2)).astype(np.float32)
        vel = rng.uniform(-1.5, 1.5, (n_cells, 2)).astype(np.float32)
        sig = rng.uniform(min(h, w) * 0.06, min(h, w) * 0.22,
                          n_cells).astype(np.float32)
        amp = rng.uniform(0.4, 1.0, n_cells).astype(np.float32)
        frames = np.zeros((n_frames, h, w), np.float32)
        for t in range(n_frames):
            for c in range(n_cells):
                cy, cx = pos[c] + vel[c] * t
                cy, cx = cy % h, cx % w
                d2 = (yy - cy) ** 2 + (xx - cx) ** 2
                frames[t] += amp[c] * np.exp(-d2 / (2 * sig[c] ** 2))
        return np.clip(frames, 0, 1)

    a = _rain_video(np.random.default_rng(5), 6, 24, 24)
    b = legacy(np.random.default_rng(5), 6, 24, 24)
    np.testing.assert_array_equal(a, b)


def test_storm_and_drizzle_are_statistically_distinct():
    rng_s = np.random.default_rng(3)
    rng_d = np.random.default_rng(3)
    storm = _rain_video(rng_s, 12, 40, 40, regime="storm")
    drizzle = _rain_video(rng_d, 12, 40, 40, regime="drizzle")
    # intensity: storm cells are bright, drizzle faint
    assert storm.mean() > 3 * drizzle.mean()
    # motion: absolute frame-to-frame change (storm = intense AND fast)
    def motion(v):
        return np.abs(np.diff(v, axis=0)).mean()
    assert motion(storm) > 3 * motion(drizzle)


def test_make_kmni_dataset_alternates_regimes(tmp_path):
    out = str(tmp_path / "mixed")
    make_kmni_dataset(out, n_train_files=4, n_test_files=0,
                      frames_per_file=6, n_vertices=2, hw=32,
                      regimes=("storm", "drizzle"), seed=9)
    from extended_gan_tpu.data.io import load_array

    means = []
    for i in range(4):
        v = load_array(f"{out}/train/{i:010d}.pt").astype(np.float32)
        means.append(v.mean())
    # files 0,2 storm (bright), files 1,3 drizzle (faint)
    assert means[0] > 3 * means[1] and means[2] > 3 * means[3]


def test_regime_table_is_closed():
    assert set(REGIMES) == {None, "storm", "drizzle"}
    for spec in REGIMES.values():
        assert set(spec) == {"n_cells", "amp", "vel", "sig"}
