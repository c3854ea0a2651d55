import json
import os

import numpy as np

from extended_gan_tpu.data.io import load_array, save_array
from extended_gan_tpu.preprocess import kmni as kmni_pp
from extended_gan_tpu.preprocess import train_test_split as tts


def test_train_test_split_roundtrip(tmp_path):
    data = np.random.RandomState(0).rand(50, 1, 8, 8).astype(np.float32)
    in_file = str(tmp_path / "data.hdf5")
    save_array(in_file, data)
    out = str(tmp_path / "out")
    tts.main(in_file, out)
    test1 = load_array(os.path.join(out, "test", "test_1.h5"))
    test2 = load_array(os.path.join(out, "test", "test_2.h5"))
    train = load_array(os.path.join(out, "train", "train.h5"))
    assert len(test1) + len(test2) + len(train) == 50
    # head/tail split: test_1 is the head, test_2 the tail
    np.testing.assert_array_equal(test1, data[: len(test1)])
    np.testing.assert_array_equal(test2, data[-len(test2) :])


def _write_radar_h5(path, img):
    import h5py

    with h5py.File(path, "w") as f:
        f.create_group("image1")
        f["image1"]["image_data"] = img


def test_kmni_preprocess_pipeline(tmp_path):
    # Build a fake radar archive: year/month/day .h5 files, 700x600 images.
    rng = np.random.RandomState(0)
    in_dir = tmp_path / "radar"
    month_dir = in_dir / "2016" / "01"
    os.makedirs(month_dir)
    for i in range(12):
        img = rng.randint(1, 200, size=(700, 600)).astype(np.uint16)
        img[0, 0] = 65535  # NaN sentinel
        _write_radar_h5(str(month_dir / f"frame_{i:03d}.h5"), img)
    out_dir = str(tmp_path / "out")
    kmni_pp.preprocess(str(in_dir), out_dir, from_year=2016,
                       rain_threshold=0.2)
    train_dir = os.path.join(out_dir, "train")
    files = [f for f in os.listdir(train_dir) if f.endswith(".pt")]
    assert files, "no videos written"
    video = load_array(os.path.join(train_dir, files[0]))
    # (T, 6 cities, 80, 80)
    assert video.shape[1:] == (6, 80, 80)
    assert video.shape[0] >= 8
    assert (video != 65535).all()
    meta = json.load(open(os.path.join(train_dir, "metadata.json")))
    assert "max" in meta and "min" in meta


def test_kmni_test_split(tmp_path):
    train_dir = tmp_path / "out" / "train"
    os.makedirs(train_dir)
    for i in range(10):
        save_array(str(train_dir / f"{i:010d}.pt"), np.zeros((8, 6, 4, 4)))
    kmni_pp.test_split(str(tmp_path / "out"), ratio=0.2)
    test_files = os.listdir(tmp_path / "out" / "test")
    train_files = [f for f in os.listdir(train_dir)]
    assert len(test_files) == 2
    assert len(train_files) == 8


def test_arai_continuous_splits_gap_detection(tmp_path):
    from extended_gan_tpu.preprocess.arai import get_continuous_splits

    d = tmp_path / "day"
    os.makedirs(d)
    # files at 0000, 0015, 0030 then a gap, then 0100
    for stamp in ("0000", "0015", "0030", "0100"):
        (d / f"S_NWC_CRR_x_y_20200101T{stamp}00Z.nc").touch()
    splits = [s for s in get_continuous_splits(str(d)) if s]
    assert len(splits) == 2
    assert len(splits[0]) == 3 and len(splits[1]) == 1


def test_coastal_preprocess_from_npy(tmp_path):
    from extended_gan_tpu.preprocess.coastal_sea import preprocess

    raw = np.random.RandomState(1).rand(10, 3, 40, 80).astype(np.float32)
    np.save(tmp_path / "tem.npy", raw)
    out = preprocess((str(tmp_path / "tem.npy"),),
                     str(tmp_path / "coastal.pt"))
    assert out.shape == (10, 1, 20, 65)
    assert out.min() >= 0 and out.max() <= 1
