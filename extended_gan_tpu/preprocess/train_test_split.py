"""hdf5 head/tail train-test split.

Clone of /root/reference/preprocess/train_test_split.py:7-46: take ~10% of
frames from each end of the sequence as two test files, the middle as train,
written as .h5 files with key "default".
"""

from __future__ import annotations

import os

import numpy as np

from ..data.io import load_array, save_array, mkdir


def main(
    in_file_name: str = "/mnt/tmp/data.hdf5",
    out_dir: str = "/mnt/tmp/multi_channel_train_test",
):
    mkdir(out_dir)
    mkdir(os.path.join(out_dir, "test"))
    mkdir(os.path.join(out_dir, "train"))

    data = np.asarray(load_array(in_file_name))
    test_size = int(0.2 * len(data))
    to_cut = (test_size + 16) // 2
    test_1 = data[:to_cut]
    test_2 = data[-to_cut:]
    train = data[to_cut:-to_cut]
    assert len(train) + len(test_1) + len(test_2) == len(data), "whoops"

    save_array(os.path.join(out_dir, "test", "test_1.h5"), test_1)
    save_array(os.path.join(out_dir, "test", "test_2.h5"), test_2)
    save_array(os.path.join(out_dir, "train", "train.h5"), train)


if __name__ == "__main__":
    main()
