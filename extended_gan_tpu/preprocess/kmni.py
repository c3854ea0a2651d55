"""KNMI radar archive -> per-city rain-video dataset.

Capability clone of
/root/reference/convolutional_gat/preprocessing/kmni_dataset/__main__.py:
walk year/month/day .h5 files, read ``image1/image_data``, crop the
Netherlands window [243:590, 234:512], cut six fixed 80x80 city patches,
zero the 65535 NaN sentinel, gate on raininess with 1-frame patience, and
save each continuous >=8-frame run as a zero-padded .pt video; then a
random 20% file split to test/, and a z-score metadata pass.
"""

from __future__ import annotations

import json
import os
import shutil
from argparse import ArgumentParser
from pathlib import Path

import numpy as np

from ..data.io import listdir, load_array, mkdir, save_array

# Fixed city-patch coordinates within the cropped radar image
# (reference :49-56).
COORDINATES = (
    (201, 38),
    (201 - 80, 81),
    (201 - 80 + 4, 81 + 92),
    (214, 140),
    (29, 190),
    (29 + 10, 186 - 85),
)
PATCH = 80
CROP = (slice(243, 590), slice(234, 512))
NAN_SENTINEL = 65535


def _read_radar_h5(file_path: str) -> np.ndarray:
    import h5py

    with h5py.File(file_path, "r") as f:
        return f["image1"]["image_data"][...].astype(np.int64)


def get_z_score_normalizing_constants(preprocessed_folder: str):
    acc = np.concatenate(
        [
            load_array(fpath)
            for _fname, fpath in listdir(os.path.join(preprocessed_folder, "train"))
            if not fpath.endswith(".json")
        ]
    ).astype(np.float32)
    result = {"mean": acc.mean(axis=0), "var": acc.var(axis=0, ddof=1)}
    np.savez(os.path.join(preprocessed_folder, "metadata.npz"), **result)
    return result


def preprocess(
    in_dir: str,
    out_dir: str,
    from_year: int = 2016,
    rain_threshold: float = 0.2,
):
    out_train = Path(out_dir) / "train"
    mkdir(str(out_train))

    years = listdir(in_dir)
    if from_year != -1:
        names = [y[0] for y in years]
        if str(from_year) in names:
            years = years[names.index(str(from_year)) :]

    acc: list[np.ndarray] = []
    file_index = 0
    patience = True
    max_val, min_val = 0, 1000

    def flush():
        nonlocal acc, file_index
        video = np.stack(acc)
        save_array(str(out_train / f"{file_index:010d}.pt"), video)
        acc = []
        file_index += 1

    for year, year_path in years:
        print(f"Year: {year}")
        for month, month_path in listdir(year_path):
            print(f"\t{month}")
            days = [fp for fn, fp in listdir(month_path) if fn.endswith(".h5")]
            for file_path in days:
                raw = _read_radar_h5(file_path)
                max_val = max(int(raw.max()), max_val)
                min_val = min(int(raw.min()), min_val)
                raw = raw[CROP]
                content = np.stack(
                    [raw[x : x + PATCH, y : y + PATCH] for x, y in COORDINATES]
                )
                content[content == NAN_SENTINEL] = 0
                raininess = 1 - (content == 0).sum() / content.size
                if raininess >= rain_threshold:
                    acc.append(content)
                    patience = True
                elif patience:
                    # one non-rainy frame is tolerated (reference :97-101)
                    acc.append(content)
                    patience = False
                elif len(acc) >= 8:
                    flush()
                else:
                    acc = []
            if len(acc) > 8:
                flush()
    with open(out_train / "metadata.json", "w") as f:
        json.dump({"max": max_val, "min": min_val}, f)


def test_split(out_dir: str, ratio: float = 0.2, seed: int = 369):
    train_out = os.path.join(out_dir, "train")
    test_out = os.path.join(out_dir, "test")
    mkdir(test_out)
    files = [
        (fn, fp) for fn, fp in listdir(train_out) if not fn.endswith(".json")
    ]
    rng = np.random.default_rng(seed)
    for i in rng.permutation(len(files))[: int(len(files) * ratio)]:
        file_name, file_path = files[i]
        shutil.move(file_path, os.path.join(test_out, file_name))


def main(argv=None):
    parser = ArgumentParser()
    parser.add_argument(
        "action", choices=("preprocess", "test-split", "minimize", "z-score")
    )
    parser.add_argument("-i", "--in-dir", type=str)
    parser.add_argument("-o", "--out-dir", type=str)
    parser.add_argument("-r", "--rain-threshold", type=float, default=0.5)
    parser.add_argument("-y", "--from-year", type=int, default=2016)
    args = parser.parse_args(argv)
    assert args.rain_threshold <= 1, "--rain-threshold must be <= 1"
    print(json.dumps(args.__dict__, indent=4))
    if args.action == "preprocess":
        preprocess(args.in_dir, args.out_dir, args.from_year, args.rain_threshold)
        test_split(args.out_dir)
    elif args.action == "test-split":
        test_split(args.out_dir)
    elif args.action == "z-score":
        get_z_score_normalizing_constants(args.out_dir)
    elif args.action == "minimize":
        # dead choice in the reference CLI too
        # (preprocessing/kmni_dataset/__main__.py:148-156 has no handler);
        # fail loudly instead of silently doing nothing
        raise SystemExit(
            "'minimize' is not implemented (the reference never "
            "implemented it either); use preprocess/test-split/z-score"
        )


if __name__ == "__main__":
    main()
