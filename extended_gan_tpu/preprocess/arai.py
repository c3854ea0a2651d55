"""ARAI/MAI NetCDF archive -> per-region continuous-block dataset.

Capability clone of
/root/reference/convolutional_gat/preprocessing/arai_dataset/preprocessing.py:
15-minute time-grid gap detection per day, day merging into continuous runs,
masked-value fill + valid_range scaling, >=10-frame blocks saved as
``<out>/{training,validation}/<i>.pt`` of shape (T, R, V, H, W), plus a
metadata.json holding per-condition lengths and n_regions.

netCDF4 is an optional dependency (absent in this image); the reader is
pluggable so .npy dumps can stand in.
"""

from __future__ import annotations

import json
import os
import shutil
from argparse import ArgumentParser

import numpy as np

from ..data.io import listdir, mkdir, save_array


# ------------------------------------------------------------ time grid
def get_time_range() -> tuple[int, ...]:
    """All 96 HHMM stamps of a day on the 15-minute grid."""
    acc = [(0, 0)]
    for _ in range(1, 96):
        h, m = acc[-1]
        m += 15
        if m == 60:
            acc.append((h + 1, 0))
        else:
            acc.append((h, m))
    return tuple(int(f"{h}{m if m != 0 else '00'}") for h, m in acc)


def get_time_from_file_name(file_name: str) -> int:
    return int(file_name.split("_")[-1].split("T")[-1].strip("Z.nc")[:-2])


def get_continuous_splits(directory: str) -> list[list[str]]:
    """Split a day's files into runs with no missing 15-min slot."""
    if not os.path.isdir(directory):
        return [[]]
    files = [fp for _fn, fp in listdir(directory)]
    files = sorted(files, key=get_time_from_file_name)
    stamps = tuple(get_time_from_file_name(f) for f in files)
    acc: list[list[str]] = [[]]
    i = 0
    for slot in get_time_range():
        if i < len(stamps) and slot == stamps[i]:
            acc[-1].append(files[i])
            i += 1
        else:
            acc.append([])
    return acc


def merge(files: list, new_files: list):
    if len(files) > 0 and len(new_files) > 0:
        files[-1] += new_files[0]
        files += new_files[1:]
    else:
        files += new_files


def merge_days(accumulator: dict) -> dict:
    """Join runs across midnight for consecutive days (reference :99-114)."""
    fixed = {}
    for region, var_acc in accumulator.items():
        fixed[region] = {}
        for var, days_acc in var_acc.items():
            days = tuple(sorted(days_acc.keys(), key=int))
            merged: list[list[str]] = []
            merge(merged, days_acc[days[0]])
            for i, day in enumerate(days[1:]):
                if int(day) != int(days[i]) + 1:
                    merged.append([])
                merge(merged, days_acc[day])
            fixed[region][var] = [m for m in merged if len(m) > 0]
    return fixed


def split_continuous_blocks_at_root(accumulator: dict) -> list[dict]:
    out = []
    a_region = next(iter(accumulator))
    a_var = next(iter(accumulator[a_region]))
    # every region/var must have the same number of continuous runs —
    # a region with missing files would otherwise mispair blocks from
    # different time ranges (then crash deep inside np.stack)
    counts = {
        f"{region}/{var}": len(blocks)
        for region, vars_acc in accumulator.items()
        for var, blocks in vars_acc.items()
    }
    if len(set(counts.values())) > 1:
        raise ValueError(
            f"regions/vars disagree on continuous-run counts (a region is "
            f"missing files for some time range): {counts}"
        )
    for i in range(len(accumulator[a_region][a_var])):
        root = {}
        out.append(root)
        for region, vars_acc in accumulator.items():
            root[region] = {var: blocks[i] for var, blocks in vars_acc.items()}
    return out


# ------------------------------------------------------------ readers
def read_nc_normalized(file_path: str, var_name: str) -> np.ndarray:
    """Read one variable, fill masked values with mid-range, scale by
    valid_range*scale_factor minus add_offset (reference :140-156)."""
    import netCDF4  # optional dependency

    fc = netCDF4.Dataset(file_path)[var_name]
    masked = fc[...]
    valid_range = fc.valid_range
    array = masked.filled((np.max(valid_range) - np.min(valid_range)) / 2)
    scale = fc.scale_factor if "scale_factor" in fc.__dict__ else 1
    offset = fc.add_offset if "add_offset" in fc.__dict__ else 0
    return ((array / (np.max(valid_range) * scale)) - offset).astype(np.float32)


def block_to_array(block: dict, reader=read_nc_normalized) -> np.ndarray:
    """(T, R, V, H, W) array for one continuous block."""
    regions = []
    for _region, var_acc in block.items():
        per_var = []
        for (_folder, var_name), files in var_acc.items():
            frames = [np.squeeze(reader(f, var_name)) for f in files]
            per_var.append(np.stack(frames))
        regions.append(np.stack(per_var))
    arr = np.stack(regions)  # (R, V, T, H, W)
    return arr.transpose(2, 0, 1, 3, 4)


def preprocess(
    verbose: bool = True,
    in_path: str = "~/downloads/mai_dataset",
    out_path: str = "./preprocessed",
    select_variables: tuple[tuple[str, str], ...] = (("CRR", "crr"),),
    reader=read_nc_normalized,
    min_block: int = 10,
):
    if os.path.exists(out_path):
        shutil.rmtree(out_path)
    mkdir(out_path)
    n_regions = len(os.listdir(in_path))
    metadata: dict = {"n_regions": n_regions}
    for condition in ("training", "validation"):
        metadata[condition] = {"length": 0}
        out_condition = os.path.join(out_path, condition)
        mkdir(out_condition)
        days = sorted(
            (d[0] for d in listdir(os.path.join(in_path, "R1", condition))),
            key=int,
        )
        accumulator: dict = {}
        for day in days:
            for rel_region, region_path in listdir(in_path):
                region_acc = accumulator.setdefault(
                    rel_region, {var: {} for var in select_variables}
                )
                for folder, var_name in select_variables:
                    var_dir = os.path.join(region_path, condition, day, folder)
                    region_acc[(folder, var_name)][day] = get_continuous_splits(
                        var_dir
                    )
        blocks = split_continuous_blocks_at_root(merge_days(accumulator))
        for i, block in enumerate(blocks):
            arr = block_to_array(block, reader=reader)
            if len(arr) >= min_block:
                save_array(os.path.join(out_condition, f"{i}.pt"), arr)
                metadata[condition]["length"] += len(arr)
            elif verbose:
                print(f"Skipped block of length {len(arr)}")
    with open(os.path.join(out_path, "metadata.json"), "w") as f:
        json.dump(metadata, f)
    return metadata


def main(argv=None):
    parser = ArgumentParser()
    parser.add_argument("--in-path", type=str, default="./data")
    parser.add_argument("--out-path", type=str, default="./preprocessed")
    parser.add_argument(
        "--select-variables", type=str, default='[["ASII", "asii_turb_trop_prob"]]'
    )
    args = parser.parse_args(argv)
    select_variables = tuple(
        (str(x[0]), str(x[1])) for x in json.loads(args.select_variables)
    )
    preprocess(
        in_path=args.in_path,
        out_path=args.out_path,
        select_variables=select_variables,
    )


if __name__ == "__main__":
    main()
