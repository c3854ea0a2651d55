"""Coastal-sea NetCDF -> normalized .pt preprocessing.

Capability clone of /root/reference/preprocess/coastal_sea_data_preprocess.py:
read the ``thetao`` variable of TEM.nc, slice ``[:, 0, 20:, :65]``, min-max
normalize, save as ``coastal_sea_data_preprocessed.pt``. netCDF4 is gated
(absent in this image) — .npy input is accepted as an alternative.
"""

from __future__ import annotations

import numpy as np

from ..data.io import save_array


def _read_thetao(file_name: str) -> np.ndarray:
    if file_name.endswith(".npy"):
        return np.load(file_name)
    try:
        import netCDF4  # optional dependency
    except ImportError as e:
        raise ImportError(
            "netCDF4 is not installed; provide a .npy dump of the 'thetao' "
            "variable instead"
        ) from e
    return np.asarray(netCDF4.Dataset(file_name)["thetao"][...])


def preprocess(
    file_names=("TEM.nc",), out_path: str = "coastal_sea_data_preprocessed.pt"
):
    acc = []
    for file_name in file_names:
        raw = _read_thetao(file_name)
        sub = raw[:, 0, 20:, :65]
        # threaded in-place native path on multi-GB dumps; numpy fallback
        from ..data.native import minmax_normalize

        acc.append(minmax_normalize(sub))
    result = np.stack(acc, axis=1)  # (T, n_vars, H, W)
    save_array(out_path, result)
    return result


def main():
    preprocess()


if __name__ == "__main__":
    main()
