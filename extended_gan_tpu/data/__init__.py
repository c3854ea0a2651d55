from .io import load_array, save_array, listdir, mkdir
from .streaming import (
    CoastalSeaLoader,
    H5SequenceLoader,
    KmniLoader,
    AraiLoader,
    Prefetcher,
    get_loaders,
    get_coastal_loaders,
    get_h5_loaders,
    get_kmni_loaders,
    get_arai_loaders,
)

__all__ = [
    "load_array",
    "save_array",
    "listdir",
    "mkdir",
    "CoastalSeaLoader",
    "H5SequenceLoader",
    "KmniLoader",
    "AraiLoader",
    "Prefetcher",
    "get_loaders",
    "get_coastal_loaders",
    "get_h5_loaders",
    "get_kmni_loaders",
    "get_arai_loaders",
]
