"""Top-level data loader — parity shim for /root/reference/data_loader.py.

The reference exposes a root-level ``DataLoader``/``get_loaders`` over
coastal-sea ``.pt`` frame files; here they alias the framework's
CoastalSeaLoader (same windowing/crop/shuffle semantics, numpy batches).
"""

from extended_gan_tpu.data.streaming import (  # noqa: F401
    CoastalSeaLoader as DataLoader,
    get_coastal_loaders as get_loaders,
)


def test():
    """Smoke entry mirroring the reference's inline test (data_loader.py:101),
    pointed at the synthetic dataset."""
    from extended_gan_tpu.data.synthetic import ensure_synthetic_coastal

    folder = ensure_synthetic_coastal()
    train_dl, test_dl = get_loaders(folder, 32, 64)
    for x, y in test_dl:
        print(x.shape)
        return


if __name__ == "__main__":
    test()
