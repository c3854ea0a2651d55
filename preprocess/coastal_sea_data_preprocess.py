"""Parity shim for /root/reference/preprocess/coastal_sea_data_preprocess.py."""

from extended_gan_tpu.preprocess.coastal_sea import main, preprocess  # noqa: F401

if __name__ == "__main__":
    main()
