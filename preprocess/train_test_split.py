"""Parity shim for /root/reference/preprocess/train_test_split.py."""

from extended_gan_tpu.preprocess.train_test_split import main  # noqa: F401

if __name__ == "__main__":
    main()
