"""CLI parity: python -m convolutional_gat.preprocessing.arai_dataset
--in-path ... --out-path ... --select-variables '[["CRR","crr"]]'"""

from extended_gan_tpu.preprocess.arai import main

if __name__ == "__main__":
    main()
