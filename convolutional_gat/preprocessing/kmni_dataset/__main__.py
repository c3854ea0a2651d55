"""CLI parity: python -m convolutional_gat.preprocessing.kmni_dataset
{preprocess,test-split,z-score} -i ... -o ..."""

from extended_gan_tpu.preprocess.kmni import main

if __name__ == "__main__":
    main()
