# experiment_local_temporal_conv — experiment configuration (tpu-extended-gan).
#
# Mirrors /root/reference/convolutional_gat/experiments/experiment_local_temporal_conv/config.py
# (a legacy-era config: class-valued ``MODEL = TemporalModel``, live torch
# optimizer/criterion objects — the declarative keys below are the same
# settings; the verbatim legacy form itself is parse-tested in
# tests/test_experiments.py).
# Parsed declaratively (ast.literal_eval) by extended_gan_tpu.utils.config —
# never exec'd. Outputs land in this directory.

DATASET = "kmni"
PREPROCESSED_FOLDER = "/mnt/kmni_dataset/20_preprocessed"
DOWNSAMPLE_SIZE = (20, 20)

MODEL_TYPE = "temporal_1block"      # legacy: MODEL = TemporalModel
MAPPING_TYPE = "conv"

EPOCHS = 10
TRAIN_BATCH_SIZE = 32
TEST_BATCH_SIZE = 64
OPTIMIZER = "adam"
CRITERION = "mse"
LEARNING_RATE = 0.001
LR_STEP = 1
GAMMA = 0.95
REDUCE_LR_ON_PLATEAU = False

# --- TPU-native knobs (no reference equivalent) ---
PRECISION = "f32"        # "bf16" for MXU-rate compute
REMAT = False            # jax.checkpoint the forward (saves HBM)
CHECKPOINT_EVERY = 0     # Orbax full-state snapshot cadence (epochs)
RESUME = False           # continue from checkpoints/ if present
SEED = 369
