# experiment3 — experiment configuration (tpu-extended-gan).
#
# Mirrors /root/reference/convolutional_gat/experiments/experiment3/config.py
# (a legacy-era config: class-valued ``MODEL = TemporalModel(time_steps=4, conv=True)``, live torch
# optimizer/criterion objects — the declarative keys below are the same
# settings; the verbatim legacy form itself is parse-tested in
# tests/test_experiments.py).
# Parsed declaratively (ast.literal_eval) by extended_gan_tpu.utils.config —
# never exec'd. Outputs land in this directory.

DATASET = "kmni"
PREPROCESSED_FOLDER = "convolutional_gat/preprocessed"
DOWNSAMPLE_SIZE = (80, 80)

MODEL_TYPE = "temporal_1block"      # legacy: MODEL = TemporalModel(time_steps=4, conv=True)
MAPPING_TYPE = "conv"

EPOCHS = 15
TRAIN_BATCH_SIZE = 32
TEST_BATCH_SIZE = 64
OPTIMIZER = "adam"
CRITERION = "mse"
LEARNING_RATE = 0.001
LR_STEP = 1
GAMMA = 1.0
REDUCE_LR_ON_PLATEAU = False

# --- TPU-native knobs (no reference equivalent) ---
PRECISION = "f32"        # "bf16" for MXU-rate compute
REMAT = False            # jax.checkpoint the forward (saves HBM)
CHECKPOINT_EVERY = 0     # Orbax full-state snapshot cadence (epochs)
RESUME = False           # continue from checkpoints/ if present
SEED = 369
