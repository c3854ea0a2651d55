# final_2d_baseline — experiment configuration (tpu-extended-gan).
#
# Mirrors /root/reference/convolutional_gat/experiments/final_2d_baseline/
# config.py:1-17, a legacy-style config (``MODEL = BaselineModel2D``); its
# BASELINE.md row is best val_loss 0.0066927 at epoch 14. The legacy
# MODEL-class key itself is exercised by tests/test_experiments.py's
# verbatim-config test; this committed dir uses the declarative schema.
# Parsed (ast.literal_eval) by extended_gan_tpu.utils.config — never
# exec'd. Outputs land in this directory.

DATASET = "kmni"
PREPROCESSED_FOLDER = "convolutional_gat/preprocessed"
DOWNSAMPLE_SIZE = (20, 20)

MODEL_TYPE = "baseline2d"    # legacy: MODEL = BaselineModel2D
MAPPING_TYPE = "linear"

EPOCHS = 13
TRAIN_BATCH_SIZE = 8
TEST_BATCH_SIZE = 8
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
