# local_temporal — experiment configuration (tpu-extended-gan).
#
# Mirrors /root/reference/convolutional_gat/experiments/local_temporal/
# config.py:1-20 (temporal GAT, linear mapping, plateau LR schedule).
# Parsed declaratively (ast.literal_eval) by extended_gan_tpu.utils.config —
# never exec'd. Optimizer/criterion are resolved by name in the trainer.
# Outputs (history.json, model.msgpack, pred_*.png, history_*.png,
# checkpoints/) land in this directory.

DATASET = "kmni"
PREPROCESSED_FOLDER = "/mnt2/20_preprocessed"
DOWNSAMPLE_SIZE = (20, 20)

MODEL_TYPE = "temporal"
MAPPING_TYPE = "linear"

EPOCHS = 10
TRAIN_BATCH_SIZE = 32
TEST_BATCH_SIZE = 64
OPTIMIZER = "adam"
CRITERION = "mse"
LEARNING_RATE = 0.001
LR_STEP = 1
GAMMA = 0.95
REDUCE_LR_ON_PLATEAU = True

# --- TPU-native knobs (no reference equivalent) ---
PRECISION = "f32"        # "bf16" for MXU-rate compute
REMAT = False            # jax.checkpoint the forward (saves HBM)
CHECKPOINT_EVERY = 0     # Orbax full-state snapshot cadence (epochs)
RESUME = False           # continue from checkpoints/ if present
SEED = 369
