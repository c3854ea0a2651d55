# synthetic_smoke — experiment configuration (tpu-extended-gan).
#
# Parsed declaratively (ast.literal_eval) by extended_gan_tpu.utils.config —
# never exec'd. Optimizer/criterion are resolved by name in the trainer.
# Outputs (history.json, model.msgpack, pred_*.png, history_*.png,
# checkpoints/) land in this directory.

DATASET = "synthetic"
PREPROCESSED_FOLDER = ""
DOWNSAMPLE_SIZE = (16, 16)

MODEL_TYPE = "temporal"
MAPPING_TYPE = "conv"

EPOCHS = 2
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
# DATA_AXIS / MODEL_AXIS shape the device mesh (DP x TP);
# SPATIAL = True stripes the frame axis over MODEL_AXIS instead (SP);
# USE_PALLAS selects the fused Pallas kernels (GAT attention, SmaAt-UNet
# DSC); unset = auto (ON on TPU, OFF elsewhere). CRITERION accepts
# "mse" (reference) or "l1"
