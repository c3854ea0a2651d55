# Experiment config (literal values only — parsed, never exec'd).
MODEL_TYPE = "temporal"
MAPPING_TYPE = "conv"
DATASET = "kmni"
PREPROCESSED_FOLDER = "/mnt/kmni_dataset/20_plus_preprocessed"
EPOCHS = 21
TRAIN_BATCH_SIZE = 32
TEST_BATCH_SIZE = 64
LEARNING_RATE = 0.001
LR_STEP = 1
GAMMA = 0.95
PLOT = False
CRITERION = "mse"
OPTIMIZER = "adam"
DOWNSAMPLE_SIZE = (80, 80)
REDUCE_LR_ON_PLATEAU = False
