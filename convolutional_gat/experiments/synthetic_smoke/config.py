# Experiment config (literal values only — parsed, never exec'd).
MODEL_TYPE = "temporal"
MAPPING_TYPE = "conv"
DATASET = "synthetic"
PREPROCESSED_FOLDER = ""
EPOCHS = 2
TRAIN_BATCH_SIZE = 32
TEST_BATCH_SIZE = 64
LEARNING_RATE = 0.001
LR_STEP = 1
GAMMA = 0.95
PLOT = False
CRITERION = "mse"
OPTIMIZER = "adam"
DOWNSAMPLE_SIZE = (16, 16)
REDUCE_LR_ON_PLATEAU = False
