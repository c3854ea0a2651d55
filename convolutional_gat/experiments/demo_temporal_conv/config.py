# Demo experiment on synthetic KNMI-format data (committed artifacts).
MODEL_TYPE = "temporal"
MAPPING_TYPE = "conv"
DATASET = "kmni"
PREPROCESSED_FOLDER = "/tmp/egt_demo_kmni"
EPOCHS = 8
TRAIN_BATCH_SIZE = 32
TEST_BATCH_SIZE = 64
LEARNING_RATE = 0.001
LR_STEP = 1
GAMMA = 0.95
PLOT = False
CRITERION = "mse"
OPTIMIZER = "adam"
DOWNSAMPLE_SIZE = (20, 20)
REDUCE_LR_ON_PLATEAU = True
