"""Default hyperparameters, mirroring the reference's defaults module
(/root/reference/graph_hscn/config/defaults.py:1-39) plus TPU-specific knobs.
"""

# Data
BATCH_SIZE = 32
NUM_WORKERS = 0

# Model
DROPOUT = 0.2
NUM_LAYERS = 3
HIDDEN_CHANNELS = 16
USE_BATCH_NORM = False
USE_LAYER_NORM = False
NUM_HEADS = 4           # GPS transformer-hybrid attention heads

# Optimizer
BATCH_ACCUMULATION = 1
CLIP_GRAD_NORM = False
LR = 0.01
WEIGHT_DECAY = 5e-4

# Positional encoding (SignNet)
PE_MODEL = "DeepSet"
PE_LAYERS = 1
POST_LAYERS = 1
EIG_MAX_FREQS = 10
EIGVEC_NORM = "L2"
EIG_LAP_NORM = "sym"
PHI_HIDDEN_DIM = 32
PHI_OUT_DIM = 4
PASS_AS_VAR = False
PE_USE_BN = False

# Training
EPOCHS = 500
EVAL_PERIOD = 10
MIN_DELTA = 0.01
PATIENCE = 2
USE_WANDB = False  # reference forces True (config.py:146-152, quirk #3);
                   # here wandb is genuinely optional.

# HSCN
NUM_CLUSTERS = 4
CLUSTER_EPOCHS = 10
MP_UNITS = [16, 16]  # SCN message-passing widths; the reference reads
                     # model_cfg.mp_units (main.py:102) but never declares it
                     # in HSCNConfig (schema gap, SURVEY quirk in §2.1 C2).

# TPU execution
PAD_SAFETY = 1.15
NODE_MULTIPLE = 8
EDGE_MULTIPLE = 128
MATMUL_PRECISION = "highest"   # f32 for parity; "default" for bf16 speed
COMPUTE_DTYPE = "float32"      # "bfloat16" = bf16 activations/compute,
                               # params + logits + losses stay float32
DENSE_PATH_MAX_NODES = 512     # use dense MXU path when graphs fit

# Mesh / parallelism
MESH_AXES = ("data",)
MESH_SHAPE = (1,)              # single device; set [N] or [-1] (= all
                               # devices) in the config to turn on DP
