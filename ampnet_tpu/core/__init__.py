from ampnet_tpu.core.config import (
    AMPNetConfig,
    DataConfig,
    ModelConfig,
    TrainConfig,
)
